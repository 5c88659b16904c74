"""Timing harness for jitted functions.

Replaces the reference's CUDA-event benchmark utilities
(``spikingjelly/activation_based/cuda_utils.py:13-137``:
``cpu_timer``/``cuda_timer``/``cal_fun_t``) with the JAX idiom:
compile+warm up, then wall-time N calls bounded by
``jax.block_until_ready``. ``trace`` wraps ``jax.profiler`` for
perfetto-compatible device traces (the ``GPUMonitor`` analogue).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax


def _sync(out: Any) -> None:
    """Synchronize on a computation's completion.

    ``jax.block_until_ready`` is unreliable on some experimental platforms
    (the axon TPU tunnel returns early); materializing one leaf to host is
    a sound sync point everywhere.
    """
    import numpy as np

    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[0])


def benchmark(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 50,
    warmup: int = 2,
    **kwargs: Any,
) -> Dict[str, float]:
    """Time ``fn(*args)``: returns mean/min ms per call and calls/sec."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    _sync(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        times.append(time.perf_counter() - t0)
    mean_s = sum(times) / len(times)
    return {
        "mean_ms": mean_s * 1e3,
        "min_ms": min(times) * 1e3,
        "calls_per_sec": 1.0 / mean_s,
        "iters": float(iters),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device profile viewable in perfetto/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
