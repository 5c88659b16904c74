"""Benchmark the STAGE-2 (diffusion) train step on TPU (VERDICT r3 #2).

Round-2 measurement: 40.3 ms bf16 / 67.2 fp32 at batch 256 (~39% MXU,
~72% HBM). This script re-measures variants and prints XLA cost-analysis
bytes/flops. Timing: async loop with ONE final scalar sync (CLAUDE.md:
block_until_ready is broken on axon; per-call syncs add ~28 ms RTT).

Usage: python scripts/bench_stage2_step.py [--batch 256] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import SpikingDenoiser
from spiking_diffusion_tpu.train import create_train_state
from spiking_diffusion_tpu.train.stage2 import make_train_step_diffusion


def bench(backend: str, dtype, batch: int, iters: int) -> dict:
    cfg = DiffusionConfig()
    denoiser = SpikingDenoiser(cfg, backend=backend, dtype=dtype)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.randint(key, (batch, 7, 7), 0, cfg.num_embeddings,
                            jnp.int32)
    t0 = jnp.ones((batch,), jnp.int32)
    variables = jax.jit(
        lambda k, x, t: denoiser.init(k, x, t, train=True)
    )(key, x0[:2], t0[:2])
    state = create_train_state(denoiser, variables)

    # non-donating step (donation breaks re-lowering; inside the scan the
    # carry threading gives XLA the same in-place opportunity anyway)
    nd = make_train_step_diffusion(cfg, donate=False)
    try:
        ca = jax.jit(nd.__wrapped__).lower(
            state, x0, key
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops, bts = float(ca["flops"]), float(ca.get("bytes accessed", 0))
    except Exception:
        flops = bts = float("nan")

    # Device-side timed loop: iters steps inside ONE jitted lax.scan, so
    # the axon tunnel (dispatch jitter made the old host-side async loop
    # read the same bf16 step anywhere from 40 to 69 ms across runs while
    # fp32 stayed at ~49) is crossed exactly twice — one dispatch, one
    # scalar sync. lax.scan re-lowers the step body without donation
    # buffer aliasing issues because the carry is threaded functionally.
    nd_step = nd.__wrapped__ if hasattr(nd, "__wrapped__") else nd

    @jax.jit
    def run(state, x0, keys):
        def body(st, k):
            st, m = nd_step(st, x0, k)
            return st, m["loss"]
        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    _st, losses = run(state, x0, keys)  # compile + warm
    _ = float(losses[-1])
    t_start = time.perf_counter()
    _st, losses = run(state, x0, keys)
    loss = float(losses[-1])  # single end-of-loop sync
    dt = (time.perf_counter() - t_start) / iters
    assert np.isfinite(loss)
    return {
        "backend": backend,
        "dtype": "bf16" if dtype == jnp.bfloat16 else "fp32",
        "ms": round(dt * 1e3, 2),
        "loss": round(loss, 4),
        "GFLOP": round(flops / 1e9, 1),
        "GB": round(bts / 1e9, 2),
        "mxu": round(flops / dt / 197e12, 3),
        "hbm": round(bts / dt / 819e9, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="auto:bf16,auto:fp32")
    args = ap.parse_args()
    for v in args.variants.split(","):
        backend, dt = v.split(":")
        dtype = jnp.bfloat16 if dt == "bf16" else None
        print(bench(backend, dtype, args.batch, args.iters), flush=True)


if __name__ == "__main__":
    main()
