"""Activation/gradient monitors — spikingjelly ``monitor.py`` rebuilt.

The reference's ``OutputMonitor``/``InputMonitor``/``AttributeMonitor``/
``Grad*Monitor`` are torch forward/backward hooks on stateful modules
(``spikingjelly/activation_based/monitor.py:20-917``). JAX has no hooks;
the functional equivalents are:

  * :func:`capture_outputs` — flax ``capture_intermediates`` with a module
    filter; returns {layer_path: output} (OutputMonitor).
  * :func:`spike_rates` — OutputMonitor with the canonical spike-count
    transform: firing rate per spiking layer.
  * :func:`membrane_traces` — AttributeMonitor('v'): per-step membrane
    sequences, recomputed via ``lif_scan(return_v_seq=True)`` on captured
    LIF *inputs* (state is never stored, so it is reconstructed — exact,
    since the dynamics are deterministic given the input).
  * :func:`grad_norms` — GradOutputMonitor: per-layer parameter-gradient
    norms from the grad pytree.

(The reference's ``GPUMonitor`` nvidia-smi poller has no TPU analogue here;
device profiles come from :func:`spiking_diffusion_tpu.profiling.trace`.)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_scan


def _flatten_intermediates(tree: Any) -> Dict[str, Any]:
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (str(k),))
        elif isinstance(node, tuple) and len(node) == 1:
            flat["/".join(path[:-1] if path[-1] == "__call__" else path)] = node[0]
        else:
            flat["/".join(path)] = node

    walk(tree, ())
    return flat


def capture_outputs(
    model,
    variables,
    *args,
    filter_fn: Optional[Callable[[str], bool]] = None,
    **kwargs,
) -> Dict[str, jax.Array]:
    """Run ``model.apply`` capturing every submodule output.

    ``filter_fn`` takes the flattened layer path (e.g.
    'intermediates/encoder/LIF_0') and selects which to keep.
    """
    mutable = kwargs.pop("mutable", [])
    if isinstance(mutable, (list, tuple)):
        mutable = list(mutable)
    else:
        mutable = [mutable]
    _, mut = model.apply(
        variables, *args,
        capture_intermediates=True,
        mutable=mutable + ["intermediates"],
        **kwargs,
    )
    flat = _flatten_intermediates(mut.get("intermediates", {}))
    if filter_fn is not None:
        flat = {k: v for k, v in flat.items() if filter_fn(k)}
    return flat


def spike_rates(model, variables, *args, **kwargs) -> Dict[str, float]:
    """Firing rate of every LIF layer's output spike train.

    The OutputMonitor + spike-count transform combo the reference
    demonstrates (``monitor.py`` docstrings).
    """
    outs = capture_outputs(
        model, variables, *args,
        filter_fn=lambda k: "/LIF" in k or k.endswith("LIF_0") or "lif" in k.lower(),
        **kwargs,
    )
    rates = {}
    for k, v in outs.items():
        if isinstance(v, jax.Array) or isinstance(v, np.ndarray):
            arr = np.asarray(v)
            vals = np.unique(arr)
            if len(vals) <= 2 and arr.min() >= 0 and arr.max() <= 1:
                rates[k] = float(arr.mean())
    return rates


def membrane_traces(
    x_seq: jax.Array, params: NeuronParams = NeuronParams()
) -> Dict[str, jax.Array]:
    """AttributeMonitor('v') equivalent for a single LIF layer: given the
    layer's input sequence, return spikes, the full membrane trace v_seq,
    and pre-reset potentials are recoverable from the dynamics."""
    s_seq, v_seq, v_last = lif_scan(x_seq, params=params, return_v_seq=True)
    return {"spikes": s_seq, "v_seq": v_seq, "v_last": v_last}


def grad_norms(grads: Any) -> Dict[str, float]:
    """Per-parameter-tensor gradient L2 norms from a grad pytree."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "idx", str(p))) if not isinstance(p, str) else p
            for p in (getattr(k, "key", k) for k in path)
        )
        out[str(name)] = float(jnp.linalg.norm(leaf))
    return out


class DeviceMonitor:
    """TPU-side ``GPUMonitor`` equivalent
    (``spikingjelly.zip!activation_based/monitor.py:795-900``): a daemon
    thread samples per-device memory stats every ``interval`` seconds via
    ``Device.memory_stats()`` (bytes_in_use / peak_bytes_in_use — the
    TPU runtime's own counters; there is no nvidia-smi analogue to shell
    out to). Records a time series; ``stop()`` returns it and
    ``summary()`` reduces it. Prints each sample when ``verbose``.

    Platforms whose runtime exposes no memory stats (e.g. some remote
    tunnels) yield empty samples rather than failing — the monitor is an
    observability aid, never a crash source.

        dm = DeviceMonitor(interval=1.0)
        ... work ...
        print(dm.stop_and_summary())
    """

    def __init__(self, interval: float = 10.0, devices=None,
                 start_now: bool = True, verbose: bool = False):
        import threading
        import time as _time

        self.interval = interval
        self.verbose = verbose
        self._devices = devices
        self._stop = threading.Event()
        self.records: list = []

        def loop():
            devs = self._devices
            if devs is None:
                try:
                    devs = jax.devices()
                except Exception:
                    devs = []
            while not self._stop.is_set():
                stamp = _time.time()
                sample = {"t": stamp}
                for d in devs:
                    try:
                        ms = d.memory_stats() or {}
                    except Exception:
                        ms = {}
                    sample[str(d.id)] = {
                        "bytes_in_use": ms.get("bytes_in_use"),
                        "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                    }
                self.records.append(sample)
                if self.verbose:
                    print(f"[device-monitor] {sample}")
                self._stop.wait(self.interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        if start_now:
            self.start()

    def start(self) -> None:
        if not self._thread.is_alive():
            self._thread.start()

    def stop(self) -> list:
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=self.interval + 1.0)
        return self.records

    def summary(self) -> Dict[str, Any]:
        per_dev: Dict[str, list] = {}
        for rec in self.records:
            for dev_id, stats in rec.items():
                if dev_id == "t":
                    continue
                b = stats.get("bytes_in_use")
                if b is not None:
                    per_dev.setdefault(dev_id, []).append(b)
        return {
            dev_id: {
                "samples": len(vals),
                "mean_bytes_in_use": int(np.mean(vals)),
                "max_bytes_in_use": int(np.max(vals)),
            }
            for dev_id, vals in per_dev.items()
        }

    def stop_and_summary(self) -> Dict[str, Any]:
        self.stop()
        return self.summary()
