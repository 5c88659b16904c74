"""ANN -> SNN conversion — spikingjelly ``ann2snn/`` parity.

The reference converter (``spikingjelly/activation_based/ann2snn/``) hooks
a ``VoltageHook`` after every ReLU to record the max (or p-th percentile)
activation on calibration data, then swaps each ReLU for
``VoltageScaler(1/s) -> IFNode -> VoltageScaler(s)``: with rate coding over
T steps, an IF neuron driven by x/s fires at rate ~= clamp(x/s, 0, 1), so
s * rate ~= ReLU(x) for x in [0, s].

JAX rebuild: networks are described as a sequential spec (the reference's
converter equally only handles fx-traceable feedforward graphs); scale
collection uses a forward pass per layer instead of hooks.

  specs = [("conv", {...}), ("relu",), ("pool", 2), ("flatten",),
           ("dense", {...}), ("relu",)]
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn.neuron import NeuronParams, if_scan


def _apply_layer(spec, params, x):
    kind = spec[0]
    if kind == "conv":
        cfg = spec[1]
        return jax.lax.conv_general_dilated(
            x, params["kernel"],
            (cfg.get("stride", 1),) * 2,
            [(cfg.get("padding", 0),) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params.get("bias", 0.0)
    if kind == "dense":
        return x @ params["kernel"] + params.get("bias", 0.0)
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "pool":
        k = spec[1]
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
        ) / (k * k)
    if kind == "flatten":
        return x.reshape(x.shape[0], -1)
    raise ValueError(f"unknown spec {kind!r}")


def ann_forward(
    specs: Sequence[Tuple], params: List[Optional[Dict]], x: jax.Array
) -> jax.Array:
    """Run the ANN described by ``specs`` with per-layer ``params``."""
    for spec, p in zip(specs, params):
        x = _apply_layer(spec, p, x)
    return x


def collect_scales(
    specs: Sequence[Tuple],
    params: List[Optional[Dict]],
    calibration: jax.Array,
    mode: str = "max",
    percentile: float = 99.9,
) -> List[Optional[float]]:
    """Per-ReLU voltage scales from calibration data.

    Parity: ``VoltageHook`` modes 'max' and percentile (``ann2snn``
    Converter(mode='max' | float)).
    """
    scales: List[Optional[float]] = []
    x = calibration
    for spec, p in zip(specs, params):
        x = _apply_layer(spec, p, x)
        if spec[0] == "relu":
            arr = np.asarray(x)
            if mode == "max":
                s = float(arr.max())
            else:
                s = float(np.percentile(arr, percentile))
            scales.append(max(s, 1e-6))
        else:
            scales.append(None)
    return scales


def snn_forward(
    specs: Sequence[Tuple],
    params: List[Optional[Dict]],
    scales: List[Optional[float]],
    x: jax.Array,
    num_steps: int = 32,
) -> jax.Array:
    """Run the converted SNN: analog input repeated T steps; every ReLU is
    scale -> IF -> scale; output is the rate-decoded final layer.

    IF neurons carry membrane across the T steps (one scan per activation
    layer over the whole sequence — the layers in between are linear, so
    time-flattening is exact).
    """
    t = num_steps
    x_seq = jnp.broadcast_to(x[None], (t,) + x.shape)
    p_if = NeuronParams(v_threshold=1.0, v_reset=0.0, hard_reset=False)

    def flat_apply(spec, p, h_seq):
        shape = h_seq.shape
        flat = h_seq.reshape((shape[0] * shape[1],) + shape[2:])
        out = _apply_layer(spec, p, flat)
        return out.reshape((shape[0], shape[1]) + out.shape[1:])

    h_seq = x_seq
    for spec, p, s in zip(specs, params, scales):
        if spec[0] == "relu":
            spikes, _ = if_scan(h_seq / s, params=p_if)
            h_seq = spikes * s
        else:
            h_seq = flat_apply(spec, p, h_seq)
    return jnp.mean(h_seq, axis=0)


def convert(
    specs: Sequence[Tuple],
    params: List[Optional[Dict]],
    calibration: jax.Array,
    mode: str = "max",
    num_steps: int = 32,
):
    """Full conversion: returns ``snn_fn(x) -> rate-decoded outputs`` and
    the collected scales (parity: ``ann2snn.Converter.__call__``)."""
    scales = collect_scales(specs, params, calibration, mode)

    def snn_fn(x):
        return snn_forward(specs, params, scales, x, num_steps)

    return snn_fn, scales
