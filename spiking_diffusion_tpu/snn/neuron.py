"""Spiking neuron dynamics as pure functions over explicit state.

TPU-native equivalent of spikingjelly ``activation_based/neuron.py``:
the reference keeps the membrane potential as mutable module memory
(``MemoryModule``, reset via ``functional.reset_net`` after every forward);
here the membrane is a ``lax.scan`` carry, created fresh per call — there is
nothing to reset and the whole T-loop lives inside one XLA computation.

Dynamics parity (spikingjelly ``LIFNode``, ``neuron.py:726-762,131-141``):

    charge (decay_input=True):  H[t] = V[t-1] + (X[t] - (V[t-1] - v_reset)) / tau
    charge (decay_input=False): H[t] = V[t-1] - (V[t-1] - v_reset)/tau + X[t]
    fire:                       S[t] = Theta(H[t] - v_th)       (surrogate grad)
    hard reset:                 V[t] = (1 - S[t]) * H[t] + S[t] * v_reset
    soft reset:                 V[t] = H[t] - S[t] * v_th

The app uses LIF with all defaults: tau=2, v_th=1, v_reset=0,
decay_input=True, hard reset, detach_reset=False, ATan surrogate
(``snn_model/vae_model.py:113`` etc.).

``lif_multi_step`` dispatches between the plain ``lax.scan`` path (the
oracle, used on CPU and in tests) and the fused Pallas TPU kernel in
:mod:`spiking_diffusion_tpu.ops.pallas_lif` (the performance path,
replacing the reference's CuPy/NVRTC fused CUDA kernels in
``spikingjelly/activation_based/auto_cuda/neuron_kernel.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.snn.surrogate import SurrogateFn, atan


@dataclasses.dataclass(frozen=True)
class NeuronParams:
    """Static neuron constants (hashable; safe as a jit-static arg)."""

    tau: float = 2.0
    v_threshold: float = 1.0
    v_reset: float = 0.0
    decay_input: bool = True
    hard_reset: bool = True
    detach_reset: bool = False
    surrogate: SurrogateFn = atan

    @property
    def decay(self) -> float:
        """1/tau, the decay factor the fused kernels use."""
        return 1.0 / self.tau


def _charge_lif(v: jax.Array, x: jax.Array, p: NeuronParams) -> jax.Array:
    if p.decay_input:
        return v + (x - (v - p.v_reset)) * p.decay
    return v - (v - p.v_reset) * p.decay + x


def _fire(h: jax.Array, p: NeuronParams) -> jax.Array:
    return p.surrogate(h - p.v_threshold)


def _reset(h: jax.Array, s: jax.Array, p: NeuronParams) -> jax.Array:
    s_r = jax.lax.stop_gradient(s) if p.detach_reset else s
    if p.hard_reset:
        return (1.0 - s_r) * h + s_r * p.v_reset
    return h - s_r * p.v_threshold


def lif_step(
    v: jax.Array, x: jax.Array, params: NeuronParams = NeuronParams()
) -> Tuple[jax.Array, jax.Array]:
    """One LIF timestep: (v, x) -> (v_next, spike)."""
    h = _charge_lif(v, x, params)
    s = _fire(h, params)
    return _reset(h, s, params), s


def if_step(
    v: jax.Array, x: jax.Array, params: NeuronParams = NeuronParams()
) -> Tuple[jax.Array, jax.Array]:
    """One IF timestep (no leak): H[t] = V[t-1] + X[t]."""
    h = v + x
    s = _fire(h, params)
    return _reset(h, s, params), s


def lif_scan(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
    return_v_seq: bool = False,
):
    """LIF over a (T, ...) input sequence via ``lax.scan``.

    Returns ``spike_seq`` of the same shape, plus the membrane sequence when
    ``return_v_seq`` (parity with ``store_v_seq``). Membranes are computed in
    fp32 regardless of input dtype (matches the fused-kernel precision rule:
    spikes may be bf16, membranes must not).
    """
    xt = x_seq.astype(jnp.float32)
    if v_init is None:
        v_init = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)

    def body(v, x):
        v_next, s = lif_step(v, x, params)
        return v_next, (s, v_next) if return_v_seq else s

    v_last, ys = jax.lax.scan(body, v_init, xt)
    if return_v_seq:
        s_seq, v_seq = ys
        return s_seq.astype(x_seq.dtype), v_seq, v_last
    return ys.astype(x_seq.dtype), v_last


def if_scan(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
):
    """IF neuron over (T, ...) input."""
    xt = x_seq.astype(jnp.float32)
    if v_init is None:
        v_init = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)

    def body(v, x):
        v_next, s = if_step(v, x, params)
        return v_next, s

    v_last, s_seq = jax.lax.scan(body, v_init, xt)
    return s_seq.astype(x_seq.dtype), v_last


def plif_scan(
    x_seq: jax.Array,
    w: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
):
    """Parametric LIF (learnable time constant) over (T, ...) input.

    Parity: spikingjelly ``ParametricLIFNode`` (``neuron.py:1013-1205``)
    parameterizes the decay as ``sigmoid(w) = 1/tau`` and learns ``w``.
    """
    decay = jax.nn.sigmoid(w)
    xt = x_seq.astype(jnp.float32)
    if v_init is None:
        v_init = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)

    def body(v, x):
        if params.decay_input:
            h = v + (x - (v - params.v_reset)) * decay
        else:
            h = v - (v - params.v_reset) * decay + x
        s = _fire(h, params)
        return _reset(h, s, params), s

    v_last, s_seq = jax.lax.scan(body, v_init, xt)
    return s_seq.astype(x_seq.dtype), v_last


def qif_scan(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
    a0: float = 1.0,
    v_c: float = 0.8,
):
    """Quadratic integrate-and-fire over (T, ...) input.

    Parity: spikingjelly ``QIFNode`` charge
    H[t] = V[t-1] + (X[t] + a0 (V-v_reset)(V-v_c)) / tau.
    """
    xt = x_seq.astype(jnp.float32)
    if v_init is None:
        v_init = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)

    def body(v, x):
        h = v + (x + a0 * (v - params.v_reset) * (v - v_c)) * params.decay
        s = _fire(h, params)
        return _reset(h, s, params), s

    v_last, s_seq = jax.lax.scan(body, v_init, xt)
    return s_seq.astype(x_seq.dtype), v_last


def eif_scan(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
    delta_t: float = 1.0,
    theta_rh: float = 0.8,
):
    """Exponential integrate-and-fire over (T, ...) input.

    Parity: spikingjelly ``EIFNode`` charge
    H = V + (X - (V - v_rest) + dT * exp((V - theta_rh)/dT)) / tau.
    """
    xt = x_seq.astype(jnp.float32)
    if v_init is None:
        v_init = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)

    def body(v, x):
        h = v + (
            x - (v - params.v_reset)
            + delta_t * jnp.exp((v - theta_rh) / delta_t)
        ) * params.decay
        s = _fire(h, params)
        return _reset(h, s, params), s

    v_last, s_seq = jax.lax.scan(body, v_init, xt)
    return s_seq.astype(x_seq.dtype), v_last


def izhikevich_scan(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    w_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
    a: float = 0.02,
    b: float = 0.2,
    v_rest: float = -0.1,
    w_rest: float = 0.0,
    tau_w: float = 2.0,
    a0: float = 1.0,
    v_c: float = 0.8,
):
    """Izhikevich (adaptive quadratic) neuron: two-variable dynamics with a
    recovery current w (parity: spikingjelly ``IzhikevichNode``)."""
    xt = x_seq.astype(jnp.float32)
    if v_init is None:
        v_init = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)
    if w_init is None:
        w_init = jnp.full(x_seq.shape[1:], w_rest, jnp.float32)

    def body(carry, x):
        v, w = carry
        h = v + (x + a0 * (v - v_rest) * (v - v_c) - w) * params.decay
        s = _fire(h, params)
        v_next = _reset(h, s, params)
        w_next = w + (a * (b * (v_next - v_rest)) - w + w_rest) / tau_w
        return (v_next, w_next), s

    (v_last, w_last), s_seq = jax.lax.scan(body, (v_init, w_init), xt)
    return s_seq.astype(x_seq.dtype), v_last, w_last


def lif_multi_step(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
    backend: str = "auto",
    train: bool = True,
) -> jax.Array:
    """Multi-step LIF forward, backend-dispatched; returns the spike train.

    ``backend``: 'scan' (pure lax.scan, the parity oracle), 'unroll'
    (statically unrolled elementwise ops + recompute VJP — the TPU fast
    path), 'pallas' (fused Pallas kernel), or 'auto'. Mirrors
    spikingjelly's torch-vs-cupy backend switch (``neuron.py:930-967``).

    'auto' picks 'unroll' on TPU: measured on v5e (batch 256, T=16) the
    unrolled path trains at 32.5 ms/step vs 63.8 (pallas) / 132 (scan) —
    being layout-free, it fuses with the neighboring conv/BN ops in XLA's
    preferred batch-minor layouts instead of paying layout-transpose
    copies around every pallas_call (see ops/unrolled_lif.py). On CPU the
    scan path keeps compile time small.
    """
    if backend == "auto":
        backend = "unroll" if _pallas_ok(params) else "scan"
    if backend == "pallas":
        from spiking_diffusion_tpu.ops import pallas_lif

        return pallas_lif.lif_fused(x_seq, v_init=v_init, params=params)
    if backend == "unroll":
        from spiking_diffusion_tpu.ops import unrolled_lif

        return unrolled_lif.lif_unrolled(x_seq, v_init=v_init, params=params)
    s_seq, _ = lif_scan(x_seq, v_init=v_init, params=params)
    return s_seq


def _pallas_ok(params: NeuronParams) -> bool:
    try:
        dev = jax.devices()[0].platform
    except RuntimeError:
        return False
    if dev != "tpu":
        return False
    # fused kernel covers the configs the app uses
    return params.surrogate.name in ("atan", "sigmoid")
