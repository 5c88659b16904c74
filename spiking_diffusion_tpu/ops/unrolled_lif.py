"""Unrolled elementwise LIF with custom VJP — the layout-free fast path.

Why this exists (round-2 perf work, VERDICT #3): the Pallas fused kernel
(:mod:`spiking_diffusion_tpu.ops.pallas_lif`) is HBM-speed-of-light *inside
the kernel*, but XLA assigns conv activations batch-minor tiled layouts
(``{0,3,2,1:T(8,128)}`` — with C=32/64 < 128 lanes, putting T*N on the lane
axis keeps the MXU fed), while a ``pallas_call`` forces default row-major
operands. The resulting layout-transpose ``copy`` pairs around every LIF
(4 extra HBM passes per call, fwd AND bwd) dominated the train step:
~5.7 GB of copy/reshape traffic out of 44 GB total (scripts/
analyze_train_hlo.py).

This implementation instead unrolls the T-step recurrence (T is a static
model constant, 16) into plain elementwise jnp ops:

- no shape or layout constraint at all — XLA fuses charge/fire/reset
  chains *in whatever layout the neighboring convs prefer*, folds the
  preceding BatchNorm normalize into the same fusion, and spends zero
  bytes on transposes;
- backward is a custom VJP that recomputes the pre-reset membranes
  H[t] (one extra elementwise pass) instead of saving them — the same
  recompute-over-store decision as the Pallas BPTT kernel and the
  reference's CUDA design decision it replaces
  (``auto_cuda/neuron_kernel.py:102-224``).

Parity: bit-identical spikes and gradients to ``snn.lif_scan`` /
``ops.pallas_lif`` (tests/test_unrolled_lif.py reuses the same oracle).
Membranes are fp32 regardless of input dtype (CLAUDE.md invariant).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.snn.neuron import NeuronParams, _charge_lif


def _forward_pass(x_seq: jax.Array, v0: jax.Array, p: NeuronParams):
    """Unrolled charge/fire/reset; returns (spike_seq, h_list).

    Membranes are fp32 throughout (x_seq slices are upcast per step inside
    the fusion — never materialized as an fp32 copy of the whole train),
    but the EMITTED spike train is in ``x_seq``'s dtype: under bf16
    activations the (T, N, H, W, C) spike stack — the single largest
    tensor in the train step — is written at half the bytes.
    """
    v = v0
    spikes = []
    hs = []
    for t in range(x_seq.shape[0]):
        h = _charge_lif(v, x_seq[t].astype(jnp.float32), p)
        hs.append(h)
        s = (h >= p.v_threshold).astype(jnp.float32)
        spikes.append(s.astype(x_seq.dtype))
        if p.hard_reset:
            v = (1.0 - s) * h + s * p.v_reset
        else:
            v = h - s * p.v_threshold
    return jnp.stack(spikes), hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lif_unrolled(x_seq: jax.Array, v0: jax.Array, p: NeuronParams):
    return _forward_pass(x_seq, v0, p)[0]


def _fwd(x_seq, v0, p: NeuronParams):
    s_seq, _ = _forward_pass(x_seq, v0, p)
    return s_seq, (x_seq, v0)


def _bwd(p: NeuronParams, res, g):
    x_seq, v0 = res
    T = x_seq.shape[0]
    # recompute pre-reset membranes (elementwise; fuses with the reverse
    # recurrence below inside one XLA computation)
    _, hs = _forward_pass(x_seq, v0, p)

    # reverse-time gradient recurrence — identical math to
    # pallas_lif._bwd_kernel (and spikingjelly's BPTT kernel it mirrors)
    dh_dv = 1.0 - p.decay
    gh_next = jnp.zeros_like(v0)
    gx = [None] * T
    for t in range(T - 1, -1, -1):
        h = hs[t]
        spike = (h >= p.v_threshold).astype(jnp.float32)
        surr = p.surrogate.grad(h - p.v_threshold)
        gv = gh_next * dh_dv
        if p.hard_reset:
            dv_dh = 1.0 - spike
            reset_term = (p.v_reset - h) * surr
        else:
            dv_dh = jnp.ones_like(spike)
            reset_term = -p.v_threshold * surr
        if p.detach_reset:
            gh = gv * dv_dh + g[t] * surr
        else:
            gh = gv * (dv_dh + reset_term) + g[t] * surr
        gx[t] = gh * (p.decay if p.decay_input else 1.0)
        gh_next = gh
    gv0 = gh_next * dh_dv
    # cotangent dtype must match the primal: bf16 activations get bf16
    # input grads (the recurrence itself ran fp32 above)
    return jnp.stack(gx).astype(x_seq.dtype), gv0


_lif_unrolled.defvjp(_fwd, _bwd)


def lif_unrolled(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
) -> jax.Array:
    """Unrolled multi-step LIF: (T, ...) input -> (T, ...) spike train.

    Drop-in replacement for the spike output of ``lif_scan``/``lif_fused``.
    The primal stays in ``x_seq``'s dtype (bf16 spike stacks are written
    at half the bytes — the largest tensors in the train step); membrane
    arithmetic inside is always fp32.
    """
    if v_init is None:
        v0 = jnp.full(x_seq.shape[1:], params.v_reset, jnp.float32)
    else:
        v0 = jnp.broadcast_to(
            v_init.astype(jnp.float32), x_seq.shape[1:]
        )
    return _lif_unrolled(x_seq, v0, params)
