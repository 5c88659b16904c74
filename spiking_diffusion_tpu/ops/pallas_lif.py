"""Fused LIF forward/backward-through-time Pallas TPU kernels.

TPU-native replacement for the reference's fused CUDA neuron kernels
(``spikingjelly/activation_based/auto_cuda/neuron_kernel.py``:
``LIFNodeFPTTKernel``/``LIFNodeBPTTKernel`` + the ``LIFNodeATGF`` autograd
glue): one kernel runs the whole T-step charge/fire/reset recurrence with
the membrane held in registers/VMEM — a single HBM read of ``x_seq`` and a
single HBM write of ``spike_seq`` per pass, instead of T round-trips.

Differences from the CUDA design, on purpose:
  * The backward kernel *recomputes* the pre-reset membranes H[t] from
    ``x_seq`` in VMEM scratch instead of loading an ``h_seq`` saved by the
    forward pass (the reference stores h_seq and even bit-packs spikes to
    afford it, ``tensor_cache.py``). Recompute costs a handful of VPU flops
    and saves a full (T, N) HBM write + read + residency — on TPU the
    recurrence is bandwidth-bound, so this wins.
  * Layout: features are flattened and tiled to (T, R, 128) lanes; the grid
    walks R in blocks. One program handles all T steps of its block (the
    CUDA version does the same per-thread: ``CKernel2D``'s in-kernel T loop,
    ``auto_cuda/base.py:843-1000``).
  * Parity oracle: :func:`spiking_diffusion_tpu.snn.neuron.lif_scan`; the
    test suite checks forward + VJP equality, reprising the reference's
    torch-vs-cupy checker (``neuron_kernel.py:1264-1311``).

Membranes are always fp32 (bf16 inputs are upcast in-kernel).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spiking_diffusion_tpu.snn.neuron import NeuronParams
from spiking_diffusion_tpu.snn import surrogate as sg

LANES = 128
SUBLANES = 8  # fp32 tile granularity

_INTERPRET = False  # flipped by tests on CPU


def _surrogate_grad(h_minus_th: jax.Array, params: NeuronParams) -> jax.Array:
    return params.surrogate.grad(h_minus_th)


def _charge(v, x, p: NeuronParams):
    if p.decay_input:
        return v + (x - (v - p.v_reset)) * p.decay
    return v - (v - p.v_reset) * p.decay + x


def _fwd_kernel(x_ref, v0_ref, s_ref, vT_ref, *, T: int, p: NeuronParams):
    v = v0_ref[...]
    for t in range(T):
        h = _charge(v, x_ref[t], p)
        spike = (h >= p.v_threshold).astype(jnp.float32)
        s_ref[t] = spike
        if p.hard_reset:
            v = (1.0 - spike) * h + spike * p.v_reset
        else:
            v = h - spike * p.v_threshold
    vT_ref[...] = v


def _bwd_kernel(
    x_ref, v0_ref, gs_ref, gvT_ref, gx_ref, gv0_ref, h_scr, *,
    T: int, p: NeuronParams
):
    # pass 1: recompute pre-reset membranes H[t] into VMEM scratch
    v = v0_ref[...]
    for t in range(T):
        h = _charge(v, x_ref[t], p)
        h_scr[t] = h
        spike = (h >= p.v_threshold).astype(jnp.float32)
        if p.hard_reset:
            v = (1.0 - spike) * h + spike * p.v_reset
        else:
            v = h - spike * p.v_threshold

    # pass 2: reverse-time gradient recurrence.
    # gh[t] = (gv_direct[t] + gh[t+1] * dH[t+1]/dV[t]) * dV/dH + gs[t] * sg
    # Here gv_direct exists only at t = T-1 (the v_last output).
    dh_dv = 1.0 - p.decay  # dH[t+1]/dV[t], same for both charge variants
    gh_next = jnp.zeros_like(v)
    gv_carry = gvT_ref[...]  # dL/dV[T-1] direct
    for t in range(T - 1, -1, -1):
        h = h_scr[t]
        spike = (h >= p.v_threshold).astype(jnp.float32)
        surr = _surrogate_grad(h - p.v_threshold, p)
        gv = gv_carry + gh_next * dh_dv
        if p.hard_reset:
            dv_dh = 1.0 - spike
            reset_term = (p.v_reset - h) * surr
        else:
            dv_dh = jnp.ones_like(spike)
            reset_term = -p.v_threshold * surr
        if p.detach_reset:
            gh = gv * dv_dh + gs_ref[t] * surr
        else:
            gh = gv * (dv_dh + reset_term) + gs_ref[t] * surr
        gx_ref[t] = gh * (p.decay if p.decay_input else 1.0)
        gh_next = gh
        gv_carry = jnp.zeros_like(gv_carry)
    gv0_ref[...] = gh_next * dh_dv


def _block_rows(r_pad: int) -> int:
    # pick a block height: multiple of 8 sublanes, capped to bound VMEM
    # (fwd: ~2 bufs * T * blk * 128 * 4B; blk=64, T=16 -> ~1 MB/buf)
    return min(r_pad, 64)


@functools.lru_cache(maxsize=None)
def _build_calls(T: int, r_pad: int, p: NeuronParams, interpret: bool):
    blk = _block_rows(r_pad)
    grid = (r_pad // blk,)

    x_spec = pl.BlockSpec(
        (T, blk, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    v_spec = pl.BlockSpec((blk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, p=p),
        grid=grid,
        in_specs=[x_spec, v_spec],
        out_specs=[x_spec, v_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, r_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, LANES), jnp.float32),
        ],
        interpret=interpret,
    )

    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, p=p),
        grid=grid,
        in_specs=[x_spec, v_spec, x_spec, v_spec],
        out_specs=[x_spec, v_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, r_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((T, blk, LANES), jnp.float32)],
        interpret=interpret,
    )
    return fwd, bwd


def _to_tiles(x2d: jax.Array, r_pad: int) -> jax.Array:
    """(T, M) -> (T, r_pad, 128), zero-padded."""
    t, m = x2d.shape
    m_pad = r_pad * LANES
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, 0), (0, m_pad - m)))
    return x2d.reshape(t, r_pad, LANES)


def _padded_rows(m: int) -> int:
    # rows of 128 lanes, rounded so the grid divides evenly by the block
    r_pad = math.ceil(math.ceil(m / LANES) / SUBLANES) * SUBLANES
    b = _block_rows(r_pad)
    return math.ceil(r_pad / b) * b


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lif_fused_2d(x2d: jax.Array, v0: jax.Array, p: NeuronParams):
    s, _vT = _run_fwd(x2d, v0, p)
    return s


def _run_fwd(x2d, v0, p: NeuronParams):
    t, m = x2d.shape
    r_pad = _padded_rows(m)
    fwd, _ = _build_calls(t, r_pad, p, _INTERPRET)
    xt = _to_tiles(x2d.astype(jnp.float32), r_pad)
    v0t = _to_tiles(v0.astype(jnp.float32)[None], r_pad)[0]
    s_t, vT_t = fwd(xt, v0t)
    s = s_t.reshape(t, r_pad * LANES)[:, :m]
    vT = vT_t.reshape(r_pad * LANES)[:m]
    return s, vT


def _lif_fused_2d_fwd(x2d, v0, p: NeuronParams):
    s, _vT = _run_fwd(x2d, v0, p)
    return s, (x2d, v0)


def _lif_fused_2d_bwd(p: NeuronParams, res, g):
    x2d, v0 = res
    t, m = x2d.shape
    r_pad = _padded_rows(m)
    _, bwd = _build_calls(t, r_pad, p, _INTERPRET)
    xt = _to_tiles(x2d.astype(jnp.float32), r_pad)
    v0t = _to_tiles(v0.astype(jnp.float32)[None], r_pad)[0]
    gst = _to_tiles(g.astype(jnp.float32), r_pad)
    gvT = jnp.zeros((r_pad, LANES), jnp.float32)
    gx_t, gv0_t = bwd(xt, v0t, gst, gvT)
    gx = gx_t.reshape(t, r_pad * LANES)[:, :m]
    gv0 = gv0_t.reshape(r_pad * LANES)[:m]
    return gx, gv0


_lif_fused_2d.defvjp(_lif_fused_2d_fwd, _lif_fused_2d_bwd)


def lif_fused(
    x_seq: jax.Array,
    v_init: Optional[jax.Array] = None,
    params: NeuronParams = NeuronParams(),
) -> jax.Array:
    """Fused multi-step LIF: (T, ...) input -> (T, ...) spike train.

    Drop-in replacement for the spike output of
    :func:`spiking_diffusion_tpu.snn.neuron.lif_scan`. The final membrane
    state is not returned (spiking layers in this framework never reuse it
    across calls — fresh state per forward).
    """
    t = x_seq.shape[0]
    m = 1
    for d in x_seq.shape[1:]:
        m *= int(d)
    # membranes are fp32 by rule; cast bf16 inputs up OUTSIDE the
    # custom_vjp so its primal/cotangent dtypes are uniformly fp32
    x2d = x_seq.reshape(t, m).astype(jnp.float32)
    if v_init is None:
        v0 = jnp.full((m,), params.v_reset, jnp.float32)
    else:
        v0 = v_init.reshape(m).astype(jnp.float32)
    s = _lif_fused_2d(x2d, v0, params)
    return s.reshape(x_seq.shape).astype(x_seq.dtype)
