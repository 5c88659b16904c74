"""Masked-shift 3x3 SAME conv Pallas TPU kernel for TRAINING (fwd + bwd).

MEASURED NEGATIVE for stage-2 (kept: parity-locked capability + the
evidence). Hypothesis was that XLA's conv emitters were the ~0.55-MXU
bottleneck of the 28-ms stage-2 step and the megakernel's masked-shift
formulation (0.75 MXU at inference) would transfer to training. The
isolated A/B (scripts/bench_spike_conv.py, v5e, batch 256, T=16, bf16,
scan-timed) says otherwise: XLA's train-shape convs are already near
their roofline — per-layer fwd+bwd MXU 0.25/0.69/0.88/0.79/0.60 for
64->128/128->256/256->512/512->256/320->128 — and this kernel is
SLIGHTLY SLOWER at every big shape (e.g. 9.47 vs 8.24 ms fwd+bwd at
256->512; full step 28.3 vs 27.9 ms as backend 'bnlifconv'). The
residual step-level MXU gap lives in the small-channel early layers
(the same sub-128-lane padding wall as the stage-1 bnlif negative) and
non-conv work, not in the conv emitters. The xyrow trick wins at
inference because the whole net is VMEM-resident; standalone, the 3x
shifted-operand materialization is pure VPU overhead that XLA's direct
conv avoids.

Design (what the kernel does):

  * forward: ``y = conv3x3(x, W) + b`` as three kernel-row matmuls
    ((M, 3Cin) x (3Cin, Cout), the megakernel's measured-winner 'xyrow'
    mode) over x-shifted copies of the input, combined with two masked
    y-rolls. Because the operand view is (HW, T, N, C) — a bitcast of
    the conv-native layout, shared with ops/bn_lif — the rolls move
    along the leading hw axis and can never cross samples; edge masks
    depend only on the 49 spatial positions.
  * the forward also emits the per-channel BN moments (sum(y), sum(y^2))
    accumulated across the whole grid in a VMEM-resident (1, C) block
    (the ops/bn_lif d(scale) trick), so BatchNorm never re-reads the
    conv output from HBM: stats come from ``moments=`` (models/layers).
    Moments are taken on the ROUNDED (storage-dtype) y — bit-identical
    to what the unfused path's BatchNorm sees.
  * backward: ONE kernel produces dx, dW and db. dW contracts over the
    (hw*T*N) rows per kernel-row ((3Cin, M) x (M, Cout)), accumulated
    across the grid in a resident (3, 3Cin, Cout) block; dx transposes
    the shift structure (y-rolls move to the incoming gradient, x-rolls
    to the outgoing one). The moment cotangents fold in as
    ``gy_total = gy + gs1 + 2 * y * gs2`` (y re-read, not recomputed:
    the step is MXU-bound, HBM has headroom).

Parity: tests/test_spike_conv.py checks fwd == lax.conv (and moments ==
direct sums) plus dx/dW/db against jax.grad of the XLA conv, fp32 and
bf16.

Reference provenance: the conv these kernels implement is the denoiser
block conv of ``snn_model/vq_diffusion.py:150-208`` (3x3, stride 1,
SAME); the recompute-free single-pass backward design follows the same
decisions as the reference's fused BPTT kernels
(``auto_cuda/neuron_kernel.py:102-224``) — keep everything for one tile
in fast memory, write each tensor once.
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8

_INTERPRET = False  # flipped by tests on CPU

# batch rows per grid step (both kernels); env knob for on-hardware A/B
_BLK = int(_os.environ.get("SD_SPIKECONV_BLK", "8"))

# VMEM budget for the _tiling estimate (tests shrink it to force the
# T-chunked 2-D grid on tiny CPU shapes)
_VMEM_BUDGET = 80 * 1024 * 1024


def _roll(x: jax.Array, s: int) -> jax.Array:
    """Left-rotate the leading (hw) axis by s: out[p] = x[p+s]."""
    s = s % x.shape[0]
    if s == 0:
        return x
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _masks(hw2: int, hw: int, ndim: int):
    """(xmask_m, xmask_p, ymask_m, ymask_p) with shape (hw2, 1, ..., 1).

    Same conventions as ops/fused_denoiser._build_masks('xy'), but the
    position index is the whole leading axis (n lives on its own axis
    here, so rolls never cross samples — only grid edges are masked).
    """
    shape = (hw2,) + (1,) * (ndim - 1)
    p = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    yy = p // hw
    xx = p % hw
    return (xx - 1 >= 0, xx + 1 < hw, yy - 1 >= 0, yy + 1 < hw)


def _xshift_cat(x, xmask_m, xmask_p):
    """concat of the three x-shifted copies on the channel axis: the
    'xyrow' operand (kw index runs -1, 0, +1 == the (3, 3Cin, Cout)
    weight reshape's (kw, cin) grouping)."""
    zero = jnp.zeros_like(x)
    u_m = jnp.where(xmask_m, _roll(x, -1), zero)
    u_p = jnp.where(xmask_p, _roll(x, 1), zero)
    return jnp.concatenate([u_m, x, u_p], axis=-1)


def _row_mask(blk: int, n: int):
    """(1, 1, blk, 1) validity of this grid step's batch rows: pad rows
    carry y = bias (conv of zeros), which must not leak into the
    accumulated moments / bias gradient."""
    row = pl.program_id(0) * blk + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, blk, 1), 2
    )
    return (row < n).astype(jnp.float32)


def _fwd_kernel(
    x_ref, w_ref, b_ref, y_ref, s1_ref, s2_ref, *,
    hw: int, n: int, with_moments: bool,
):
    hw2, t, blk, cin = x_ref.shape
    cout = w_ref.shape[-1]
    xm_m, xm_p, ym_m, ym_p = _masks(hw2, hw, 4)
    big = _xshift_cat(x_ref[...], xm_m, xm_p)
    bigm = big.reshape(hw2 * t * blk, 3 * cin)
    v = [
        jnp.dot(bigm, w_ref[dy], preferred_element_type=jnp.float32)
        .reshape(hw2, t, blk, cout)
        for dy in range(3)
    ]
    y = v[1] + b_ref[...].astype(jnp.float32)
    zf = jnp.zeros_like(y)
    y = y + jnp.where(ym_m, _roll(v[0], -hw), zf)
    y = y + jnp.where(ym_p, _roll(v[2], hw), zf)
    y = y.astype(y_ref.dtype)
    y_ref[...] = y
    if with_moments:
        # moments of the ROUNDED y (what the unfused BN reads), fp32 sums
        yf = y.astype(jnp.float32) * _row_mask(blk, n)
        s1 = jnp.sum(yf, axis=(0, 1, 2))[None]
        s2 = jnp.sum(yf * yf, axis=(0, 1, 2))[None]
    else:  # outputs must still be defined
        s1 = s2 = jnp.zeros(s1_ref.shape, jnp.float32)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(jnp.logical_not(first))
    def _acc():
        s1_ref[...] = s1_ref[...] + s1
        s2_ref[...] = s2_ref[...] + s2


def _bwd_kernel(
    x_ref, w_ref, y_ref, gy_ref, gs1_ref, gs2_ref,
    gx_ref, gw_ref, gb_ref, *, hw: int, n: int, with_moments: bool,
):
    hw2, t, blk, cin = x_ref.shape
    cout = w_ref.shape[-1]
    xm_m, xm_p, ym_m, ym_p = _masks(hw2, hw, 4)

    g = gy_ref[...].astype(jnp.float32)
    if with_moments:
        # y = conv out; s1 = sum y, s2 = sum y^2 cotangents fold into gy
        # — masked to the true batch rows (the moments were)
        g = g + (
            gs1_ref[...] + 2.0 * gs2_ref[...] * y_ref[...].astype(
                jnp.float32
            )
        ) * _row_mask(blk, n)
    gb = jnp.sum(g * _row_mask(blk, n), axis=(0, 1, 2))[None]

    # transpose of the y-roll combine: gv_dy[q] = mask[q + dy*hw] *
    # g[q + dy*hw] (the forward read v_dy at p - dy*hw... with masks on
    # the OUTPUT position, so roll the masked gradient)
    zf = jnp.zeros_like(g)
    gv = (
        _roll(jnp.where(ym_m, g, zf), hw),   # dy = -1
        g,                                   # dy =  0
        _roll(jnp.where(ym_p, g, zf), -hw),  # dy = +1
    )

    big = _xshift_cat(x_ref[...], xm_m, xm_p)
    m = hw2 * t * blk
    bigm = big.reshape(m, 3 * cin)
    gbig = None
    for dy in range(3):
        gvm = gv[dy].astype(x_ref.dtype).reshape(m, cout)
        # dW[dy] = big^T . gv_dy — contract the row axis on the MXU
        gw_dy = jax.lax.dot_general(
            bigm, gvm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[None]
        gw_acc = gw_dy if dy == 0 else jnp.concatenate(
            [gw_acc, gw_dy], axis=0
        )
        # d big += gv_dy . W[dy]^T
        d = jax.lax.dot_general(
            gvm, w_ref[dy], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gbig = d if gbig is None else gbig + d

    gbig = gbig.reshape(hw2, t, blk, 3 * cin)
    gu_m = gbig[..., :cin]
    gu_0 = gbig[..., cin:2 * cin]
    gu_p = gbig[..., 2 * cin:]
    # transpose of the masked x-shifts: u_m[p] = m_m[p] * x[p-1]
    # => gx[q] += (m_m * gu_m)[q+1]; u_p[p] = m_p[p] * x[p+1]
    # => gx[q] += (m_p * gu_p)[q-1]
    zc = jnp.zeros_like(gu_0)
    gx = gu_0
    gx = gx + _roll(jnp.where(xm_m, gu_m, zc), 1)
    gx = gx + _roll(jnp.where(xm_p, gu_p, zc), -1)
    gx_ref[...] = gx.astype(gx_ref.dtype)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        gw_ref[...] = gw_acc
        gb_ref[...] = gb

    @pl.when(jnp.logical_not(first))
    def _acc():
        gw_ref[...] = gw_ref[...] + gw_acc
        gb_ref[...] = gb_ref[...] + gb


def _tiling(
    n_pad: int, hw2: int, t: int, cin: int, cout: int, isz: int
) -> Tuple[int, int]:
    """(blk, tchunk): batch rows and T-steps per grid step.

    The batch block must stay a multiple of 8 (sublane rule), so VMEM
    pressure is relieved by chunking the T axis (a second grid dim) —
    conv is independent per (t, n); only the moment/dW accumulators
    cross chunks, and they are grid-resident. Budget models the BACKWARD
    kernel (it dominates: the (rows, 3Cin) fp32 d-big intermediate alone
    is 2x the fwd's operand; measured OOM: 512->256 @ blk 8, t 16 wants
    106 MB vs the 100 MB scoped-vmem limit)."""
    blk = n_pad if n_pad < _BLK else _BLK
    budget = _VMEM_BUDGET

    def est(tc: int) -> int:
        rows = hw2 * tc * blk
        return (
            rows * 3 * cin * (isz + 4)           # big + d(big) fp32
            + rows * cout * 3 * 4                # gv rolls fp32
            # x, gx, y, gy streamed blocks: 2x for Mosaic's grid-step
            # double buffering (measured: fp32 320->128 t16 stack-allocs
            # 109 MB where the single-buffer model said 83)
            + rows * (2 * cin + 2 * cout) * isz * 2
            + 3 * 3 * cin * cout * (isz + 4)     # w + gw accumulator
        )

    tchunk = t
    for cand in sorted((d for d in range(1, t + 1) if t % d == 0),
                       reverse=True):
        tchunk = cand
        if est(cand) <= budget:
            break
    return blk, tchunk


def _padded_n(n: int) -> int:
    n_pad = math.ceil(n / SUBLANES) * SUBLANES
    b = n_pad if n_pad < _BLK else _BLK
    return math.ceil(n_pad / b) * b


@functools.lru_cache(maxsize=None)
def _build_calls(
    hw2: int, hw: int, t: int, n_pad: int, n: int, cin: int, cout: int,
    dtype: jnp.dtype, with_moments: bool, interpret: bool,
):
    isz = jnp.dtype(dtype).itemsize
    blk, tchunk = _tiling(n_pad, hw2, t, cin, cout, isz)
    grid = (n_pad // blk, t // tchunk)

    def xspec(c):
        return pl.BlockSpec(
            (hw2, tchunk, blk, c), lambda i, j: (0, j, i, 0),
            memory_space=pltpu.VMEM,
        )

    def rspec(shape):  # whole-array resident block (weights, accums)
        nd = len(shape)
        return pl.BlockSpec(
            shape, functools.partial(lambda i, j, nd: (0,) * nd, nd=nd),
            memory_space=pltpu.VMEM,
        )

    cparams = (
        None if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    mspec = [rspec((1, cout)), rspec((1, cout))]
    mshape = [
        jax.ShapeDtypeStruct((1, cout), jnp.float32),
        jax.ShapeDtypeStruct((1, cout), jnp.float32),
    ]

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, n=n, with_moments=with_moments),
        grid=grid,
        in_specs=[xspec(cin), rspec((3, 3 * cin, cout)), rspec((1, cout))],
        out_specs=[xspec(cout)] + mspec,
        out_shape=[jax.ShapeDtypeStruct((hw2, t, n_pad, cout), dtype)]
        + mshape,
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw, n=n, with_moments=with_moments),
        grid=grid,
        in_specs=[
            xspec(cin), rspec((3, 3 * cin, cout)), xspec(cout),
            xspec(cout),
        ] + mspec,
        out_specs=[
            xspec(cin), rspec((3, 3 * cin, cout)),
            rspec((1, cout)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hw2, t, n_pad, cin), dtype),
            jax.ShapeDtypeStruct((3, 3 * cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )
    return fwd, bwd


def _w_rows(kernel: jax.Array, dtype) -> jax.Array:
    """(3, 3, Cin, Cout) HWIO -> (3, 3Cin, Cout) per-kernel-row blocks
    (row-major (kw, cin) grouping — matches _xshift_cat's concat)."""
    kh, kw, cin, cout = kernel.shape
    return kernel.astype(jnp.float32).reshape(kh, kw * cin, cout).astype(
        dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _spike_conv_4d(
    x4, kernel, bias, hw: int, with_moments: bool
):
    hw2, t, n, cin = x4.shape
    n_pad = _padded_n(n)
    if n_pad != n:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    fwd, _ = _build_calls(
        hw2, hw, t, n_pad, n, cin, kernel.shape[-1], x4.dtype,
        with_moments, _INTERPRET,
    )
    w = _w_rows(kernel, x4.dtype)
    b = bias.astype(jnp.float32)[None]
    y, s1, s2 = fwd(x4, w, b)
    return y[:, :, :n], s1[0], s2[0]


def _spike_conv_4d_fwd(x4, kernel, bias, hw: int, with_moments: bool):
    out = _spike_conv_4d(x4, kernel, bias, hw, with_moments)
    return out, (x4, kernel, out[0])


def _spike_conv_4d_bwd(hw: int, with_moments: bool, res, g):
    x4, kernel, y = res
    gy, gs1, gs2 = g
    hw2, t, n, cin = x4.shape
    cout = kernel.shape[-1]
    n_pad = _padded_n(n)
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        x4 = jnp.pad(x4, pad)
        y = jnp.pad(y, pad)
        gy = jnp.pad(gy, pad)
    _, bwd = _build_calls(
        hw2, hw, t, n_pad, n, cin, cout, x4.dtype, with_moments,
        _INTERPRET,
    )
    w = _w_rows(kernel, x4.dtype)
    gx, gw, gb = bwd(
        x4, w, y, gy.astype(x4.dtype),
        gs1.astype(jnp.float32)[None], gs2.astype(jnp.float32)[None],
    )
    # (3, 3Cin, Cout) fp32 -> HWIO (3, 3, Cin, Cout)
    gkernel = gw.reshape(3, 3, cin, cout)
    return gx[:, :, :n], gkernel, gb[0]


_spike_conv_4d.defvjp(_spike_conv_4d_fwd, _spike_conv_4d_bwd)


def spike_conv3x3(
    x_seq: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    with_moments: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused 3x3 SAME stride-1 conv (+ BN moments) over (T, N, H, W, Cin).

    Args:
      x_seq: (T, N, H, W, Cin) activations (bf16 stays bf16 in HBM).
      kernel: (3, 3, Cin, Cout) HWIO flax conv kernel (fp32 params).
      bias: (Cout,) or None.
      with_moments: also return (sum(y), sum(y*y)) per channel, fp32,
        accumulated in-kernel — feed ``models.layers.SeqBatchNorm``'s
        ``moments=`` so BN never re-reads y from HBM. The count for the
        mean is ``T * N * H * W``.

    Returns (y_seq (T, N, H, W, Cout), s1 (Cout,), s2 (Cout,)); with
    ``with_moments=False`` s1/s2 are zeros (still returned — static
    shapes keep the custom_vjp uniform).
    """
    if kernel.shape[0] != 3 or kernel.shape[1] != 3:
        raise ValueError(f"3x3 kernels only, got {kernel.shape}")
    t, n = x_seq.shape[0], x_seq.shape[1]
    h, wdt = x_seq.shape[2], x_seq.shape[3]
    if h != wdt:
        raise ValueError(f"square spatial only, got {h}x{wdt}")
    cin, cout = kernel.shape[2], kernel.shape[3]
    hw2 = h * wdt
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    # (T, N, HW, C) -> (HW, T, N, C): bitcast of the conv-native layout
    # (same view as ops/bn_lif — the pair chains with no layout copies)
    x4 = jnp.transpose(x_seq.reshape(t, n, hw2, cin), (2, 0, 1, 3))
    y4, s1, s2 = _spike_conv_4d(x4, kernel, bias, h, with_moments)
    y = jnp.transpose(y4, (1, 2, 0, 3)).reshape(
        (t, n, h, wdt, cout)
    )
    return y, s1, s2
