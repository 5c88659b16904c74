"""Whole-denoiser fused Pallas inference kernel (the sampling megakernel).

Motivation (round-2 perf): the generation benchmark is 49 sequential
reverse-diffusion steps, each a full T=16 spiking-denoiser forward
(``snn_model/vq_diffusion.py:103-142,150-208``). The layer-by-layer path
materializes every (T, N, 7, 7, C) spike train and pre-activation in HBM —
at batch 1024 that is ~0.8 GB of traffic *per conv block per step*, and the
measured pipeline sits at ~54% HBM utilization vs ~36% MFU.

This kernel instead runs the ENTIRE denoiser — all conv blocks, BatchNorm
(pre-folded into the conv weights, eval semantics), the LIF recurrences of
every layer, the U-Net skip concat, and the firing-rate logits readout —
inside one ``pallas_call``, for a tile of the batch at a time:

  * all weights (~6 MB bf16 at reference scale) and all membranes
    (~240 KB/sample fp32) live in VMEM for the whole T loop;
  * NO intermediate spike train or membrane ever touches HBM: per grid
    step the only HBM traffic is the first-block pre-activation tile in
    and the logits tile out (the T axis never materializes at all —
    compare the reference's per-layer, per-step round trips);
  * the 3x3 convolutions are expressed as 9 shifted-and-masked MXU
    matmuls over the flattened (tile*h*w, C_in) spike matrix — the
    shift/mask trick turns SAME-padding into row masks so wrap-around
    rows (including batch-boundary crossings) contribute zero, exactly
    like the zero padding they replace.

The first conv block runs OUTSIDE the kernel: its input is the direct-coded
(token, t) map, constant across T (``vq_diffusion.py:195-198``), so it is
one tiny (N,7,7,2)->(N,7,7,C1) conv computed once by XLA and fed in as the
constant LIF-1 charge current (same static-first-layer identity as
models/denoiser.py).

Numerics: matmuls run in the requested compute dtype (bf16 on TPU) with
fp32 accumulation (``preferred_element_type``); membranes, biases and
logits are fp32 (CLAUDE.md invariant). ``dtype=jnp.int8`` (round 3)
quantizes the folded conv weights to symmetric per-output-channel int8
and runs the conv matmuls as int8 x int8 -> int32 — spikes are exactly
{0, 1}, so the activation side is EXACT and only the weight rounding
(<= 0.5/127 of the channel max) approximates; the v5e MXU runs int8 at
~2x bf16 peak (measured end-to-end: 623 -> 861 img/s, batch-16 latency
30.1 -> 23.2 ms). BatchNorm running statistics are
folded into conv kernels with :func:`snn.functional.fuse_conv_bn` — eval
BN is an affine per-channel map, so folding is exact up to one fp32
rounding.

Parity: tests/test_fused_denoiser.py checks (a) the kernel against a pure
jnp mirror of the identical folded computation (tight), and (b) the mirror
against the real ``SpikingDenoiser`` eval path (BN-folding tolerance).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.snn.functional import folded_conv_params
from spiking_diffusion_tpu.snn.neuron import NeuronParams

_INTERPRET = False  # flipped by tests on CPU


def _lif_step(v, a, p: NeuronParams, dtype):
    """One in-kernel LIF step. v, a fp32; returns (v_next fp32, spike dtype).

    Deliberately NOT ``snn.neuron.lif_step``: that fires through the
    surrogate's ``jax.custom_vjp`` (gradient machinery this inference-only
    kernel must not trace through Pallas); the charge/fire/reset math
    below mirrors it exactly (tests/test_fused_denoiser.py locks parity).
    """
    if _ABLATE in ("nolif", "matmul"):
        # roofline ablation: threshold-only spiking, no membrane state
        return v, (a >= p.v_threshold).astype(dtype)
    if p.decay_input:
        h = v + (a - (v - p.v_reset)) * p.decay
    else:
        h = v - (v - p.v_reset) * p.decay + a
    sf = (h >= p.v_threshold).astype(jnp.float32)
    if p.hard_reset:
        v_next = (1.0 - sf) * h + sf * p.v_reset
    else:
        v_next = h - sf * p.v_threshold
    return v_next, sf.astype(dtype)


def _row_roll(x: jax.Array, s: int) -> jax.Array:
    """Left-rotate rows by s (== jnp.roll(x, -s, axis=0)); s may be negative."""
    s = s % x.shape[0]
    if s == 0:
        return x
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _build_masks(r: int, hw: int, mode: str | None = None,
                 n_minor: int = 1):
    """Validity masks for the masked-shift convolutions, (R, 1) booleans.

    Output row p may take input row p + dy*hw + dx iff the (y+dy, x+dx)
    neighbor is inside the hw x hw grid. Rows whose rotation wrapped across
    a sample boundary always fall outside and are masked too (y+dy or
    x+dx out of range there by construction).

    'xy' mode needs only 4 masks (x-1, x+1, y-1, y+1); the other modes use
    the 9 per-tap products. 'xyband' (rows ordered (y, x, n); ``n_minor``
    samples n-minor) needs only the 2 x masks — its y taps are handled by
    static row SLICES, not masks (see :func:`_conv3x3`).
    """
    pidx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    if (mode or _CONV_MODE) == "xyband":
        xb = (pidx // n_minor) % hw
        return (xb - 1 >= 0, xb + 1 < hw)
    yy = (pidx % (hw * hw)) // hw
    xx = pidx % hw
    if (mode or _CONV_MODE) in ("xy", "xyrow"):
        return (
            xx - 1 >= 0,  # xmask_m: reading x[p-1] valid
            xx + 1 < hw,  # xmask_p
            yy - 1 >= 0,  # ymask_m: combining v_{-1}[p-hw] valid
            yy + 1 < hw,  # ymask_p
        )
    masks = []
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        m = (
            (yy + dy >= 0) & (yy + dy < hw) & (xx + dx >= 0) & (xx + dx < hw)
        )
        masks.append(m)
    return masks


import os as _os

# 'xy' | 'xyrow' | 'xyband' | 'taps' | 'im2col' — 'xyrow' was the round-3
# winner (584 vs 564 img/s for 'xy' on v5e: the three per-kernel-row wide
# matmuls keep the MXU busier than nine narrow ones). 'xyband' (round 5,
# VERDICT r4 #6) attacks the padding-tap waste: the tile rows are
# reordered (y, x, n) so the dy=+-1 kernel-row matmuls run on a
# contiguous 42/49 row slice instead of masking — 9.5% fewer executed
# MXU flops AND the two y-align roll+select VPU passes become plain
# concats. Measured on v5e (driver-shaped bench, batch 1024): int8+il2
# 834 -> 1101 img/s (+32%, mfu_useful 0.41 -> 0.54 of int8 peak), bf16
# 593 -> 719 (+21%, mfu_useful 0.59 -> 0.71) — the deleted y-align
# passes were real VPU load on top of the MXU cut, so 'xyband' is the
# default. The remaining x-edge waste (~8.6%) is NOT sliceable in the
# wide-matmul formulation (it lives in zero (R, Cin) sub-blocks of the
# 3Cin concat operand); carving it out needs ~7 narrow matmuls per
# kernel row, which the round-3 'taps'-vs-'xyrow' A/B already measured
# as a net loss. Env override for on-hardware A/B runs.
_CONV_MODE = _os.environ.get("SD_CONV_MODE", "xyband")
_UNROLL_T = False  # unrolling the T loop 16x fails TPU compile (program too large)
# partial T-loop unroll factor (1 = none): fori_loop over T/u with u
# inlined steps per iteration. Measured NEUTRAL-to-NEGATIVE on v5e
# (584.0 at block_n=8/u=2 vs 584.0 at u=1; 581.2 at block_n=16/u=2 vs
# 602.4 at u=1) — the fori_loop body already saturates the scheduler.
_UNROLL_FACTOR = int(_os.environ.get("SD_FUSED_UNROLL", "1"))
# batch rows per kernel tile. Measured on v5e (batch 2048 bf16, end-to-
# end generation): 8 -> 584.0 img/s, 16 -> 602.4 (wider M dim: 784 rows
# = 6.1 MXU tiles vs 3.1, fewer grid iterations), 24 -> 337.0 (VMEM
# pressure kills it), 32 -> Mosaic compile failure. 16 is the default.
_BLOCK_N = int(_os.environ.get("SD_FUSED_BLOCK_N", "16"))
# int8 weight-quantization clip percentile (None = per-channel max).
# Measured on the r3 flagship checkpoint (scripts/analyze_int8_quant.py):
# clipping is a NET LOSS here — 99.9th-pct scaling makes the relative RMS
# weight error 3.9x WORSE (the folded weights have no outlier tail to
# sacrifice), so the knob stays None by default.
_INT8_CLIP_PCT = (
    float(_os.environ["SD_INT8_CLIP_PCT"])
    if _os.environ.get("SD_INT8_CLIP_PCT") else None
)
# int8 scale granularity: 'row' = one dequant scale per kernel-row dy
# (3 per output channel) — 0.75x the weight-rounding error of per-cout
# on the r3 checkpoint for 2 extra (R, Cout) VPU multiplies per conv
# (the xyrow kernel already holds the three v[dy] partials separately);
# 'cout' = the round-3 single per-output-channel scale.
_INT8_SCALES = _os.environ.get("SD_INT8_SCALES", "row")
# sub-tile interleaving: SLOWER in bf16 (525 -> 508 img/s end-to-end —
# half tiles of 196 rows lose more MXU M-tiling efficiency than VPU/MXU
# overlap gains) but a ~3% win at int8 where MXU time is halved and
# VPU/MXU overlap matters more (r4 ladder: xyrow/16/int8 68.7 ->
# 67.0 ms/fwd at il2). Env override for on-hardware A/Bs.
_INTERLEAVE = int(_os.environ.get("SD_FUSED_INTERLEAVE", "1"))
# int8 mixed precision: 'bf16' keeps the final logits conv (the
# categorical sampler's direct input; ~12% of kernel flops at reference
# widths) in bf16 while the inner convs run int8 — spikes are {0,1} so
# the bf16 cast of the conv input is exact; only the inner-conv weight
# rounding remains. Quality/perf A/B knob; 'int8' = fully quantized.
_INT8_LOGITS = _os.environ.get("SD_INT8_LOGITS", "int8")
# ROOFLINE ABLATIONS — benchmarking only, the output is numerically WRONG.
# Quantifies the VPU wall of the (measured) VPU-bound int8 kernel by
# deleting op classes while keeping shapes/dtypes/loop structure:
#   'nolif'   — LIF recurrence -> threshold-only spike (1 compare+cast;
#               removes the charge/fire/reset chain and the carried v)
#   'noshift' — all roll+select traffic removed (taps read unshifted x,
#               kernel-row partials summed without the y re-align)
#   'matmul'  — both: the pure MXU + dequant floor
# Guarded: make_fused_denoise_fn refuses to build silently (stderr warn).
_ABLATE = _os.environ.get("SD_FUSED_ABLATE", "")
if _ABLATE not in ("", "nolif", "noshift", "matmul"):
    raise ValueError(f"SD_FUSED_ABLATE={_ABLATE!r} not in nolif/noshift/matmul")


def _conv3x3_xyband(x, w_ref, b_ref, masks, hw: int, n_minor: int):
    """'xyband' conv: rows ordered (y, x, n), ``n_minor`` samples n-minor.

    One y value occupies ``band = hw * n_minor`` CONTIGUOUS rows, so the
    dy=-1 kernel-row matmul only needs source rows y in [0, hw-1) — a
    static prefix slice — and its output re-aligns to out rows
    [band, R) by a zero-padded concat (dy=+1 symmetric). No y masks, no
    y roll+select; the executed MXU flops drop to (hw^2 + 2 hw(hw-1)) /
    (3 hw^2) of the 9-tap count (VERDICT r4 #6). x taps keep the
    mask+roll trick, with rolls by n_minor (x is no longer row-minor).

    int8 parity note: the fp32 combine order (center, top, bottom, bias)
    matches the xyrow kernel and the mirror bit-for-bit; sliced rows
    contribute literal +0.0 exactly like the masked zero rows they
    replace.
    """
    r = x.shape[0]
    cout = w_ref.shape[-1]
    band = hw * n_minor
    quant = jnp.dtype(x.dtype) == jnp.int8
    xmask_m, xmask_p = masks
    noshift = _ABLATE in ("noshift", "matmul")
    if noshift:
        u_m = u_p = x  # roofline ablation: unshifted taps, unsliced rows
    else:
        zero = jnp.zeros_like(x)
        u_m = jnp.where(xmask_m, _row_roll(x, -n_minor), zero)
        u_p = jnp.where(xmask_p, _row_roll(x, n_minor), zero)
    big = jnp.concatenate([u_m, x, u_p], axis=-1)

    if quant:
        def dot(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    else:
        def dot(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

    v1 = dot(big, w_ref[1])
    if noshift:
        v0, v2 = dot(big, w_ref[0]), dot(big, w_ref[2])
    else:
        v0 = dot(big[: r - band], w_ref[0])  # source y<hw-1 -> out[band:]
        v2 = dot(big[band:], w_ref[2])       # source y>0    -> out[:r-band]

    if not quant:
        bias = jnp.broadcast_to(b_ref[...].astype(jnp.float32), (r, cout))
        if noshift:
            return bias + v0 + v1 + v2
        zf = jnp.zeros((band, cout), v1.dtype)
        out = bias + v1
        out = out + jnp.concatenate([zf, v0], axis=0)
        return out + jnp.concatenate([v2, zf], axis=0)
    bias = b_ref[0:1].astype(jnp.float32)
    if b_ref.shape[0] == 4:
        # per-kernel-row dequant scales; fp32 combine order == xyrow/mirror
        s = b_ref[1:4].astype(jnp.float32)
        f1 = v1.astype(jnp.float32) * s[1:2]
        f0 = v0.astype(jnp.float32) * s[0:1]
        f2 = v2.astype(jnp.float32) * s[2:3]
        if noshift:
            return f1 + f0 + f2 + bias
        zf = jnp.zeros((band, cout), jnp.float32)
        out = f1 + jnp.concatenate([zf, f0], axis=0)
        out = out + jnp.concatenate([f2, zf], axis=0)
        return out + bias
    scale = b_ref[1:2].astype(jnp.float32)
    if noshift:
        return (v0 + v1 + v2).astype(jnp.float32) * scale + bias
    zi = jnp.zeros((band, cout), v1.dtype)
    out = v1 + jnp.concatenate([zi, v0], axis=0)
    out = out + jnp.concatenate([v2, zi], axis=0)
    return out.astype(jnp.float32) * scale + bias


def _conv3x3(x, w_ref, b_ref, masks, hw: int, n_minor: int = 1):
    """SAME 3x3 conv of flattened (R, Cin) rows via masked row shifts.

    w_ref: (9, Cin, Cout) ref (tap k = (ky, kx) row-major, dy=ky-1);
    b_ref: (1, Cout) fp32. fp32 accumulation on the MXU.

    Modes (all mathematically identical):
      'xy'     — separable shifting: 2 masked x-rolls on the INPUT build
                 u_dx[p] = x[p+dx], 9 matmuls produce the three kernel-row
                 partial sums v_dy, and 2 masked y-rolls on the OUTPUT
                 combine them (out[p] = sum_dy v_dy[p+dy*hw]); 4 VPU
                 roll+select passes per conv instead of 9.
      'xyrow'  — same shift structure as 'xy' but the 9 narrow matmuls
                 become 3 wide (R, 3Cin)x(3Cin, Cout) kernel-row matmuls
                 on a concat of the shifted inputs — the measured winner
                 (584 vs 564 img/s on v5e; MXU prefers fewer, wider ops).
      'xyband' — 'xyrow' over rows reordered (y, x, n) (``n_minor``
                 samples n-minor, x-rolls by n_minor): the y=+-1 edge
                 rows are then CONTIGUOUS, so the dy=+-1 matmuls run on
                 a static (R - hw*n_minor)-row slice and their outputs
                 re-align by zero-padded concat — (hw^2 + 2 hw(hw-1)) /
                 (3 hw^2) of xyrow's executed MXU flops (133/147 at 7x7)
                 and no y roll+select passes at all.
      'taps'   — 9 masked rolls, 9 accumulating matmuls.
      'im2col' — 9 masked rolls concatenated, ONE (R, 9*Cin) matmul.
    """
    r = x.shape[0]
    cout = w_ref.shape[-1]
    quant = jnp.dtype(x.dtype) == jnp.int8
    if _CONV_MODE == "xyband":
        return _conv3x3_xyband(x, w_ref, b_ref, masks, hw, n_minor)
    if quant:
        # int8 mode: spikes are EXACTLY {0, 1}, so int8 spike x int8
        # weight with int32 accumulation is exact on the activation side
        # — the only quantization error is the symmetric weight rounding.
        # b_ref arrives packed: row 0 = fp32 bias, then the dequant
        # scale rows — (2, Cout) for one per-cout scale, (4, Cout) for
        # per-kernel-row scales (_INT8_SCALES='row', the default). The
        # v5e MXU runs int8 at ~2x bf16 throughput.
        if _CONV_MODE not in ("xyrow", "xy"):
            raise NotImplementedError("int8 conv: 'xyrow'/'xy' modes only")
        xmask_m, xmask_p, ymask_m, ymask_p = masks
        noshift = _ABLATE in ("noshift", "matmul")
        if noshift:
            u_m = u_p = x  # roofline ablation: unshifted taps
        else:
            zero = jnp.zeros_like(x)
            u_m = jnp.where(xmask_m, _row_roll(x, -1), zero)
            u_p = jnp.where(xmask_p, _row_roll(x, 1), zero)
        if _CONV_MODE == "xyrow":
            big = jnp.concatenate([u_m, x, u_p], axis=-1)
            v = [
                jax.lax.dot_general(
                    big, w_ref[dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                for dy in range(3)
            ]
        else:
            # 'xy': 9 narrow int8 matmuls, no (R, 3Cin) concat copy —
            # candidate when the kernel is VPU-bound (int8 halves MXU
            # time; the concat materialization is pure VPU). int32 tap
            # sums are associative, so numerics are identical to xyrow.
            u = (u_m, x, u_p)
            v = []
            for dy in range(3):
                acc = None
                for dx in range(3):
                    d = jax.lax.dot_general(
                        u[dx], w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = d if acc is None else acc + d
                v.append(acc)
        bias = b_ref[0:1].astype(jnp.float32)
        if b_ref.shape[0] == 4:
            # per-kernel-row scales ('row' granularity): dequantize each
            # dy partial with its own scale, combine in fp32. int32->f32
            # casts are exact (|v| < 2^24) and the mirror replicates this
            # add order bit-for-bit.
            s = b_ref[1:4].astype(jnp.float32)
            f = [v[dy].astype(jnp.float32) * s[dy:dy + 1] for dy in range(3)]
            if noshift:  # roofline ablation: no y re-align
                return f[0] + f[1] + f[2] + bias
            out = f[1]
            zf = jnp.zeros_like(out)
            out = out + jnp.where(ymask_m, _row_roll(f[0], -hw), zf)
            out = out + jnp.where(ymask_p, _row_roll(f[2], hw), zf)
            return out + bias
        # single per-cout scale: combine in int32 (associative-exact),
        # one dequant at the end
        scale = b_ref[1:2].astype(jnp.float32)
        if noshift:  # roofline ablation: no y re-align
            out = v[0] + v[1] + v[2]
            return out.astype(jnp.float32) * scale + bias
        out = v[1]
        zi = jnp.zeros_like(out)
        out = out + jnp.where(ymask_m, _row_roll(v[0], -hw), zi)
        out = out + jnp.where(ymask_p, _row_roll(v[2], hw), zi)
        return out.astype(jnp.float32) * scale + bias
    bias = jnp.broadcast_to(b_ref[...].astype(jnp.float32), (r, cout))
    if _CONV_MODE in ("xy", "xyrow"):
        xmask_m, xmask_p, ymask_m, ymask_p = masks
        noshift = _ABLATE in ("noshift", "matmul")
        if noshift:
            u = {-1: x, 0: x, 1: x}  # roofline ablation: unshifted taps
        else:
            zero = jnp.zeros_like(x)
            u = {
                -1: jnp.where(xmask_m, _row_roll(x, -1), zero),
                0: x,
                1: jnp.where(xmask_p, _row_roll(x, 1), zero),
            }
        if _CONV_MODE == "xyrow":
            # kernel-row matmuls: one (R, 3Cin) x (3Cin, Cout) per dy —
            # 3 wide MXU ops instead of 9 narrow ones (weights arrive
            # pre-reshaped (3, 3Cin, Cout) from _extract_folded_weights)
            big = jnp.concatenate([u[-1], u[0], u[1]], axis=-1)
            v = [
                jnp.dot(big, w_ref[dy],
                        preferred_element_type=jnp.float32)
                for dy in range(3)
            ]
        else:
            v = []
            for dy in (-1, 0, 1):
                acc = None
                for dx in (-1, 0, 1):
                    d = jnp.dot(
                        u[dx], w_ref[(dy + 1) * 3 + (dx + 1)],
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
                v.append(acc)
        if noshift:  # roofline ablation: no y re-align
            return bias + v[0] + v[1] + v[2]
        out = bias + v[1]
        zf = jnp.zeros_like(v[1])
        out = out + jnp.where(ymask_m, _row_roll(v[0], -hw), zf)
        out = out + jnp.where(ymask_p, _row_roll(v[2], hw), zf)
        return out
    shifted = []
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        xs = _row_roll(x, dy * hw + dx)
        shifted.append(jnp.where(masks[k], xs, jnp.zeros_like(xs)))
    if _CONV_MODE == "im2col":
        xim = jnp.concatenate(shifted, axis=-1)
        w = w_ref[...].reshape(9 * w_ref.shape[1], cout)
        return bias + jnp.dot(xim, w, preferred_element_type=jnp.float32)
    acc = bias
    for k in range(9):
        acc = acc + jnp.dot(
            shifted[k], w_ref[k], preferred_element_type=jnp.float32
        )
    return acc


def _make_kernel(
    channels: Tuple[int, ...],
    num_classes: int,
    t_steps: int,
    hw: int,
    block_n: int,
    p: NeuronParams,
    dtype,
):
    n_l = len(channels)
    r = block_n * hw * hw

    n_sub = _INTERLEAVE if (block_n % _INTERLEAVE == 0 and _INTERLEAVE > 1) else 1
    r_sub = r // n_sub
    # 'xyband': rows ordered (y, x, n) per sub-tile with n_minor samples
    # n-minor (the host-side transpose in make_fused_denoise_apply)
    n_minor = block_n // n_sub

    def kernel(a1_ref, *refs):
        # refs layout: W_2, b_2, ..., W_{n_l}, b_{n_l}, W_f, b_f, out_ref
        w_refs = [refs[2 * i] for i in range(n_l - 1)]
        b_refs = [refs[2 * i + 1] for i in range(n_l - 1)]
        wf_ref, bf_ref = refs[2 * (n_l - 1)], refs[2 * (n_l - 1) + 1]
        out_ref = refs[2 * n_l]

        # Sub-tile interleaving: split the batch tile into n_sub independent halves
        # and emit their per-layer ops alternately, giving Mosaic's
        # scheduler independent MXU work (tile B's conv) to overlap with
        # VPU work (tile A's LIF/shifts) — the layer chain within one tile
        # is inherently serial.
        masks = _build_masks(r_sub, hw, n_minor=n_minor)
        a1_full = a1_ref[...].reshape(r, channels[0]).astype(jnp.float32)
        a1s = [a1_full[j * r_sub:(j + 1) * r_sub] for j in range(n_sub)]

        vs0 = tuple(
            tuple(
                jnp.full((r_sub, c), p.v_reset, jnp.float32)
                for c in channels
            )
            for _ in range(n_sub)
        )
        acc0 = tuple(
            jnp.zeros((r_sub, num_classes), jnp.float32)
            for _ in range(n_sub)
        )

        def body(_, carry):
            vs, acc = carry  # vs[j][l], acc[j]
            s1s, xs, new_vs = [], [], []
            for j in range(n_sub):
                v1, s1 = _lif_step(vs[j][0], a1s[j], p, dtype)
                new_vs.append([v1])
                s1s.append(s1)
                xs.append(s1)
            for i in range(1, n_l):
                for j in range(n_sub):
                    z = _conv3x3(xs[j], w_refs[i - 1], b_refs[i - 1],
                                 masks, hw, n_minor)
                    vi, xs[j] = _lif_step(vs[j][i], z, p, dtype)
                    new_vs[j].append(vi)
            # U-Net skip: cat(last, first) on channels (vq_diffusion.py:205)
            new_acc = []
            for j in range(n_sub):
                cat = jnp.concatenate([xs[j], s1s[j]], axis=-1)
                if jnp.dtype(dtype) == jnp.int8 and _INT8_LOGITS == "bf16":
                    # mixed precision: {0,1} spikes cast exactly to bf16;
                    # the fp _conv3x3 path then runs the bf16 logits conv
                    cat = cat.astype(jnp.bfloat16)
                new_acc.append(
                    acc[j] + _conv3x3(cat, wf_ref, bf_ref, masks, hw,
                                      n_minor)
                )
            return (
                tuple(tuple(v) for v in new_vs),
                tuple(new_acc),
            )

        if _UNROLL_T:
            carry = (vs0, acc0)
            for _ in range(t_steps):
                carry = body(0, carry)
            _, accs = carry
        elif _UNROLL_FACTOR > 1 and t_steps % _UNROLL_FACTOR == 0:
            def body_u(i, carry):
                for _ in range(_UNROLL_FACTOR):
                    carry = body(i, carry)
                return carry

            _, accs = jax.lax.fori_loop(
                0, t_steps // _UNROLL_FACTOR, body_u, (vs0, acc0)
            )
        else:
            _, accs = jax.lax.fori_loop(0, t_steps, body, (vs0, acc0))
        # firing-rate readout of the logits (vq_diffusion.py:206)
        acc = accs[0] if n_sub == 1 else jnp.concatenate(accs, axis=0)
        if _CONV_MODE == "xyband":
            # rows stay (sub, y, x, n)-ordered; the host side inverts
            out_ref[...] = acc / t_steps
        else:
            out_ref[...] = (acc / t_steps).reshape(
                block_n, hw * hw, num_classes)

    return kernel


def _extract_folded_weights(variables, n_blocks: int, dtype,
                            conv_mode: str | None = None):
    """Fold BN into convs and pull out (first-conv, per-block, final) weights.

    Returns (k1, b1, ws, bs, kf, bf): k1 flax (3,3,Cin,C1) fp32; ws/kf are
    (9, Cin, Cout) in the compute dtype; biases (1, Cout) fp32. The
    fold-and-walk itself is the shared
    :func:`snn.functional.folded_conv_params` (also used by the Lava
    netx exporter). All ops are jnp — safe to trace inside jit, so the
    folding can happen per call on traced variables.
    """
    blocks = folded_conv_params(variables, n_blocks + 1)
    k1, b1 = blocks[0]
    quant = jnp.dtype(dtype) == jnp.int8

    def shape_w(k):
        # 'xyrow' consumes per-kernel-row weights (3, 3*Cin, Cout) —
        # (kh, kw, cin, cout) row-major reshape groups (kw, cin) exactly
        # as the kernel's concat([u[-1], u[0], u[1]]) expects
        w = jnp.asarray(k, jnp.float32)
        if (conv_mode or _CONV_MODE) in ("xyrow", "xyband"):
            w = w.reshape(3, 3 * k.shape[2], k.shape[3])
        else:
            w = w.reshape(9, k.shape[2], k.shape[3])
        if not quant:
            return w.astype(dtype), None
        # symmetric per-output-channel int8: scale = max|w|/127, so the
        # rounded values span the full int8 range and the relative
        # rounding error is <= 0.5/127 of the channel max.
        # SD_INT8_CLIP_PCT (e.g. 99.9) switches to percentile scaling
        # with saturation — finer resolution for the weight bulk at the
        # cost of clipping outliers; the mirror shares this path, so
        # parity tests hold under either quantizer.
        aw = jnp.abs(w)
        if _INT8_SCALES == "row":
            # one scale per kernel-row dy: w is (3, 3Cin, Cout) in xyrow
            # or (9, Cin, Cout) tap-major elsewhere — reshape(3, ...)
            # groups by dy in both layouts (taps are dy-major)
            g = aw.reshape(3, -1, w.shape[-1])
            if _INT8_CLIP_PCT is not None:
                amax = jnp.percentile(g, _INT8_CLIP_PCT, axis=1)
            else:
                amax = jnp.max(g, axis=1)
            s = jnp.maximum(amax / 127.0, 1e-12)  # (3, Cout)
            s_full = jnp.repeat(s, w.shape[0] // 3, axis=0)[:, None, :]
            wq = jnp.clip(jnp.round(w / s_full), -127, 127).astype(jnp.int8)
            return wq, s
        if _INT8_CLIP_PCT is not None:
            amax = jnp.percentile(aw.reshape(-1, w.shape[-1]),
                                  _INT8_CLIP_PCT, axis=0)
        else:
            amax = jnp.max(aw, axis=(0, 1))
        s = jnp.maximum(amax / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return wq, s.reshape(1, -1)

    def pack_b(b, s):
        # int8 mode packs (bias, dequant-scale rows) as a (1+k, Cout)
        # operand (k=1 per-cout, k=3 per-row) so the kernel's (W, b) arg
        # pairing is dtype-agnostic
        b = jnp.asarray(b, jnp.float32).reshape(1, -1)
        return jnp.concatenate([b, s], axis=0) if s is not None else b

    ws, bs = [], []
    for k, b in blocks[1:-1]:
        w, s = shape_w(k)
        ws.append(w)
        bs.append(pack_b(b, s))
    kf, bf = blocks[-1]
    if quant and _INT8_LOGITS == "bf16":
        # mixed precision: logits conv stays bf16 (exact on the {0,1}
        # spike side); its (1, Cout) fp32 bias pack routes the kernel's
        # dtype-agnostic (W, b) pairing down the fp path
        w = jnp.asarray(kf, jnp.float32)
        if (conv_mode or _CONV_MODE) in ("xyrow", "xyband"):
            w = w.reshape(3, 3 * kf.shape[2], kf.shape[3])
        else:
            w = w.reshape(9, kf.shape[2], kf.shape[3])
        kf, sf = w.astype(jnp.bfloat16), None
    else:
        kf, sf = shape_w(kf)
    return (
        jnp.asarray(k1, jnp.float32),
        jnp.asarray(b1, jnp.float32),
        ws,
        bs,
        kf,
        pack_b(bf, sf),
    )


def _first_preactivation(x_tokens, t, k1, b1, hw: int):
    """Fused-BN first conv on the direct-coded (token, t) map — runs once,
    its output is the (constant-in-T) LIF-1 charge current."""
    x = x_tokens.astype(jnp.float32)[..., None]
    t_map = jnp.broadcast_to(t.astype(jnp.float32)[:, None, None, None], x.shape)
    xin = jnp.concatenate([x, t_map], axis=-1)
    a1 = jax.lax.conv_general_dilated(
        xin, k1, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1
    return a1.reshape(x_tokens.shape[0], hw * hw, k1.shape[-1])


def denoiser_cost(
    cfg: DiffusionConfig,
    n: int,
    itemsize: int = 2,
    block_n: int = None,
    useful_only: bool = False,
) -> Tuple[float, float]:
    """(flops, hbm bytes) of ONE fused denoiser forward at batch n.

    XLA's ``cost_analysis()`` does not see inside a Pallas custom call, so
    bench MFU/HBM-util use this static count: the in-kernel matmul flops
    (9 taps x T steps over every conv block, incl. the skip-concat final
    conv) plus the out-of-kernel first conv; bytes = the first-layer
    pre-activation in, logits out, and one pass of the weights.

    ``itemsize`` is the compute dtype's weight byte width (2 for the bf16
    default, 4 for fp32); the batch is counted PADDED to ``block_n`` tiles
    (the kernel really executes the pad rows). ``useful_only=True``
    discounts the masked SAME-padding taps the kernel executes as zero
    rows on the MXU: at hw x hw the model-useful fraction of the 9-tap
    work is sum_{dy,dx}(hw-|dy|)(hw-|dx|) / (9 hw^2) (~0.82 at 7x7) —
    hardware MFU counts all taps, useful-work MFU only these.
    """
    block_n = _BLOCK_N if block_n is None else block_n
    hw = cfg.latent_size
    hw2 = hw ** 2
    ch = tuple(cfg.denoiser_channels)
    k = cfg.num_embeddings
    n_pad = -(-n // block_n) * block_n
    r = n_pad * hw2
    tap = 1.0
    if useful_only:
        valid = sum(
            (hw - abs(dy)) * (hw - abs(dx))
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        )
        tap = valid / (9.0 * hw2)
    elif _CONV_MODE == "xyband":
        # hardware flops: 'xyband' really SKIPS the y-edge rows of the
        # dy=+-1 kernel-row matmuls (executed work, not just useful work)
        tap = (hw + 2.0 * (hw - 1)) / (3.0 * hw)
    flops = tap * 2.0 * r * 9 * 2 * ch[0]  # first conv (2 in-ch), once
    per_t = 0.0
    for i in range(1, len(ch)):
        per_t += 2.0 * r * 9 * ch[i - 1] * ch[i]
    per_t += 2.0 * r * 9 * (ch[-1] + ch[0]) * k
    flops += tap * per_t * cfg.num_steps
    w_elems = sum(9 * ch[i - 1] * ch[i] for i in range(1, len(ch)))
    w_elems += 9 * (ch[-1] + ch[0]) * k
    bytes_accessed = (
        r * ch[0] * 4.0 + r * k * 4.0 + w_elems * float(itemsize)
    )
    return flops, bytes_accessed


def make_fused_denoise_apply(
    cfg: DiffusionConfig,
    dtype=jnp.bfloat16,
    block_n: int = None,
    interpret: bool | None = None,
) -> Callable[[dict, jax.Array, jax.Array], jax.Array]:
    """Build apply_fn(variables, x_tokens (N,h,w) int, t (N,) int) ->
    (N,h,w,K) fp32 logits running the whole denoiser as one Pallas kernel
    per batch tile.

    ``variables`` are passed per call (and may be jit tracers) — BN
    folding is a handful of per-channel jnp ops traced into the same jit,
    so fresh weights are honored on every invocation.
    """
    if interpret is None:
        interpret = _INTERPRET
    if _ABLATE:
        import sys as _sys

        print(
            f"fused_denoiser: SD_FUSED_ABLATE={_ABLATE} — ROOFLINE MODE, "
            "output is numerically WRONG (benchmark only)",
            file=_sys.stderr, flush=True,
        )
    block_n = _BLOCK_N if block_n is None else block_n
    hw = cfg.latent_size
    channels = tuple(cfg.denoiser_channels)
    n_l = len(channels)
    num_classes = cfg.num_embeddings
    p = cfg.lif.to_params()
    t_steps = cfg.num_steps

    kernel = _make_kernel(channels, num_classes, t_steps, hw, block_n, p, dtype)

    # per-TILE cost; scaled by the grid size at call time (Mosaic passes
    # the estimate through unscaled) so cost_analysis of the compiled fn
    # reflects the whole megakernel, not one tile
    r = block_n * hw * hw
    flops_tile = 0
    for i in range(1, n_l):
        flops_tile += 2 * r * 9 * channels[i - 1] * channels[i]
    flops_tile += 2 * r * 9 * (channels[-1] + channels[0]) * num_classes
    flops_tile *= t_steps
    if _CONV_MODE == "xyband":
        # the dy=+-1 kernel-row matmuls run on (hw-1)/hw of the rows
        flops_tile = int(flops_tile * (hw + 2 * (hw - 1)) / (3 * hw))
    w_elems = sum(9 * channels[i - 1] * channels[i] for i in range(1, n_l))
    w_elems += 9 * (channels[-1] + channels[0]) * num_classes
    itemsize = jnp.dtype(dtype).itemsize
    bytes_tile = r * channels[0] * 4 + r * num_classes * 4 + w_elems * itemsize

    def denoise(variables, x_tokens: jax.Array, t: jax.Array) -> jax.Array:
        k1, b1, ws, bs, kf, bf = _extract_folded_weights(variables, n_l, dtype)
        weight_args = []
        for w, b in zip(ws, bs):
            weight_args.extend([w, b])
        weight_args.extend([kf, bf])

        n = x_tokens.shape[0]
        a1 = _first_preactivation(x_tokens, t, k1, b1, hw)
        n_pad = -n % block_n
        if n_pad:
            a1 = jnp.concatenate(
                [a1, jnp.zeros((n_pad,) + a1.shape[1:], a1.dtype)], axis=0
            )
        n_full = n + n_pad
        n_tiles = n_full // block_n
        cost = pl.CostEstimate(
            flops=int(flops_tile) * n_tiles,
            bytes_accessed=int(bytes_tile) * n_tiles,
            transcendentals=0,
        )
        xyband = _CONV_MODE == "xyband"
        hw2 = hw * hw
        if xyband:
            # host-side row reorder to (tile, sub, y, x, n_minor): one tiny
            # (N, 49, C1) transpose per denoiser call, amortized over the
            # whole T x layers loop inside the kernel (and fused by XLA
            # into the first-conv epilogue)
            n_sub = (_INTERLEAVE
                     if (block_n % _INTERLEAVE == 0 and _INTERLEAVE > 1)
                     else 1)
            n_minor = block_n // n_sub
            a1 = a1.reshape(
                n_tiles, n_sub, n_minor, hw2, channels[0]
            ).transpose(0, 1, 3, 2, 4).reshape(
                n_full * hw2, channels[0])
            in_specs = [
                pl.BlockSpec(
                    (block_n * hw2, channels[0]), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            out_spec = pl.BlockSpec(
                (block_n * hw2, num_classes), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(
                (n_full * hw2, num_classes), jnp.float32)
        else:
            in_specs = [
                pl.BlockSpec(
                    (block_n, hw2, channels[0]),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            out_spec = pl.BlockSpec(
                (block_n, hw2, num_classes),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(
                (n_full, hw2, num_classes), jnp.float32)
        for arg in weight_args:
            in_specs.append(
                pl.BlockSpec(
                    arg.shape,
                    functools.partial(lambda i, nd: (0,) * nd, nd=arg.ndim),
                    memory_space=pltpu.VMEM,
                )
            )
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            # larger tiles need more than Mosaic's default 16 MB scoped
            # VMEM budget; harmless for block_n=8 (fits either way)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ) if not interpret else None,
            interpret=interpret,
        )(a1, *weight_args)
        if xyband:
            out = out.reshape(
                n_tiles, n_sub, hw2, n_minor, num_classes
            ).transpose(0, 1, 3, 2, 4).reshape(n_full, hw2, num_classes)
        return out[:n].reshape(n, hw, hw, num_classes)

    return denoise


def make_fused_denoise_fn(
    variables,
    cfg: DiffusionConfig,
    dtype=jnp.bfloat16,
    block_n: int = None,
    interpret: bool | None = None,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """:func:`make_fused_denoise_apply` with ``variables`` bound — the
    (x_tokens, t) -> logits signature the diffusion sampler consumes."""
    apply_fn = make_fused_denoise_apply(cfg, dtype, block_n, interpret)
    return functools.partial(apply_fn, variables)


def mirror_denoise_fn(
    variables, cfg: DiffusionConfig, dtype=jnp.float32
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Pure-jnp mirror of the kernel's exact folded computation (the parity
    oracle for tests — same weights, same masked-shift conv formulation)."""
    hw = cfg.latent_size
    channels = tuple(cfg.denoiser_channels)
    n_l = len(channels)
    k1, b1, ws, bs, kf, bf = _extract_folded_weights(
        variables, n_l, dtype, conv_mode="taps"
    )
    p = cfg.lif.to_params()

    quant = jnp.dtype(dtype) == jnp.int8

    def conv(x, w, b, masks):
        # dispatch on the WEIGHT dtype (not the module mode): under
        # _INT8_LOGITS='bf16' mixed precision the final conv carries bf16
        # weights inside an otherwise-int8 model and takes the fp path
        if jnp.dtype(w.dtype) == jnp.int8:
            # exact int32 tap accumulation per kernel-row dy. Integer adds
            # are associative, so each dy-group sum matches the kernel's
            # v[dy] bit-for-bit; the dequant-and-combine below replicates
            # the kernel's fp32 op order exactly (center, top, bottom,
            # bias) so parity stays bitwise under per-row scales too.
            accs = []
            for dy in range(3):
                acc = None
                for dx in range(3):
                    k = dy * 3 + dx
                    xs = _row_roll(x, (dy - 1) * hw + (dx - 1))
                    xm = jnp.where(masks[k], xs, jnp.zeros_like(xs))
                    d = jax.lax.dot_general(
                        xm, w[k], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = d if acc is None else acc + d
                accs.append(acc)
            if b.shape[0] == 4:  # per-row scales
                out = accs[1].astype(jnp.float32) * b[2:3]
                out = out + accs[0].astype(jnp.float32) * b[1:2]
                out = out + accs[2].astype(jnp.float32) * b[3:4]
                return out + b[0:1]
            acc = (accs[0] + accs[1]) + accs[2]
            return acc.astype(jnp.float32) * b[1:2] + b[0:1]
        racc = jnp.broadcast_to(
            b.astype(jnp.float32), (x.shape[0], w.shape[2])
        )
        for k in range(9):
            dy, dx = k // 3 - 1, k % 3 - 1
            xs = _row_roll(x, dy * hw + dx)
            xm = jnp.where(masks[k], xs, jnp.zeros_like(xs))
            racc = racc + jnp.dot(
                xm, w[k], preferred_element_type=jnp.float32
            )
        return racc

    def denoise(x_tokens, t):
        n = x_tokens.shape[0]
        r = n * hw * hw
        masks = _build_masks(r, hw, mode="taps")
        a1 = _first_preactivation(x_tokens, t, k1, b1, hw)
        a1 = a1.reshape(r, channels[0]).astype(jnp.float32)
        vs = [jnp.full((r, c), p.v_reset, jnp.float32) for c in channels]
        acc = jnp.zeros((r, kf.shape[-1]), jnp.float32)
        for _ in range(cfg.num_steps):
            vs[0], s1 = _lif_step(vs[0], a1, p, dtype)
            x = s1
            for i in range(1, n_l):
                z = conv(x, ws[i - 1], bs[i - 1], masks)
                vs[i], x = _lif_step(vs[i], z, p, dtype)
            cat = jnp.concatenate([x, s1], axis=-1)
            if quant and jnp.dtype(kf.dtype) != jnp.int8:
                cat = cat.astype(kf.dtype)  # mixed-precision logits conv
            acc = acc + conv(cat, kf, bf, masks)
        out = acc / cfg.num_steps
        return out.reshape(n, hw, hw, kf.shape[-1])

    return denoise


def make_denoise_fn(
    variables,
    cfg: DiffusionConfig,
    apply_fn,
    fused="auto",
    dtype=jnp.float32,
    block_n: int = None,
    interpret: bool | None = None,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """The one place that picks the sampling backend.

    ``fused``: True | False | "auto" (megakernel on TPU only — a Pallas
    call with TPU compiler params cannot lower elsewhere). ``apply_fn`` is
    the layerwise fallback, ``apply_fn(variables, x_tokens, t,
    train=False)`` (e.g. ``SpikingDenoiser.apply`` or a TrainState's
    ``apply_fn``). Used by bench.py, the CLI eval sweep, the serving
    example, and ``train.stage2.sample_codes``.
    """
    use = fused is True or (
        fused == "auto" and jax.default_backend() == "tpu"
    )
    if use:
        return make_fused_denoise_fn(
            variables, cfg, dtype=dtype, block_n=block_n,
            interpret=interpret,
        )

    if jnp.dtype(dtype) != jnp.float32:
        import warnings

        warnings.warn(
            f"sampler dtype {jnp.dtype(dtype).name} requires the fused "
            "megakernel (TPU backend / fused on); the layerwise fallback "
            "runs fp32 — the dtype flag has no effect here.",
            stacklevel=2,
        )

    def denoise(x_tokens, t):
        return apply_fn(variables, x_tokens, t, train=False)

    return denoise
