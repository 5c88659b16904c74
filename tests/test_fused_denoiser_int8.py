"""int8 megakernel mode parity.

Spikes are exactly {0, 1}, so int8 spike x int8 weight with int32
accumulation is exact on the activation side; the only approximation is
the symmetric weight rounding (default granularity: one scale per
kernel-row dy and output channel — 0.75x the rounding error of a single
per-cout scale on the r3 flagship weights, scripts/analyze_int8_quant.py).
Oracle chain:
  1. Pallas int8 kernel (interpret on CPU) vs the jnp int8 mirror — the
     per-dy integer tap sums are associative-exact and the mirror
     replicates the kernel's fp32 dequant-combine order, so this is TIGHT;
  2. int8 mirror vs fp32 mirror — quantization tolerance (loose) plus an
     argmax-agreement check (what the categorical sampler consumes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.ops import fused_denoiser

from tests.test_fused_denoiser import CFG, _batch, _trained_variables


@pytest.fixture(autouse=True)
def interpret_mode():
    old = fused_denoiser._INTERPRET
    fused_denoiser._INTERPRET = True
    yield
    fused_denoiser._INTERPRET = old


def test_int8_kernel_matches_int8_mirror():
    _, variables = _trained_variables()
    x, t = _batch(n=8)
    mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                              dtype=jnp.int8)
    fused = fused_denoiser.make_fused_denoise_fn(
        variables, CFG, dtype=jnp.int8, block_n=4
    )
    ref = np.asarray(jax.jit(mirror)(x, t))
    out = np.asarray(jax.jit(fused)(x, t))
    assert out.shape == ref.shape == (8, 7, 7, 10)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_int8_kernel_batch_padding():
    _, variables = _trained_variables(seed=3)
    x, t = _batch(n=6, seed=7)
    mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                              dtype=jnp.int8)
    fused = fused_denoiser.make_fused_denoise_fn(
        variables, CFG, dtype=jnp.int8, block_n=4
    )
    np.testing.assert_allclose(
        np.asarray(jax.jit(fused)(x, t)), np.asarray(jax.jit(mirror)(x, t)),
        atol=1e-5, rtol=1e-5,
    )


def test_int8_xy_mode_matches_mirror():
    """'xy' int8 variant (9 narrow matmuls, no concat copy): int32 tap
    sums are associative, so it must equal the taps-mode mirror exactly."""
    _, variables = _trained_variables(seed=2)
    x, t = _batch(n=8, seed=9)
    old = fused_denoiser._CONV_MODE
    fused_denoiser._CONV_MODE = "xy"
    try:
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                                  dtype=jnp.int8)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.int8, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._CONV_MODE = old


def test_int8_clip_quantizer_parity():
    """Percentile-clipped quantizer (SD_INT8_CLIP_PCT): kernel and mirror
    share the quantization path, so exact parity must hold under it."""
    _, variables = _trained_variables(seed=4)
    x, t = _batch(n=8, seed=13)
    old = fused_denoiser._INT8_CLIP_PCT
    fused_denoiser._INT8_CLIP_PCT = 99.0
    try:
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                                  dtype=jnp.int8)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.int8, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._INT8_CLIP_PCT = old


def test_int8_bf16_logits_parity():
    """Mixed precision (SD_INT8_LOGITS=bf16): inner convs int8, logits
    conv bf16. Kernel vs mirror — the shared int8 inner path is exact, so
    only the bf16 final matmul's accumulation order separates them
    (bf16-level tolerance); and the knob must actually change the output
    vs the fully-int8 model."""
    _, variables = _trained_variables(seed=9)
    x, t = _batch(n=8, seed=21)
    old = fused_denoiser._INT8_LOGITS
    fused_denoiser._INT8_LOGITS = "bf16"
    try:
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                                  dtype=jnp.int8)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.int8, block_n=4
        )
        out = np.asarray(jax.jit(fused)(x, t))
        ref = np.asarray(jax.jit(mirror)(x, t))
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    finally:
        fused_denoiser._INT8_LOGITS = old
    full_int8 = np.asarray(jax.jit(fused_denoiser.mirror_denoise_fn(
        variables, CFG, dtype=jnp.int8))(x, t))
    assert not np.allclose(ref, full_int8, atol=1e-7), \
        "bf16-logits mode did not change the output"


def test_int8_cout_scales_parity():
    """Legacy per-cout scale granularity (SD_INT8_SCALES=cout): the
    (2, Cout) pack takes the int32-combine-then-dequant kernel path —
    exact parity must hold there too."""
    _, variables = _trained_variables(seed=6)
    x, t = _batch(n=8, seed=17)
    old = fused_denoiser._INT8_SCALES
    fused_denoiser._INT8_SCALES = "cout"
    try:
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                                  dtype=jnp.int8)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.int8, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._INT8_SCALES = old


def test_int8_row_scales_reduce_weight_error():
    """The default 'row' granularity must never be worse than 'cout' on
    the actual folded weights (it refines the same scale axis)."""
    _, variables = _trained_variables(seed=8)
    n_l = len(CFG.denoiser_channels)
    old = fused_denoiser._INT8_SCALES
    errs = {}
    for mode in ("row", "cout"):
        fused_denoiser._INT8_SCALES = mode
        try:
            _, _, ws, bs, kf, bf = fused_denoiser._extract_folded_weights(
                variables, n_l, jnp.int8, conv_mode="taps"
            )
            _, _, wf, bf32, kf32, bff = fused_denoiser._extract_folded_weights(
                variables, n_l, jnp.float32, conv_mode="taps"
            )
        finally:
            fused_denoiser._INT8_SCALES = old
        tot = 0.0
        for wq, b, w in zip(ws + [kf], bs + [bf], wf + [kf32]):
            s = np.asarray(b)[1:]  # (1|3, Cout)
            s_full = np.repeat(s, 9 // s.shape[0], axis=0)[:, None, :]
            deq = np.asarray(wq, np.float32) * s_full
            w = np.asarray(w, np.float32)
            tot += float(np.linalg.norm(deq - w) / np.linalg.norm(w))
        errs[mode] = tot
    assert errs["row"] <= errs["cout"] * (1 + 1e-6), errs


def test_int8_mirror_tracks_fp32_mirror():
    _, variables = _trained_variables(seed=5)
    x, t = _batch(n=8, seed=11)
    m32 = fused_denoiser.mirror_denoise_fn(variables, CFG)
    m8 = fused_denoiser.mirror_denoise_fn(variables, CFG, dtype=jnp.int8)
    y32 = np.asarray(jax.jit(m32)(x, t))
    y8 = np.asarray(jax.jit(m8)(x, t))
    # weight-rounding tolerance: logits within a small absolute band of
    # the fp32 path (spike trains can themselves flip near threshold, so
    # this is distributional, not elementwise-tight)
    scale = np.abs(y32).max()
    close = np.mean(np.abs(y8 - y32) <= 0.1 * scale + 0.05)
    assert close > 0.95, f"only {close:.3f} of logits within band"
    # argmax agreement — what greedy decoding would consume
    agree = np.mean(y8.argmax(-1) == y32.argmax(-1))
    assert agree > 0.9, f"argmax agreement {agree:.3f}"


def test_int8_xyrow_mode_matches_mirror():
    """int8 'xyrow' (masked-y fallback; the pre-r5 default) stays
    parity-locked. The default-mode int8 tests above now cover 'xyband',
    whose sliced rows contribute literal +0.0 exactly like the masked
    zero rows they replace (same fp32 dequant-combine order)."""
    _, variables = _trained_variables(seed=4)
    x, t = _batch(n=8, seed=21)
    old = fused_denoiser._CONV_MODE
    fused_denoiser._CONV_MODE = "xyrow"
    try:
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG,
                                                  dtype=jnp.int8)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.int8, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._CONV_MODE = old
