"""Whole-denoiser megakernel parity.

Two-tier oracle chain (the torch-vs-cupy checker pattern, SURVEY.md §4):
  1. the Pallas kernel (interpret mode on CPU) vs a pure-jnp mirror of the
     IDENTICAL folded computation — tight tolerance;
  2. the mirror vs the real ``SpikingDenoiser`` eval path with trained
     (non-identity) BatchNorm statistics — BN-folding tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import SpikingDenoiser
from spiking_diffusion_tpu.ops import fused_denoiser


@pytest.fixture(autouse=True)
def interpret_mode():
    old = fused_denoiser._INTERPRET
    fused_denoiser._INTERPRET = True
    yield
    fused_denoiser._INTERPRET = old


CFG = DiffusionConfig(
    num_timesteps=6,
    latent_size=7,
    num_embeddings=10,
    mask_id=10,
    num_steps=4,
    denoiser_channels=(4, 8, 8, 8, 4),
)


def _trained_variables(cfg=CFG, seed=0, n_updates=3):
    """Init a denoiser and push a few train-mode batches through it so the
    BN running statistics are non-identity (exercises the folding).
    Everything jitted (CLAUDE.md: never run unjitted model code)."""
    model = SpikingDenoiser(cfg, backend="scan")
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.randint(key, (4, cfg.latent_size, cfg.latent_size), 0,
                            cfg.mask_id + 1, jnp.int32)
    t0 = jax.random.randint(key, (4,), 1, cfg.num_timesteps + 1)
    variables = jax.jit(
        lambda k, x, t: model.init(k, x, t, train=True)
    )(key, x0, t0)
    train_apply = jax.jit(
        lambda v, x, t: model.apply(v, x, t, train=True,
                                    mutable=["batch_stats"])
    )
    for i in range(n_updates):
        k = jax.random.PRNGKey(seed + 1 + i)
        xb = jax.random.randint(k, (4, cfg.latent_size, cfg.latent_size), 0,
                                cfg.mask_id + 1, jnp.int32)
        tb = jax.random.randint(k, (4,), 1, cfg.num_timesteps + 1)
        _, updated = train_apply(variables, xb, tb)
        variables = {**variables, "batch_stats": updated["batch_stats"]}
    return model, variables


def _batch(cfg=CFG, n=8, seed=42):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.randint(k1, (n, cfg.latent_size, cfg.latent_size), 0,
                           cfg.mask_id + 1, jnp.int32)
    t = jax.random.randint(k2, (n,), 1, cfg.num_timesteps + 1)
    return x, t


def test_kernel_matches_mirror():
    _, variables = _trained_variables()
    x, t = _batch(n=8)
    mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
    fused = fused_denoiser.make_fused_denoise_fn(
        variables, CFG, dtype=jnp.float32, block_n=4
    )
    ref = np.asarray(jax.jit(mirror)(x, t))
    out = np.asarray(jax.jit(fused)(x, t))
    assert out.shape == ref.shape == (8, 7, 7, 10)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_kernel_batch_padding():
    """N not a multiple of block_n: padded rows must not leak into outputs."""
    _, variables = _trained_variables(seed=3)
    x, t = _batch(n=6, seed=7)
    mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
    fused = fused_denoiser.make_fused_denoise_fn(
        variables, CFG, dtype=jnp.float32, block_n=4
    )
    np.testing.assert_allclose(
        np.asarray(jax.jit(fused)(x, t)), np.asarray(jax.jit(mirror)(x, t)),
        atol=1e-5, rtol=1e-5,
    )


def test_mirror_matches_real_denoiser():
    """The folded masked-shift formulation == the layerwise eval forward."""
    model, variables = _trained_variables(seed=1)
    x, t = _batch(n=8, seed=9)
    ref = np.asarray(
        jax.jit(lambda v, x, t: model.apply(v, x, t, train=False))(
            variables, x, t
        )
    )
    mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
    out = np.asarray(jax.jit(mirror)(x, t))
    # identical math up to BN-folding reassociation (one fp32 rounding per
    # channel scale); a knife-edge membrane could flip a spike, so allow a
    # loose absolute tolerance plus an exact-match majority check
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)
    close = np.isclose(out, ref, atol=1e-5, rtol=1e-5).mean()
    assert close > 0.99, f"only {close:.4f} of logits match tightly"


def test_kernel_under_jit_and_sampler():
    """The fused fn composes with jit and the lax.scan reverse sampler."""
    from spiking_diffusion_tpu.models import diffusion

    _, variables = _trained_variables(seed=2)
    fused = fused_denoiser.make_fused_denoise_fn(
        variables, CFG, dtype=jnp.float32, block_n=4
    )

    @jax.jit
    def gen(key):
        return diffusion.sample(key, fused, CFG, n_samples=5,
                                temperature=0.9)

    codes = np.asarray(gen(jax.random.PRNGKey(0)))
    assert codes.shape == (5, 7, 7)
    assert codes.min() >= 0 and codes.max() < CFG.mask_id + 1


def test_kernel_interleave_mode_matches_mirror():
    """The sub-tile-interleave experiment path stays parity-locked even
    though it is off by default (block_n=4 splits into two 2-sample
    halves)."""
    old = fused_denoiser._INTERLEAVE
    fused_denoiser._INTERLEAVE = 2
    try:
        _, variables = _trained_variables(seed=5)
        x, t = _batch(n=8, seed=11)
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.float32, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._INTERLEAVE = old


def test_kernel_xy_mode_matches_mirror():
    """'xy' (9 narrow per-tap matmuls; the round-2 default, superseded by
    'xyrow' after the round-3 on-hardware A/B) stays parity-locked to the
    mirror. The default-mode tests above cover 'xyband'."""
    old = fused_denoiser._CONV_MODE
    fused_denoiser._CONV_MODE = "xy"
    try:
        _, variables = _trained_variables(seed=6)
        x, t = _batch(n=8, seed=13)
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.float32, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._CONV_MODE = old


def test_kernel_xyrow_mode_matches_mirror():
    """'xyrow' (the round-3/4 default, superseded by 'xyband' after the
    round-5 on-hardware A/B: int8 834 -> 1101 img/s, bf16 593 -> 719)
    stays parity-locked as the masked-y fallback. The default-mode tests
    above now cover 'xyband' (incl. its host-side transpose round trip
    and the n=6 batch-padding case)."""
    old = fused_denoiser._CONV_MODE
    fused_denoiser._CONV_MODE = "xyrow"
    try:
        _, variables = _trained_variables(seed=8)
        for n, seed in ((8, 15), (6, 17)):
            x, t = _batch(n=n, seed=seed)
            mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
            fused = fused_denoiser.make_fused_denoise_fn(
                variables, CFG, dtype=jnp.float32, block_n=4
            )
            np.testing.assert_allclose(
                np.asarray(jax.jit(fused)(x, t)),
                np.asarray(jax.jit(mirror)(x, t)),
                atol=1e-5, rtol=1e-5,
            )
    finally:
        fused_denoiser._CONV_MODE = old


def test_kernel_xyband_interleave_matches_mirror():
    """xyband x sub-tile interleave: the (y, x, n) reorder happens per
    sub-tile (n_minor = block_n / n_sub), so the slice-and-realign must
    stay sample-local across the interleaved halves."""
    old_mode, old_il = fused_denoiser._CONV_MODE, fused_denoiser._INTERLEAVE
    fused_denoiser._CONV_MODE = "xyband"
    fused_denoiser._INTERLEAVE = 2
    try:
        _, variables = _trained_variables(seed=10)
        x, t = _batch(n=8, seed=19)
        mirror = fused_denoiser.mirror_denoise_fn(variables, CFG)
        fused = fused_denoiser.make_fused_denoise_fn(
            variables, CFG, dtype=jnp.float32, block_n=4
        )
        np.testing.assert_allclose(
            np.asarray(jax.jit(fused)(x, t)),
            np.asarray(jax.jit(mirror)(x, t)),
            atol=1e-5, rtol=1e-5,
        )
    finally:
        fused_denoiser._CONV_MODE = old_mode
        fused_denoiser._INTERLEAVE = old_il
