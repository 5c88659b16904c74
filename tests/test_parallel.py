"""Data-parallel training on the 8-device virtual CPU mesh.

Validates: replicated params + batch-sharded inputs produce the same
numerics as single-device, and the trainer's data_parallel option works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.parallel import make_mesh, replicate, shard_batch
from spiking_diffusion_tpu.train import (
    create_train_state,
    make_train_step_vqvae,
    train_vqvae,
)

CFG = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                  enc_channels=(4, 8), dec_channels=(8, 4))


def test_make_mesh():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_dp_step_matches_single_device():
    model = SNNVQVAE(CFG, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(1), img[:2], train=True)

    # single device
    s1 = create_train_state(model, variables)
    step = make_train_step_vqvae(0.1, donate=False)
    s1b, m1 = step(s1, img)

    # 8-device mesh
    mesh = make_mesh(8)
    s8 = create_train_state(model, variables)
    s8 = replicate(s8, mesh)
    sharded = shard_batch(img, mesh)
    s8b, m8 = step(s8, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )

    # gradients must agree tightly between single-device and sharded
    def loss_fn(params, bs, images):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, images, train=True,
            data_variance=0.1, mutable=["batch_stats"],
        )
        return out["vq_loss"] + out["recon_loss"]

    g1 = jax.grad(loss_fn)(s1.params, s1.batch_stats, img)
    g8 = jax.grad(loss_fn)(s8.params, s8.batch_stats, sharded)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

    # updated params: tight where the gradient carries signal. Leaves with
    # a mathematically-zero gradient (e.g. a conv bias directly before
    # BatchNorm — mean subtraction kills constant shifts) only hold float
    # noise, which Adam's g/sqrt(g^2) normalization amplifies to +-lr
    # regardless of noise magnitude; those get a lr-scale tolerance.
    for a, b, g in zip(
        jax.tree.leaves(s1b.params),
        jax.tree.leaves(s8b.params),
        jax.tree.leaves(g1),
    ):
        signal = float(np.max(np.abs(np.asarray(g))))
        atol = 1e-6 if signal > 1e-6 else 5e-3
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=atol
        )


def test_train_vqvae_data_parallel():
    from spiking_diffusion_tpu.data import synthetic_dataset

    ds = synthetic_dataset("MNIST", n_train=32, n_test=8)
    model = SNNVQVAE(CFG, backend="scan")
    state = train_vqvae(
        model, ds.train_images, 0.1, epochs=1, batch_size=16,
        log_fn=None, data_parallel=8,
    )
    assert int(state.step) == 2
    # params came back finite on all leaves
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_diffusion_data_parallel():
    from spiking_diffusion_tpu.config import DiffusionConfig
    from spiking_diffusion_tpu.models import SpikingDenoiser
    from spiking_diffusion_tpu.train.stage2 import train_diffusion

    dcfg = DiffusionConfig(num_embeddings=8, mask_id=8, num_steps=2,
                           denoiser_channels=(4, 4, 4, 4, 4))
    indices = np.random.RandomState(0).randint(0, 8, (32, 7, 7)).astype(np.int32)
    den = SpikingDenoiser(dcfg, backend="scan")
    state = train_diffusion(den, dcfg, indices, epochs=1, batch_size=16,
                            log_fn=None, data_parallel=8)
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_vqvae_rejects_bad_batch_split():
    from spiking_diffusion_tpu.data import synthetic_dataset

    ds = synthetic_dataset("MNIST", n_train=32, n_test=8)
    model = SNNVQVAE(CFG, backend="scan")
    with pytest.raises(ValueError):
        train_vqvae(model, ds.train_images, 0.1, epochs=1, batch_size=9,
                    log_fn=None, data_parallel=8)


def test_sample_codes_data_parallel():
    from spiking_diffusion_tpu.config import DiffusionConfig
    from spiking_diffusion_tpu.models import SpikingDenoiser
    from spiking_diffusion_tpu.train import create_train_state
    from spiking_diffusion_tpu.train.stage2 import sample_codes

    dcfg = DiffusionConfig(num_embeddings=8, mask_id=8, num_steps=2,
                           denoiser_channels=(4, 4, 4, 4, 4))
    den = SpikingDenoiser(dcfg, backend="scan")
    x0 = jnp.zeros((2, 7, 7), jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    variables = den.init(jax.random.PRNGKey(0), x0, t0, train=True)
    state = create_train_state(den, variables)
    codes = sample_codes(state, dcfg, jax.random.PRNGKey(1), n_samples=16,
                         temperature=0.8, data_parallel=8)
    arr = np.asarray(codes)
    assert arr.shape == (16, 7, 7)
    assert (arr == dcfg.mask_id).sum() == 0
    with pytest.raises(ValueError):
        sample_codes(state, dcfg, jax.random.PRNGKey(1), n_samples=9,
                     data_parallel=8)


def test_sample_codes_data_parallel_fused():
    """Megakernel sampling under shard_map: per-device Pallas kernels on
    local batch shards (a Pallas custom call is opaque to GSPMD, so the
    fused DP path uses shard_map — see train/stage2.sample_codes)."""
    from spiking_diffusion_tpu.config import DiffusionConfig
    from spiking_diffusion_tpu.models import SpikingDenoiser
    from spiking_diffusion_tpu.ops import fused_denoiser
    from spiking_diffusion_tpu.train import create_train_state
    from spiking_diffusion_tpu.train.stage2 import sample_codes

    old = fused_denoiser._INTERPRET
    fused_denoiser._INTERPRET = True
    try:
        dcfg = DiffusionConfig(num_timesteps=4, num_embeddings=8, mask_id=8,
                               num_steps=2, denoiser_channels=(4, 4, 4, 4, 4))
        den = SpikingDenoiser(dcfg, backend="scan")
        x0 = jnp.zeros((2, 7, 7), jnp.int32)
        t0 = jnp.ones((2,), jnp.int32)
        variables = den.init(jax.random.PRNGKey(0), x0, t0, train=True)
        state = create_train_state(den, variables)
        codes = sample_codes(state, dcfg, jax.random.PRNGKey(1),
                             n_samples=16, temperature=0.8, data_parallel=8,
                             fused=True)
        arr = np.asarray(codes)
        assert arr.shape == (16, 7, 7)
        assert (arr == dcfg.mask_id).sum() == 0
        # per-device RNG folding: shards draw different samples
        assert not np.array_equal(arr[:2], arr[2:4])
    finally:
        fused_denoiser._INTERPRET = old


def test_sample_codes_data_parallel_fused_int8():
    """int8 megakernel under shard_map DP: the quantized sampler composes
    with the per-device Pallas path (fused_dtype=jnp.int8)."""
    from spiking_diffusion_tpu.config import DiffusionConfig
    from spiking_diffusion_tpu.models import SpikingDenoiser
    from spiking_diffusion_tpu.ops import fused_denoiser
    from spiking_diffusion_tpu.train import create_train_state
    from spiking_diffusion_tpu.train.stage2 import sample_codes

    old = fused_denoiser._INTERPRET
    fused_denoiser._INTERPRET = True
    try:
        dcfg = DiffusionConfig(num_timesteps=4, num_embeddings=8, mask_id=8,
                               num_steps=2, denoiser_channels=(4, 4, 4, 4, 4))
        den = SpikingDenoiser(dcfg, backend="scan")
        x0 = jnp.zeros((2, 7, 7), jnp.int32)
        t0 = jnp.ones((2,), jnp.int32)
        variables = den.init(jax.random.PRNGKey(0), x0, t0, train=True)
        state = create_train_state(den, variables)
        codes = sample_codes(state, dcfg, jax.random.PRNGKey(1),
                             n_samples=16, temperature=0.8, data_parallel=8,
                             fused=True, fused_dtype=jnp.int8)
        arr = np.asarray(codes)
        assert arr.shape == (16, 7, 7)
        assert (arr == dcfg.mask_id).sum() == 0
    finally:
        fused_denoiser._INTERPRET = old
