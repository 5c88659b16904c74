"""Model-level tests: shapes, spike domains, jitted train/eval paths.

All model applies are wrapped in jit — eager JAX on the 1-core test CPU is
orders of magnitude slower than the compiled path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import ANNVQVAE, SNNVQVAE, SpikingDenoiser

CFG = VQVAEConfig(num_steps=4, embedding_dim=8, num_embeddings=16)
DCFG = DiffusionConfig(
    num_timesteps=49, latent_size=7, num_embeddings=16, mask_id=16,
    num_steps=4, denoiser_channels=(8, 12, 16, 20, 12),
)


@pytest.fixture(scope="module")
def vqvae():
    model = SNNVQVAE(CFG, backend="scan")
    img = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    return model, variables


def test_vqvae_train_outputs(vqvae):
    model, variables = vqvae
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1)) - 0.5

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=True, data_variance=0.1,
                           mutable=["batch_stats"])

    out, mutated = fwd(variables, img)
    assert out["recon"].shape == (2, 28, 28, 1)
    assert np.isfinite(float(out["vq_loss"]))
    assert np.isfinite(float(out["real_recon_loss"]))
    # recon_loss is variance-normalized
    np.testing.assert_allclose(
        float(out["recon_loss"]), float(out["real_recon_loss"]) / 0.1, rtol=1e-5
    )
    # recon is tanh-bounded
    assert float(jnp.abs(out["recon"]).max()) <= 1.0
    assert "batch_stats" in mutated


def test_vqvae_eval_outputs(vqvae):
    model, variables = vqvae
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 28, 28, 1)) - 0.5

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, img)
    assert out["indices"].shape == (2 * 7 * 7,)
    assert out["recon"].shape == (2, 28, 28, 1)
    assert out["spikes"].shape == (CFG.num_steps, 2, 7, 7, CFG.embedding_dim)
    vals = set(np.unique(np.asarray(out["spikes"])))
    assert vals <= {0.0, 1.0}


def test_vqvae_encode_decode_indices_roundtrip(vqvae):
    model, variables = vqvae
    img = jax.random.uniform(jax.random.PRNGKey(3), (2, 28, 28, 1)) - 0.5

    @jax.jit
    def enc(v, x):
        return model.apply(v, x, method="encode_indices")

    @jax.jit
    def dec(v, idx):
        return model.apply(v, idx, method="decode_indices")

    idx = enc(variables, img)
    assert idx.shape == (2, 7, 7)
    assert idx.dtype == jnp.int32 or idx.dtype == jnp.int64
    assert int(idx.max()) < CFG.num_embeddings
    recon = dec(variables, idx)
    assert recon.shape == (2, 28, 28, 1)
    # decode of the eval-path indices == eval-path recon
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, img)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(out["recon"]), atol=1e-5
    )


def test_denoiser_shapes():
    model = SpikingDenoiser(DCFG, backend="scan")
    x = jnp.zeros((2, 7, 7), jnp.int32)
    t = jnp.ones((2,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, train=True)

    @jax.jit
    def fwd(v, x, t):
        return model.apply(v, x, t, train=False)

    logits = fwd(variables, x, t)
    assert logits.shape == (2, 7, 7, DCFG.num_embeddings)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_denoiser_uses_timestep():
    model = SpikingDenoiser(DCFG, backend="scan")
    x = jnp.zeros((2, 7, 7), jnp.int32)
    t1 = jnp.ones((2,), jnp.int32)
    t2 = jnp.full((2,), 40, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t1, train=True)
    fwd = jax.jit(lambda v, x, t: model.apply(v, x, t, train=False))
    l1 = np.asarray(fwd(variables, x, t1))
    l2 = np.asarray(fwd(variables, x, t2))
    assert not np.allclose(l1, l2)


def test_ann_vqvae_paths():
    model = ANNVQVAE(CFG)
    img = jax.random.uniform(jax.random.PRNGKey(4), (2, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    out = jax.jit(
        lambda v, x: model.apply(v, x, train=True, data_variance=0.5)
    )(variables, img)
    assert out["recon"].shape == (2, 28, 28, 1)
    assert np.isfinite(float(out["vq_loss"]))
    ev = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, img)
    assert ev["indices"].shape == (2 * 7 * 7,)
    idx = jax.jit(lambda v, x: model.apply(v, x, method="encode_indices"))(
        variables, img
    )
    assert idx.shape == (2, 7, 7)
