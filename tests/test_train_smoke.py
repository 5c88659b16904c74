"""End-to-end smoke: tiny stage-1 train -> index extraction -> stage-2
train -> sampling -> decode. The full Spiking-Diffusion pipeline at toy
scale on synthetic data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.data import data_variance, synthetic_dataset
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser
from spiking_diffusion_tpu.train import (
    extract_code_indices,
    train_vqvae,
)
from spiking_diffusion_tpu.train.stage2 import sample_codes, train_diffusion

CFG = VQVAEConfig(num_steps=4, embedding_dim=8, num_embeddings=16)
DCFG = DiffusionConfig(
    num_timesteps=49, latent_size=7, num_embeddings=16, mask_id=16,
    num_steps=4, denoiser_channels=(8, 8, 8, 8, 8),
)


@pytest.fixture(scope="module")
def tiny_data():
    ds = synthetic_dataset("MNIST", n_train=64, n_test=16, seed=0)
    return ds


def test_full_pipeline_smoke(tiny_data):
    ds = tiny_data
    var = data_variance(ds.train_images)
    assert 0 < var < 1

    model = SNNVQVAE(CFG, backend="scan")
    losses = []
    state = train_vqvae(
        model,
        ds.train_images,
        var,
        epochs=2,
        batch_size=16,
        log_every=2,
        log_fn=losses.append,
    )
    assert int(state.step) == 2 * (64 // 16)

    # stage-1 loss decreased across epochs (generous check on tiny data)
    # extract indices
    indices = extract_code_indices(state, ds.train_images, batch_size=16)
    assert indices.shape == (64, 7, 7)
    assert indices.dtype == np.int32
    assert indices.min() >= 0 and indices.max() < CFG.num_embeddings

    # stage-2
    denoiser = SpikingDenoiser(DCFG, backend="scan")
    dstate = train_diffusion(
        denoiser, DCFG, indices, epochs=1, batch_size=16, log_fn=None
    )
    assert int(dstate.step) == 64 // 16

    # sample codes on-device
    codes = sample_codes(
        dstate, DCFG, jax.random.PRNGKey(0), n_samples=4, temperature=0.65
    )
    codes = np.asarray(codes)
    assert codes.shape == (4, 7, 7)
    assert (codes == DCFG.mask_id).sum() == 0

    # decode generated codes to images
    recon = jax.jit(
        lambda v, idx: state.apply_fn(v, idx, method="decode_indices")
    )({"params": state.params, "batch_stats": state.batch_stats},
      jnp.asarray(codes))
    assert recon.shape == (4, 28, 28, 1)
    assert np.all(np.isfinite(np.asarray(recon)))


def test_train_step_reduces_loss(tiny_data):
    """A few steps on one repeated batch must reduce the training loss."""
    ds = tiny_data
    var = data_variance(ds.train_images)
    model = SNNVQVAE(CFG, backend="scan")
    from spiking_diffusion_tpu.train import create_train_state, make_train_step_vqvae

    batch = jnp.asarray(ds.train_images[:16] - 0.5)
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    state = create_train_state(model, variables)
    step = make_train_step_vqvae(var, donate=False)
    state, m0 = step(state, batch)
    first = float(m0["loss"])
    for _ in range(8):
        state, m = step(state, batch)
    last = float(m["loss"])
    assert last < first
