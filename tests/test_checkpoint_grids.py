"""Checkpoint save/restore round-trip + image-grid rendering."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.train import create_train_state, make_train_step_vqvae
from spiking_diffusion_tpu.train.checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from spiking_diffusion_tpu.utils import save_image_grid, save_recon_grid

CFG = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                  enc_channels=(4, 8), dec_channels=(8, 4))


def _make_state():
    model = SNNVQVAE(CFG, backend="scan")
    img = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    return model, create_train_state(model, variables)


def test_checkpoint_roundtrip(tmp_path):
    model, state = _make_state()
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1)) - 0.5
    step = make_train_step_vqvae(0.1, donate=False)
    state, _ = step(state, img)  # advance so step=1 and opt_state nonzero

    path = save_checkpoint(state, str(tmp_path), "model")
    assert checkpoint_exists(str(tmp_path), "model")

    _, fresh = _make_state()
    restored = restore_checkpoint(fresh, str(tmp_path), "model")
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state trains onward
    state2, m = step(restored, img)
    assert int(state2.step) == 2
    assert np.isfinite(float(m["loss"]))


def test_save_image_grid(tmp_path):
    imgs = np.random.RandomState(0).rand(32, 28, 28, 1).astype(np.float32) - 0.5
    p = save_image_grid(imgs, str(tmp_path / "grid.png"))
    assert os.path.exists(p)
    from PIL import Image

    im = Image.open(p)
    assert im.size[0] > 28 * 8 and im.size[1] > 28 * 4


def test_save_recon_grid(tmp_path):
    ori = np.random.RandomState(1).rand(16, 28, 28, 1).astype(np.float32) - 0.5
    rec = ori + 0.05
    p = save_recon_grid(ori, rec, str(tmp_path / "recon.png"))
    assert os.path.exists(p)
