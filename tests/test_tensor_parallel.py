"""2-D (data x model) mesh training: numerics == single device.

Extends the DP validation (tests/test_parallel.py) with output-channel
tensor parallelism composed with batch sharding, on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser
from spiking_diffusion_tpu.parallel.tp import (
    make_mesh_2d,
    shard_batch_2d,
    shard_state_tp,
    shard_variables_tp,
)
from spiking_diffusion_tpu.train import create_train_state, make_train_step_vqvae
from spiking_diffusion_tpu.train.stage2 import make_train_step_diffusion

CFG = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                  enc_channels=(8, 8), dec_channels=(8, 8))


def test_make_mesh_2d():
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh_2d(100, 100)


def test_shard_variables_rules():
    mesh = make_mesh_2d(2, 4)
    model = SNNVQVAE(CFG, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(0), (4, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(1), img, train=True)
    sharded = shard_variables_tp(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    n_model_sharded = 0
    for path, leaf in flat:
        spec = leaf.sharding.spec
        if any(p == "model" for p in spec):
            n_model_sharded += 1
            dim = list(spec).index("model")
            assert leaf.shape[dim] % 4 == 0
    assert n_model_sharded > 0, "no leaf got model-sharded"


def test_tp_vqvae_step_matches_single_device():
    model = SNNVQVAE(CFG, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(0), (8, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(1), img[:2], train=True)
    step = make_train_step_vqvae(0.1, donate=False)

    s1 = create_train_state(model, variables)
    s1b, m1 = step(s1, img)

    mesh = make_mesh_2d(2, 4)
    s2 = shard_state_tp(create_train_state(model, variables), mesh)
    s2b, m2 = step(s2, shard_batch_2d(img, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1b.params), jax.tree.leaves(s2b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-3
        )


def test_tp_diffusion_step_matches_single_device():
    dcfg = DiffusionConfig(num_timesteps=4, num_embeddings=8, mask_id=8,
                           num_steps=2, denoiser_channels=(8, 16, 8))
    den = SpikingDenoiser(dcfg, backend="scan")
    x0 = jax.random.randint(jax.random.PRNGKey(0), (8, 7, 7), 0, 8, jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    variables = den.init(jax.random.PRNGKey(1), x0[:2], t0, train=True)
    step = make_train_step_diffusion(dcfg, donate=False)
    key = jax.random.PRNGKey(5)

    s1 = create_train_state(den, variables)
    s1b, m1 = step(s1, x0, key)

    mesh = make_mesh_2d(2, 4)
    s2 = shard_state_tp(create_train_state(den, variables), mesh)
    s2b, m2 = step(s2, shard_batch_2d(x0, mesh), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1b.params), jax.tree.leaves(s2b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-3
        )
