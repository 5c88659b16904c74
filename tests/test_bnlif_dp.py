"""Data-parallel shard_map train step for the 'bnlif' denoiser backend.

The bnlif Pallas kernel is opaque to GSPMD, so its DP path is explicit:
shard_map body + SyncBN (pmean-ed statistics) + pmean-ed grads, with the
corruption randomness drawn on the global batch outside the shard_map
(train/stage2.make_train_step_diffusion_dp). These tests assert the whole
construction equals the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import SpikingDenoiser
from spiking_diffusion_tpu.ops import bn_lif
from spiking_diffusion_tpu.parallel import make_mesh, replicate, shard_batch
from spiking_diffusion_tpu.train.stage2 import (
    make_train_step_diffusion,
    make_train_step_diffusion_dp,
)
from spiking_diffusion_tpu.train.state import create_train_state

bn_lif._INTERPRET = True  # CPU

CFG = DiffusionConfig(
    num_timesteps=8, denoiser_channels=(6, 10), num_embeddings=12,
    mask_id=12, num_steps=4,
)


def _init_state(model):
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (16, 7, 7), 0, CFG.num_embeddings, jnp.int32)
    t0 = jnp.ones((16,), jnp.int32)
    variables = jax.jit(
        lambda k, x, t: model.init(k, x, t, train=True)
    )(key, x, t0)
    return x, create_train_state(model, variables)


def test_dp_bnlif_step_matches_single_device():
    x, _ = _init_state(SpikingDenoiser(CFG, backend="bnlif"))
    key = jax.random.PRNGKey(7)

    # single-device fused step
    single = SpikingDenoiser(CFG, backend="bnlif")
    _, s1 = _init_state(single)
    step1 = make_train_step_diffusion(CFG, donate=False)
    s1b, m1 = step1(s1, x, key)

    # 8-device shard_map step (SyncBN)
    mesh = make_mesh(8)
    dp = SpikingDenoiser(CFG, backend="bnlif", bn_axis_name="data")
    _, s8 = _init_state(dp)
    s8 = replicate(s8, mesh)
    step8 = make_train_step_diffusion_dp(CFG, mesh, donate=False)
    s8b, m8 = step8(s8, shard_batch(x, mesh), key)

    # identical corruption draws -> loss equal up to reduction order
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )

    # reference gradient (for the signal-aware tolerance below: leaves
    # with a mathematically-zero gradient — conv bias before BN — hold
    # only float noise, which Adam normalizes to +-lr regardless)
    from spiking_diffusion_tpu.models import diffusion

    def lf(p):
        def denoise(xt, tt):
            logits, _ = single.apply(
                {"params": p, "batch_stats": s1.batch_stats},
                xt, tt, train=True, mutable=["batch_stats"],
            )
            return logits

        return diffusion.train_loss(key, denoise, x, CFG)

    g1 = jax.jit(jax.grad(lf))(s1.params)

    # updated params and batch_stats agree leafwise
    for a, b, g in zip(
        jax.tree.leaves(s1b.params),
        jax.tree.leaves(s8b.params),
        jax.tree.leaves(g1),
    ):
        signal = float(np.max(np.abs(np.asarray(g))))
        atol = 1e-5 if signal > 1e-5 else 5e-3
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=atol
        )
    for a, b in zip(
        jax.tree.leaves(s1b.batch_stats), jax.tree.leaves(s8b.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dp_bnlif_trainer_end_to_end():
    from spiking_diffusion_tpu.train.stage2 import train_diffusion

    indices = np.random.RandomState(0).randint(
        0, CFG.num_embeddings, size=(32, 7, 7)
    ).astype(np.int32)
    dp = SpikingDenoiser(CFG, backend="bnlif", bn_axis_name="data")
    state = train_diffusion(
        dp, CFG, indices, epochs=1, batch_size=16, log_fn=None,
        data_parallel=8,
    )
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dp_bnlif_axis_name_mismatch_raises():
    import pytest

    from spiking_diffusion_tpu.train.stage2 import train_diffusion

    indices = np.zeros((16, 7, 7), np.int32)
    dp = SpikingDenoiser(CFG, backend="bnlif", bn_axis_name="wrong")
    with pytest.raises(ValueError, match="bn_axis_name"):
        train_diffusion(
            dp, CFG, indices, epochs=1, batch_size=16, log_fn=None,
            data_parallel=8,
        )
