"""SNN-VAE baseline tests: shapes, binary latents, loss finiteness,
scheduled sampling, ancestral generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import SNNVAEConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVAE

CFG = SNNVAEConfig(latent_dim=8, k=4, num_steps=4)
VCFG = VQVAEConfig(num_steps=4, embedding_dim=16)


@pytest.fixture(scope="module")
def model_and_vars():
    model = SNNVAE(CFG, vq_cfg=VCFG, backend="scan")
    img = jnp.zeros((2, 28, 28, 1))
    variables = model.init(
        jax.random.PRNGKey(0), img, jax.random.PRNGKey(1), train=True
    )
    return model, variables


def test_train_forward(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 28, 28, 1)) - 0.5

    @jax.jit
    def fwd(v, x, k):
        return model.apply(v, x, k, train=True, p_scheduled=0.2,
                           mutable=["batch_stats"])

    out, _ = fwd(variables, img, jax.random.PRNGKey(3))
    assert out["recon"].shape == (2, 28, 28, 1)
    assert np.isfinite(float(out["recon_loss"]))
    assert np.isfinite(float(out["mmd_loss"]))
    assert float(out["mmd_loss"]) >= 0
    # latents are binary spikes
    z = np.asarray(out["z"])
    assert z.shape == (CFG.num_steps, 2, CFG.latent_dim)
    assert set(np.unique(z)) <= {0.0, 1.0}


def test_eval_forward(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.uniform(jax.random.PRNGKey(4), (2, 28, 28, 1)) - 0.5
    out = jax.jit(
        lambda v, x, k: model.apply(v, x, k, train=False)
    )(variables, img, jax.random.PRNGKey(5))
    assert out["recon"].shape == (2, 28, 28, 1)
    assert float(jnp.abs(out["recon"]).max()) <= 1.0


def test_sample(model_and_vars):
    model, variables = model_and_vars

    @jax.jit
    def sample(v, k):
        return model.apply(v, k, 3, method="sample")

    x, z = sample(variables, jax.random.PRNGKey(6))
    assert x.shape == (3, 28, 28, 1)
    z = np.asarray(z)
    assert z.shape == (CFG.num_steps, 3, CFG.latent_dim)
    assert set(np.unique(z)) <= {0.0, 1.0}
    assert np.isfinite(np.asarray(x)).all()


def test_gradients_flow(model_and_vars):
    model, variables = model_and_vars
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, 28, 28, 1)) - 0.5

    @jax.jit
    def loss_fn(params, bs, x, k):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, k, train=True,
            p_scheduled=0.0, mutable=["batch_stats"],
        )
        return out["recon_loss"] + out["mmd_loss"]

    g = jax.grad(loss_fn)(
        variables["params"], variables.get("batch_stats", {}), img,
        jax.random.PRNGKey(8),
    )
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
    # encoder must receive gradient (through posterior sampling gather)
    enc_g = sum(
        float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["encoder"])
    )
    assert enc_g > 0


def test_scheduled_sampling_changes_prior():
    # Drive PriorBernoulli directly. A fresh init rarely fires (weights too
    # small to reach threshold), so boost the params to guarantee spiking,
    # then check that p=1 (self-sampling at t>=5) diverges from p=0.
    from spiking_diffusion_tpu.models.snn_vae import PriorBernoulli

    cfg = SNNVAEConfig(latent_dim=8, k=4, num_steps=10)
    prior = PriorBernoulli(cfg)
    z = jnp.ones((cfg.num_steps, 2, cfg.latent_dim), jnp.float32)
    variables = prior.init(jax.random.PRNGKey(0), z, jax.random.PRNGKey(1),
                           0.0, True)
    boosted = jax.tree.map(lambda x: x * 5.0, variables["params"])
    f = jax.jit(lambda p_sched: prior.apply(
        {"params": boosted}, z, jax.random.PRNGKey(2), p_sched, True))
    a = np.asarray(f(0.0))
    b = np.asarray(f(1.0))
    # boosted weights on all-ones z must fire somewhere
    assert a.sum() > 0
    # with p=1 the prior's own (different) samples feed t>=5
    assert (a != b).any()
    # and steps < 5 are identical (scheduled sampling starts at t=5,
    # so outputs diverge at t>=6 at the earliest)
    np.testing.assert_array_equal(a[:5], b[:5])
