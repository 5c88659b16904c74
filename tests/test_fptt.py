"""FPTT online training + chunked scan tests."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn import functional as F
from spiking_diffusion_tpu.snn.fptt import fptt_online_training
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_step


def _cell_apply(params, state, x_t):
    """Linear -> LIF -> Linear readout cell."""
    h = x_t @ params["w1"] + params["b1"]
    v, s = lif_step(state, h, NeuronParams())
    y = s @ params["w2"]
    return v, y


def test_fptt_reduces_loss():
    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(4, 8).astype(np.float32) * 0.5),
        "b1": jnp.zeros(8),
        "w2": jnp.asarray(rng.randn(8, 2).astype(np.float32) * 0.5),
    }
    T, N = 12, 8
    x_seq = jnp.asarray(rng.rand(T, N, 4).astype(np.float32) * 2)
    tgt = jnp.asarray(rng.rand(T, N, 2).astype(np.float32))
    state0 = jnp.zeros((N, 8))

    f_loss = lambda y, t: jnp.mean((y - t) ** 2)
    run = jax.jit(lambda p: fptt_online_training(
        _cell_apply, p, state0, x_seq, tgt, f_loss, lr=0.05, alpha=0.5
    ))
    p1, losses = run(params)
    # params changed and remain finite
    assert not np.allclose(np.asarray(p1["w1"]), np.asarray(params["w1"]))
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(p1))
    # repeated epochs over the same data reduce the mean step loss
    p = params
    first = float(losses.mean())
    for _ in range(10):
        p, losses = run(p)
    assert float(losses.mean()) < first


def test_chunked_scan_matches_plain_scan():
    p = NeuronParams()

    def step(v, x):
        return lif_step(v, x, p)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 3, (8, 3, 5)).astype(np.float32))
    v0 = jnp.zeros((3, 5))
    v_ref, s_ref = jax.lax.scan(step, v0, x)
    v_c, s_c = F.chunked_scan(step, v0, x, chunk=4)
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_ref), atol=1e-6)


def test_chunked_scan_gradient_matches():
    p = NeuronParams()

    def step(v, x):
        return lif_step(v, x, p)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-1, 3, (8, 2, 4)).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 2, 4).astype(np.float32))
    v0 = jnp.zeros((2, 4))

    def loss_plain(x):
        _, s = jax.lax.scan(step, v0, x)
        return jnp.sum(s * w)

    def loss_chunked(x):
        _, s = F.chunked_scan(step, v0, x, chunk=2)
        return jnp.sum(s * w)

    g1 = jax.grad(loss_plain)(x)
    g2 = jax.grad(loss_chunked)(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)


def test_chunked_scan_rejects_bad_chunk():
    import pytest

    def step(v, x):
        return v, x

    with pytest.raises(ValueError):
        F.chunked_scan(step, jnp.zeros(3), jnp.zeros((7, 3)), chunk=2)
