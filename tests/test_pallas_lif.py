"""Fused Pallas LIF kernel vs the lax.scan oracle: forward + VJP parity.

This reprises the reference's torch-vs-cupy backend checker
(``spikingjelly/activation_based/neuron_kernel.py:1264-1311``) with the
scan path as the oracle. On the CPU test host the kernel runs in Pallas
interpret mode; the same code compiles through Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.ops import pallas_lif
from spiking_diffusion_tpu.snn import NeuronParams, lif_scan
from spiking_diffusion_tpu.snn.surrogate import get_surrogate


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pallas_lif._INTERPRET
    pallas_lif._INTERPRET = True
    yield
    pallas_lif._INTERPRET = old


PARAM_GRID = [
    NeuronParams(),  # app default: tau=2, hard reset, decay_input, atan
    NeuronParams(hard_reset=False),
    NeuronParams(decay_input=False),
    NeuronParams(detach_reset=True),
    NeuronParams(tau=4.0, v_threshold=0.7, v_reset=0.1),
    NeuronParams(surrogate=get_surrogate("sigmoid", 4.0)),
]


def _rand_x(shape, seed=0, lo=-1.0, hi=3.0):
    rng = np.random.RandomState(seed)
    # keep membranes away from exact-threshold ties (fwd equality is exact
    # only when no h lands on the knife edge in float)
    x = rng.uniform(lo, hi, size=shape).astype(np.float32)
    return jnp.asarray(x)


@pytest.mark.parametrize("p", PARAM_GRID)
def test_forward_parity(p):
    x = _rand_x((5, 3, 41), seed=1)  # 123 features: exercises padding
    s_ref, v_ref = lif_scan(x, params=p)
    s = pallas_lif.lif_fused(x, params=p)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))


def test_forward_parity_large_padded():
    # feature count not a multiple of 128 nor 1024
    x = _rand_x((4, 7, 150), seed=2)
    s_ref, _ = lif_scan(x)
    s = pallas_lif.lif_fused(x)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))


def test_forward_with_v_init():
    x = _rand_x((4, 2, 8), seed=3)
    v0 = jnp.asarray(np.random.RandomState(4).uniform(0, 0.9, (2, 8)).astype(np.float32))
    s_ref, _ = lif_scan(x, v_init=v0)
    s = pallas_lif.lif_fused(x, v_init=v0)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))


@pytest.mark.parametrize("p", PARAM_GRID)
def test_vjp_parity(p):
    x = _rand_x((5, 2, 17), seed=5)
    w = jnp.asarray(np.random.RandomState(6).randn(5, 2, 17).astype(np.float32))

    def loss_scan(x):
        s, _ = lif_scan(x, params=p)
        return jnp.sum(s * w)

    def loss_fused(x):
        s = pallas_lif.lif_fused(x, params=p)
        return jnp.sum(s * w)

    g_ref = jax.grad(loss_scan)(x)
    g = jax.grad(loss_fused)(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6
    )


def test_vjp_v_init_gradient():
    p = NeuronParams()
    x = _rand_x((3, 1, 9), seed=7)
    v0 = jnp.asarray(np.random.RandomState(8).uniform(0, 0.5, (1, 9)).astype(np.float32))

    def loss_scan(v0):
        s, _ = lif_scan(x, v_init=v0, params=p)
        return jnp.sum(s * (1 + jnp.arange(3.0)[:, None, None]))

    def loss_fused(v0):
        s2d = pallas_lif._lif_fused_2d(x.reshape(3, 9), v0.reshape(9), p)
        return jnp.sum(
            s2d.reshape(3, 1, 9) * (1 + jnp.arange(3.0)[:, None, None])
        )

    g_ref = jax.grad(loss_scan)(v0)
    g = jax.grad(loss_fused)(v0).reshape(v0.shape)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_fused_inside_jit():
    p = NeuronParams()
    x = _rand_x((4, 2, 130), seed=9)

    @jax.jit
    def f(x):
        return pallas_lif.lif_fused(x, params=p).sum()

    assert np.isfinite(float(f(x)))
