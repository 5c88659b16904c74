"""Surrogate-gradient correctness.

Mirrors the reference's de-facto checks (``surrogate.check_manual_grad``,
``spikingjelly/activation_based/surrogate.py:53-89``): the backward formula
must equal the analytic derivative of the surrogate primitive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.snn import surrogate


def test_heaviside_forward():
    x = jnp.array([-1.0, -1e-6, 0.0, 1e-6, 2.0])
    np.testing.assert_array_equal(
        np.asarray(surrogate.heaviside(x)), [0.0, 0.0, 1.0, 1.0, 1.0]
    )


def test_spike_forward_is_heaviside():
    x = jnp.linspace(-2, 2, 33)
    s = surrogate.spike_fn(x, "atan", 2.0)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(x) >= 0)


def test_atan_backward_matches_primitive_derivative():
    # primitive: (1/pi) * arctan(pi/2 * alpha * x) + 1/2
    alpha = 2.0
    xs = jnp.linspace(-3, 3, 101)

    def primitive(x):
        return (1 / jnp.pi) * jnp.arctan(jnp.pi / 2 * alpha * x) + 0.5

    analytic = jax.vmap(jax.grad(primitive))(xs)
    ours = surrogate.atan_grad(xs, alpha)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(analytic), rtol=1e-6)


def test_atan_vjp_through_spike():
    alpha = 2.0
    xs = jnp.linspace(-2, 2, 41)
    g = jax.vmap(jax.grad(lambda x: surrogate.spike_fn(x, "atan", alpha)))(xs)
    expected = surrogate.atan_grad(xs, alpha)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-6)


def test_atan_grad_value_at_zero():
    # alpha/2 at x=0 (reference formula alpha/2 / (1 + (pi/2 alpha x)^2))
    assert float(surrogate.atan_grad(jnp.array(0.0), 2.0)) == pytest.approx(1.0)


@pytest.mark.parametrize(
    "name,alpha",
    [
        ("sigmoid", 4.0),
        ("piecewise_quadratic", 1.0),
        ("soft_sign", 2.0),
        ("erf", 2.0),
    ],
)
def test_other_families_forward_and_grad_shapes(name, alpha):
    xs = jnp.linspace(-2, 2, 17)
    s = surrogate.spike_fn(xs, name, alpha)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(xs) >= 0)
    g = jax.vmap(jax.grad(lambda x: surrogate.spike_fn(x, name, alpha)))(xs)
    assert np.all(np.isfinite(np.asarray(g)))
    # all surrogate derivatives are non-negative and peak at 0
    assert np.all(np.asarray(g) >= 0)


def test_sigmoid_backward_matches_primitive():
    alpha = 4.0
    xs = jnp.linspace(-2, 2, 21)
    analytic = jax.vmap(jax.grad(lambda x: jax.nn.sigmoid(alpha * x)))(xs)
    ours = surrogate.sigmoid_grad(xs, alpha)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(analytic), rtol=1e-5)


def test_get_surrogate_unknown():
    with pytest.raises(ValueError):
        surrogate.get_surrogate("nope", 1.0)
