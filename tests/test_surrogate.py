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


# --- round-3: full family library + FD self-check harness -----------------

# families with a primitive, checked by the check_manual_grad-equivalent
# harness (``surrogate.py:53-89``); grid points sitting exactly on a
# piecewise boundary are where autograd picks one branch by convention,
# so tolerances are on the max error EXCLUDING a handful of kink points
_CHECKED = [
    surrogate.atan,
    surrogate.sigmoid,
    surrogate.piecewise_quadratic,
    surrogate.soft_sign,
    surrogate.erf,
    surrogate.leaky_k_relu,
    surrogate.piecewise_exp,
    surrogate.nonzero_sign_log_abs,
    surrogate.squarewave_fourier_series,
    surrogate.s2nn,
    surrogate.q_pseudo_spike,
    surrogate.log_tailed_relu,
]


@pytest.mark.parametrize("fn", _CHECKED, ids=lambda f: f.name)
def test_family_grad_matches_primitive_fd(fn):
    err, at = surrogate.check_surrogate_grad(fn)
    # piecewise families have one-sided derivatives at their kinks; the
    # grid (arange, step 1/256) lands exactly on 0.0 and +-1.0 where the
    # two branch conventions may differ by the branch value itself
    xs = jnp.asarray(np.arange(-2, 2, 4 / 1024, dtype=np.float32))
    auto = jax.vmap(jax.grad(fn.primitive))(xs)
    manual = fn.grad(xs)
    errv = np.abs(np.asarray(manual) - np.asarray(auto))
    kinks = np.isin(np.asarray(xs), [-1.0, 0.0, 1.0])
    assert float(errv[~kinks].max()) < 2e-4, (fn.name, err, at)


def test_piecewise_leaky_relu_known_upstream_factor2():
    """The reference's PiecewiseLeakyReLU backward uses 1/w inside the
    band while its own primitive has slope 1/(2w) (``surrogate.py:1028``
    vs ``:1140-1148``) — reproduce the backward (what training uses) and
    document the primitive gap exactly."""
    fn = surrogate.piecewise_leaky_relu  # w=1, c=0.01
    xs = jnp.asarray(np.arange(-2, 2, 4 / 1024, dtype=np.float32))
    auto = np.asarray(jax.vmap(jax.grad(fn.primitive))(xs))
    manual = np.asarray(fn.grad(xs))
    inside = np.abs(np.asarray(xs)) < 1.0
    np.testing.assert_allclose(manual[inside], 2.0 * auto[inside], rtol=1e-5)
    outside = np.abs(np.asarray(xs)) > 1.0
    np.testing.assert_allclose(manual[outside], auto[outside], rtol=1e-5)


def test_fake_numerical_gradient_formula():
    """min(sign(x)/x, alpha): parity with ``surrogate.py:1790-1792``
    (no primitive exists upstream either)."""
    fn = surrogate.fake_numerical_gradient
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.1, 2.0, 10.0])
    g = np.asarray(fn.grad(x))
    np.testing.assert_allclose(
        g, [0.3, 0.3, 0.3, 0.3, 0.3, 0.1], rtol=1e-6
    )
    with pytest.raises(ValueError):
        fn.primitive(x)


def test_two_param_families_through_spike_vjp():
    for fn in (surrogate.s2nn, surrogate.piecewise_leaky_relu,
               surrogate.leaky_k_relu, surrogate.squarewave_fourier_series):
        xs = jnp.linspace(-1.5, 1.5, 31)
        g = jax.vmap(jax.grad(lambda x, f=fn: f(x)))(xs)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(fn.grad(xs)), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(fn(xs)), np.asarray(xs) >= 0
        )


def test_get_surrogate_two_param_defaults():
    fn = surrogate.get_surrogate("s2nn", 4.0)
    assert fn.beta == 1.0
    fn2 = surrogate.get_surrogate("q_pseudo_spike", 3.0)
    assert fn2.beta is None
    g = fn2.grad(jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(g), [1.0])
