"""Surrogate-gradient spike functions as ``jax.custom_vjp``.

TPU-native equivalent of spikingjelly's surrogate library
(``spikingjelly/activation_based/surrogate.py``): the forward pass is the
exact Heaviside step; the backward pass substitutes a smooth derivative.
The reference additionally ships per-family CUDA code strings for its fused
kernels (``surrogate.py`` ``cuda_code``/``cuda_codes``) — here the same
formulas are plain jnp functions, reused verbatim inside the Pallas kernels
(:mod:`spiking_diffusion_tpu.ops.pallas_lif`), so there is one source of
truth for the gradient math.

Only ATan (alpha=2) is exercised by the Spiking-Diffusion models
(``snn_model/vae_model.py:37,113`` etc.), but the framework carries the
other families the reference library provides.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def heaviside(x: jax.Array) -> jax.Array:
    """Exact spike: 1 where x >= 0 else 0 (matches spikingjelly
    ``surrogate.heaviside``, which uses ``x >= 0``)."""
    return (x >= 0).astype(x.dtype)


# --- surrogate derivative formulas (pure, reused by Pallas kernels) -------


def atan_grad(x: jax.Array, alpha: float = 2.0) -> jax.Array:
    """d/dx of (1/pi) * arctan(pi/2 * alpha * x) + 1/2.

    Parity: spikingjelly ``surrogate.ATan`` backward
    ``alpha / 2 / (1 + (pi / 2 * alpha * x) ** 2)``.
    """
    u = (math.pi / 2.0) * alpha * x
    return (alpha / 2.0) / (1.0 + u * u)


def sigmoid_grad(x: jax.Array, alpha: float = 4.0) -> jax.Array:
    """Derivative of sigmoid(alpha*x): alpha * s * (1 - s)."""
    s = jax.nn.sigmoid(alpha * x)
    return alpha * s * (1.0 - s)


def piecewise_quadratic_grad(x: jax.Array, alpha: float = 1.0) -> jax.Array:
    """Triangle-shaped derivative: max(0, -alpha^2*|x| + alpha)."""
    return jnp.maximum(0.0, -(alpha * alpha) * jnp.abs(x) + alpha)


def soft_sign_grad(x: jax.Array, alpha: float = 2.0) -> jax.Array:
    """Derivative of the softsign surrogate: alpha / (2 * (1 + alpha|x|)^2)."""
    d = 1.0 + alpha * jnp.abs(x)
    return alpha / (2.0 * d * d)


def erf_grad(x: jax.Array, alpha: float = 2.0) -> jax.Array:
    """Derivative of the Gaussian-error-function surrogate."""
    return (alpha / math.sqrt(math.pi)) * jnp.exp(-((alpha * x) ** 2))


def leaky_k_relu_grad(
    x: jax.Array, alpha: float = 0.0, k: float = 1.0
) -> jax.Array:
    """Piecewise-linear derivative: k where x >= 0 else leak(=alpha)."""
    return jnp.where(x >= 0, k, alpha).astype(x.dtype)


def piecewise_exp_grad(x: jax.Array, alpha: float = 1.0) -> jax.Array:
    """(alpha/2) * exp(-alpha|x|) (``surrogate.py:310-311``)."""
    return (alpha / 2.0) * jnp.exp(-alpha * jnp.abs(x))


def nonzero_sign_log_abs_grad(x: jax.Array, alpha: float = 1.0) -> jax.Array:
    """1 / (1/alpha + |x|) (``surrogate.py:782-783``)."""
    return 1.0 / (1.0 / alpha + jnp.abs(x))


def piecewise_leaky_relu_grad(
    x: jax.Array, alpha: float = 1.0, beta: float = 0.01
) -> jax.Array:
    """1/w inside |x| < w(=alpha), c(=beta) outside
    (``surrogate.py:1028-1031``; note the reference's own primitive has
    slope 1/(2w) inside — a documented upstream inconsistency we
    reproduce on the gradient side, which is what training uses)."""
    w, c = alpha, beta
    return jnp.where(jnp.abs(x) < w, 1.0 / w, c).astype(x.dtype)


def squarewave_fourier_series_grad(
    x: jax.Array, alpha: float = 2.0, beta: float = 8.0
) -> jax.Array:
    """4/T * sum_{i=1}^{n-1} cos((2i-1) * 2pi/T * x), n=alpha, T=beta
    (``surrogate.py:1222-1231``)."""
    n, t_period = int(alpha), beta
    w = 2.0 * math.pi / t_period
    acc = jnp.zeros_like(x)
    for i in range(1, n):
        acc = acc + jnp.cos((2 * i - 1.0) * w * x)
    return acc * (4.0 / t_period)


def s2nn_grad(
    x: jax.Array, alpha: float = 4.0, beta: float = 1.0
) -> jax.Array:
    """alpha*sg*(1-sg) for x<0 else beta/(x+1) (``surrogate.py:1339-1343``,
    arXiv:2201.10879)."""
    sg = jax.nn.sigmoid(alpha * x)
    # guard the unselected branch: beta/(x+1) is inf/negative at x <= -1
    safe = jnp.where(x < 0.0, 0.0, x)
    return jnp.where(x < 0.0, alpha * sg * (1.0 - sg), beta / (safe + 1.0))


def q_pseudo_spike_grad(x: jax.Array, alpha: float = 2.0) -> jax.Array:
    """(1 + 2|x|/(alpha-1))^(-alpha) (``surrogate.py:1489-1496``,
    arXiv:2202.00282; alpha is the paper's q, > 1)."""
    return jnp.power(1.0 + 2.0 / (alpha - 1.0) * jnp.abs(x), -alpha)


def fake_numerical_gradient_grad(
    x: jax.Array, alpha: float = 0.3
) -> jax.Array:
    """min(sign(x)/x, alpha) with sign(0)=+1 (``surrogate.py:1790-1792``);
    inherently numerical — no primitive exists (upstream has none)."""
    sign = jnp.where(x >= 0.0, 1.0, -1.0)
    return jnp.minimum(sign / x, alpha)


def log_tailed_relu_grad(x: jax.Array, alpha: float = 0.0) -> jax.Array:
    """alpha for x<=0; 1 for 0<x<=1; 1/x beyond (``surrogate.py:1856-1862``,
    arXiv:1702.00953 half-wave Gaussian quantization)."""
    safe = jnp.maximum(x, 1.0)
    return jnp.where(x <= 0.0, alpha, jnp.where(x > 1.0, 1.0 / safe, 1.0))


_GRADS: Dict[str, Callable[..., jax.Array]] = {
    "atan": atan_grad,
    "sigmoid": sigmoid_grad,
    "piecewise_quadratic": piecewise_quadratic_grad,
    "soft_sign": soft_sign_grad,
    "erf": erf_grad,
    "leaky_k_relu": leaky_k_relu_grad,
    "piecewise_exp": piecewise_exp_grad,
    "nonzero_sign_log_abs": nonzero_sign_log_abs_grad,
    "piecewise_leaky_relu": piecewise_leaky_relu_grad,
    "squarewave_fourier_series": squarewave_fourier_series_grad,
    "s2nn": s2nn_grad,
    "q_pseudo_spike": q_pseudo_spike_grad,
    "fake_numerical_gradient": fake_numerical_gradient_grad,
    "log_tailed_relu": log_tailed_relu_grad,
}

# families whose gradient formula takes a second shape parameter
_TWO_PARAM = {
    "leaky_k_relu", "piecewise_leaky_relu", "squarewave_fourier_series",
    "s2nn",
}

# --- primitive functions (the smooth functions whose derivatives the
# backward formulas are; used by the finite-difference self-check harness
# and the reference's ``spiking=False`` mode) ------------------------------


def _sign01(x):
    return heaviside(x) * 2.0 - 1.0  # +1 for x >= 0 else -1


_PRIMS: Dict[str, Callable[..., jax.Array]] = {
    "atan": lambda x, a: jnp.arctan(math.pi / 2 * a * x) / math.pi + 0.5,
    "sigmoid": lambda x, a: jax.nn.sigmoid(a * x),
    "piecewise_quadratic": lambda x, a: (
        (x > 1.0 / a).astype(x.dtype)
        + (jnp.abs(x) <= 1.0 / a)
        * (-(a ** 2) / 2 * jnp.square(x) * jnp.sign(x) + a * x + 0.5)
    ),
    "soft_sign": lambda x, a: (jax.nn.soft_sign(a * x) + 1.0) / 2.0,
    "erf": lambda x, a: jax.scipy.special.erfc(-a * x) / 2.0,
    "leaky_k_relu": lambda x, leak, k: (
        jnp.where(x >= 0, k, leak) * x
    ),
    "piecewise_exp": lambda x, a: (
        heaviside(x) - _sign01(x) * jnp.exp(-_sign01(x) * x * a) / 2.0
    ),
    "nonzero_sign_log_abs": lambda x, a: (
        _sign01(x) * jnp.log(a * _sign01(x) * x + 1.0)
    ),
    # NOTE: upstream inconsistency reproduced faithfully — the reference's
    # primitive has slope 1/(2w) inside the band while its backward uses
    # 1/w (``surrogate.py:1028-1031`` vs ``:1140-1148``); the FD harness
    # documents the factor-2 gap for this family.
    "piecewise_leaky_relu": lambda x, w, c: (
        (x < -w) * (c * x + c * w)
        + (x > w) * (c * x - c * w + 1.0)
        + (jnp.abs(x) <= w) * (x / (2.0 * w) + 0.5)
    ),
    "squarewave_fourier_series": lambda x, n, t: (
        0.5 + (2.0 / math.pi) * sum(
            jnp.sin((2 * i - 1.0) * (2.0 * math.pi / t) * x) / (2 * i - 1.0)
            for i in range(1, int(n))
        )
    ),
    "s2nn": lambda x, a, b: jnp.where(
        x < 0.0,
        jax.nn.sigmoid(a * x),
        b * jnp.log(jnp.abs(jnp.where(x < 0.0, 0.0, x) + 1.0) + 1e-5) + 0.5,
    ),
    "q_pseudo_spike": lambda x, a: (
        heaviside(x) - _sign01(x) * 0.5
        * jnp.power(1.0 + 2.0 / (a - 1.0) * x * _sign01(x), 1.0 - a)
    ),
    "log_tailed_relu": lambda x, a: jnp.where(
        x > 1.0, jnp.log(jnp.maximum(x, 1.0)) + 1.0,
        jnp.where(x > 0.0, x, a * x),
    ),
    # fake_numerical_gradient: inherently numerical, no primitive (the
    # reference ships none either, ``surrogate.py:1808``)
}


# One custom_vjp closure per (family, params); static config stays out of
# the traced signature so XLA sees a plain unary op.
_SPIKE_CACHE: Dict[Tuple, Callable[[jax.Array], jax.Array]] = {}


def spike_fn(
    x: jax.Array,
    name: str = "atan",
    alpha: float = 2.0,
    beta: float | None = None,
) -> jax.Array:
    """Heaviside forward / surrogate backward spike.

    ``name``/``alpha``/``beta`` are static (python) values; ``beta`` is
    the second shape parameter of the two-parameter families
    (``_TWO_PARAM``: k / c / T_period / beta in reference naming).
    """
    key = (name, float(alpha), None if beta is None else float(beta))
    fn = _SPIKE_CACHE.get(key)
    if fn is None:
        grad_fn = _GRADS[name]
        a = float(alpha)
        args = (a,) if beta is None else (a, float(beta))

        @jax.custom_vjp
        def _f(v):
            return heaviside(v)

        def _f_fwd(v):
            return heaviside(v), v

        def _f_bwd(v, g):
            return (g * grad_fn(v, *args),)

        _f.defvjp(_f_fwd, _f_bwd)
        fn = _f
        _SPIKE_CACHE[key] = fn
    return fn(x)


@dataclasses.dataclass(frozen=True)
class SurrogateFn:
    """A named surrogate family with its shape parameter(s).

    Hashable, so usable as a jit-static argument. ``__call__`` computes a
    spike with the surrogate gradient attached; ``grad`` exposes the raw
    derivative formula (used by the Pallas backward kernel);
    ``primitive`` the smooth function it derives from (the reference's
    ``spiking=False`` mode, and the FD self-check oracle).
    """

    name: str = "atan"
    alpha: float = 2.0
    beta: float | None = None

    def _args(self) -> Tuple[float, ...]:
        return (self.alpha,) if self.beta is None else (self.alpha, self.beta)

    def grad(self, x: jax.Array) -> jax.Array:
        return _GRADS[self.name](x, *self._args())

    def primitive(self, x: jax.Array) -> jax.Array:
        if self.name not in _PRIMS:
            raise ValueError(
                f"{self.name} has no primitive (numerical-only family)"
            )
        return _PRIMS[self.name](x, *self._args())

    def __call__(self, x: jax.Array) -> jax.Array:
        return spike_fn(x, self.name, self.alpha, self.beta)


# Convenience instances mirroring spikingjelly's default constructions.
atan = SurrogateFn("atan", 2.0)
sigmoid = SurrogateFn("sigmoid", 4.0)
piecewise_quadratic = SurrogateFn("piecewise_quadratic", 1.0)
soft_sign = SurrogateFn("soft_sign", 2.0)
erf = SurrogateFn("erf", 2.0)
leaky_k_relu = SurrogateFn("leaky_k_relu", 0.0, 1.0)  # (leak, k)
piecewise_exp = SurrogateFn("piecewise_exp", 1.0)
nonzero_sign_log_abs = SurrogateFn("nonzero_sign_log_abs", 1.0)
piecewise_leaky_relu = SurrogateFn("piecewise_leaky_relu", 1.0, 0.01)  # (w, c)
squarewave_fourier_series = SurrogateFn(
    "squarewave_fourier_series", 2.0, 8.0
)  # (n, T_period)
s2nn = SurrogateFn("s2nn", 4.0, 1.0)  # (alpha, beta)
q_pseudo_spike = SurrogateFn("q_pseudo_spike", 2.0)
fake_numerical_gradient = SurrogateFn("fake_numerical_gradient", 0.3)
log_tailed_relu = SurrogateFn("log_tailed_relu", 0.0)


def get_surrogate(
    name: str, alpha: float, beta: float | None = None
) -> SurrogateFn:
    if name not in _GRADS:
        raise ValueError(f"unknown surrogate {name!r}; have {sorted(_GRADS)}")
    if beta is None and name in _TWO_PARAM:
        # fall back to the family's reference default second parameter
        beta = {
            "leaky_k_relu": 1.0, "piecewise_leaky_relu": 0.01,
            "squarewave_fourier_series": 8.0, "s2nn": 1.0,
        }[name]
    return SurrogateFn(name, alpha, beta)


def check_surrogate_grad(
    fn: SurrogateFn,
    lo: float = -2.0,
    hi: float = 2.0,
    n: int = 1024,
) -> Tuple[float, float]:
    """Numerical self-check of a surrogate's hand-written gradient against
    autograd through its primitive function on a dense grid — the
    reference's ``check_manual_grad`` (``surrogate.py:53-89``, which uses
    ``torch.arange(-2, 2, 32/8192)``, the same 1024-point grid).

    Returns (max abs error, x at which it occurs). The caller asserts.
    """
    xs = jnp.asarray(np.arange(lo, hi, (hi - lo) / n, dtype=np.float32))
    auto = jax.vmap(jax.grad(fn.primitive))(xs)
    manual = fn.grad(xs)
    err = jnp.abs(manual - auto)
    idx = int(jnp.argmax(err))
    return float(err[idx]), float(xs[idx])
