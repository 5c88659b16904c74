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


_GRADS: Dict[str, Callable[..., jax.Array]] = {
    "atan": atan_grad,
    "sigmoid": sigmoid_grad,
    "piecewise_quadratic": piecewise_quadratic_grad,
    "soft_sign": soft_sign_grad,
    "erf": erf_grad,
    "leaky_k_relu": leaky_k_relu_grad,
}

# One custom_vjp closure per (family, alpha); static config stays out of the
# traced signature so XLA sees a plain unary op.
_SPIKE_CACHE: Dict[Tuple[str, float], Callable[[jax.Array], jax.Array]] = {}


def spike_fn(x: jax.Array, name: str = "atan", alpha: float = 2.0) -> jax.Array:
    """Heaviside forward / surrogate backward spike.

    ``name`` and ``alpha`` are static (python) values.
    """
    key = (name, float(alpha))
    fn = _SPIKE_CACHE.get(key)
    if fn is None:
        grad_fn = _GRADS[name]
        a = float(alpha)

        @jax.custom_vjp
        def _f(v):
            return heaviside(v)

        def _f_fwd(v):
            return heaviside(v), v

        def _f_bwd(v, g):
            return (g * grad_fn(v, a),)

        _f.defvjp(_f_fwd, _f_bwd)
        fn = _f
        _SPIKE_CACHE[key] = fn
    return fn(x)


@dataclasses.dataclass(frozen=True)
class SurrogateFn:
    """A named surrogate family with its sharpness parameter.

    Hashable, so usable as a jit-static argument. ``__call__`` computes a
    spike with the surrogate gradient attached; ``grad`` exposes the raw
    derivative formula (used by the Pallas backward kernel).
    """

    name: str = "atan"
    alpha: float = 2.0

    def grad(self, x: jax.Array) -> jax.Array:
        return _GRADS[self.name](x, self.alpha)

    def __call__(self, x: jax.Array) -> jax.Array:
        return spike_fn(x, self.name, self.alpha)


# Convenience instances mirroring spikingjelly's default constructions.
atan = SurrogateFn("atan", 2.0)
sigmoid = SurrogateFn("sigmoid", 4.0)
piecewise_quadratic = SurrogateFn("piecewise_quadratic", 1.0)
soft_sign = SurrogateFn("soft_sign", 2.0)
erf = SurrogateFn("erf", 2.0)
leaky_k_relu = SurrogateFn("leaky_k_relu", 0.0)


def get_surrogate(name: str, alpha: float) -> SurrogateFn:
    if name not in _GRADS:
        raise ValueError(f"unknown surrogate {name!r}; have {sorted(_GRADS)}")
    return SurrogateFn(name, alpha)
