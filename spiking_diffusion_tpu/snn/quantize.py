"""Straight-through quantization ops — spikingjelly ``quantize.py`` parity.

STE round/ceil/floor/clamp and k-bit quantization as ``jax.custom_vjp``
with identity (or clipped-identity) gradients
(``spikingjelly/activation_based/quantize.py:5-262``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ste_unary(fwd_fn):
    @jax.custom_vjp
    def f(x):
        return fwd_fn(x)

    def fwd(x):
        return fwd_fn(x), None

    def bwd(_, g):
        return (g,)

    f.defvjp(fwd, bwd)
    return f


round_ste = _ste_unary(jnp.round)
ceil_ste = _ste_unary(jnp.ceil)
floor_ste = _ste_unary(jnp.floor)


@jax.custom_vjp
def clamp_ste(x, lo, hi):
    return jnp.clip(x, lo, hi)


def _clamp_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), (x, lo, hi)


def _clamp_bwd(res, g):
    x, lo, hi = res
    # gradient passes only inside the clamp window (clipped-identity)
    mask = ((x >= lo) & (x <= hi)).astype(g.dtype)
    return g * mask, None, None


clamp_ste.defvjp(_clamp_fwd, _clamp_bwd)


def k_bit_quantize(x: jax.Array, k: int) -> jax.Array:
    """Quantize x in [0, 1] to 2^k - 1 levels with an STE gradient
    (``quantize.py`` k_bit_quantize)."""
    levels = float(2**k - 1)
    return round_ste(x * levels) / levels


def affine_quantize(x: jax.Array, k: int, lo: float, hi: float) -> jax.Array:
    """Quantize x in [lo, hi] to k bits: normalize, quantize, denormalize."""
    xn = (clamp_ste(x, lo, hi) - lo) / (hi - lo)
    return k_bit_quantize(xn, k) * (hi - lo) + lo
