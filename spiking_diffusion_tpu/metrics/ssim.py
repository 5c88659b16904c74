"""Structural similarity (SSIM) with a Gaussian window.

Parity target: ``metric/pytorch_ssim/__init__.py`` — window 11,
sigma 1.5, depthwise conv, C1=0.01^2, C2=0.03^2, mean over the map.
Operates on (N, H, W, C) images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gaussian_window(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)  # (size, size)


def _depthwise_filter(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 2-D correlation with same-padding (size // 2)."""
    c = img.shape[-1]
    k = window.shape[0]
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # (k,k,1,C)
    pad = k // 2
    return jax.lax.conv_general_dilated(
        img,
        kern,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM between two (N, H, W, C) image batches."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_filter(img1, w)
    mu2 = _depthwise_filter(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, w) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
