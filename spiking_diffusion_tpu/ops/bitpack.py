"""Spike bit-packing: 8 spikes per uint8 byte.

Parity target: the reference's CUDA float<->bool packing kernels +
refcounted ``BoolTensorCache`` (``spikingjelly/activation_based/
tensor_cache.py:13-212``), which it uses to deduplicate spike tensors
saved for backward. On TPU there is no need for a hand-written kernel —
XLA compiles the pack/unpack einsum/bit-ops to efficient vector code —
and no need for a refcount cache: pass the packed array around explicitly
(e.g. when caching encoder spike trains for stage-2 training, an 8x HBM
saving over float8 storage and 32x over fp32).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pack_spikes(spikes: jax.Array) -> Tuple[jax.Array, Tuple[int, ...]]:
    """(…) float/bool spike tensor -> (ceil(n/8),) uint8 + original shape.

    Flattens, zero-pads to a byte boundary, packs LSB-first.
    """
    shape = spikes.shape
    flat = spikes.reshape(-1).astype(jnp.uint8)
    n = flat.shape[0]
    pad = (-n) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    bits = flat.reshape(-1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    packed = jnp.sum(bits * weights, axis=1).astype(jnp.uint8)
    return packed, shape


def unpack_spikes(
    packed: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32
) -> jax.Array:
    """Inverse of :func:`pack_spikes`."""
    bits = (packed[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    flat = bits.reshape(-1)
    n = 1
    for d in shape:
        n *= int(d)
    return flat[:n].reshape(shape).astype(dtype)
