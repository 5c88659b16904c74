"""Spike encoders: analog image -> (T, ...) spike/analog train.

Parity targets (spikingjelly ``activation_based/encoding.py``):
  * ``direct_encode`` — what the app actually uses: the analog image is
    repeated T times as the input current
    (``main.py:133``: ``images.unsqueeze(0).repeat(16,1,1,1,1)``).
  * ``poisson_encode`` — Bernoulli(x) per step (``encoding.py:305``).
  * ``latency_encode`` — spike time t = round((T-1)*(1-x)), one spike per
    neuron (``encoding.py`` LatencyEncoder, linear mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def direct_encode(x: jax.Array, num_steps: int) -> jax.Array:
    """Repeat the analog input T times along a new leading axis.

    XLA keeps this as a broadcast — no T-fold HBM materialization until a
    consumer forces it.
    """
    return jnp.broadcast_to(x[None], (num_steps,) + x.shape)


def poisson_encode(key: jax.Array, x: jax.Array, num_steps: int) -> jax.Array:
    """Rate coding: spike[t] ~ Bernoulli(x) i.i.d. per step, x in [0,1]."""
    u = jax.random.uniform(key, (num_steps,) + x.shape, x.dtype)
    return (u < x).astype(x.dtype)


def periodic_encode(spike_pattern: jax.Array, num_steps: int) -> jax.Array:
    """Tile a fixed (T0, ...) spike pattern periodically to T steps
    (spikingjelly ``PeriodicEncoder``)."""
    t0 = spike_pattern.shape[0]
    reps = -(-num_steps // t0)
    return jnp.tile(spike_pattern, (reps,) + (1,) * (spike_pattern.ndim - 1))[
        :num_steps
    ]


def weighted_phase_encode(x: jax.Array, num_phases: int) -> jax.Array:
    """Weighted phase coding (spikingjelly ``WeightedPhaseEncoder``):
    x in [0, 1 - 2^-K] is decomposed in binary over K phases; spike at
    phase k carries weight 2^-(k+1). Returns (K, ...) spikes."""
    spikes = []
    rest = x
    for k in range(num_phases):
        w = 2.0 ** (-(k + 1))
        s = (rest >= w).astype(x.dtype)
        rest = rest - s * w
        spikes.append(s)
    return jnp.stack(spikes)


def latency_encode(x: jax.Array, num_steps: int) -> jax.Array:
    """Latency coding: neuron with intensity x spikes once at
    t = round((T-1) * (1 - x)); brighter inputs spike earlier."""
    t_spike = jnp.round((num_steps - 1) * (1.0 - x)).astype(jnp.int32)
    t_axis = jnp.arange(num_steps, dtype=jnp.int32).reshape(
        (-1,) + (1,) * x.ndim
    )
    return (t_axis == t_spike[None]).astype(x.dtype)
