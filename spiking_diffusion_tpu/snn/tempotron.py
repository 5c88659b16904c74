"""Timing-based (latency-coding) SNN pieces — ``timing_based/`` parity.

``Tempotron`` neuron + ``GaussianTuning`` encoder
(``spikingjelly/timing_based/``): a single-layer classifier whose membrane
is a weighted sum of PSP kernels at spike times; Gaussian tuning curves
convert analog features to spike latencies.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def psp_kernel(
    t: jax.Array, t_spike: jax.Array, tau: float = 15.0, tau_s: float = 15.0 / 4
) -> jax.Array:
    """Normalized double-exponential PSP kernel v0*(exp(-dt/tau)-exp(-dt/tau_s))
    for dt >= 0, else 0."""
    dt = t - t_spike
    v0 = 1.0 / (
        (tau_s / tau) ** (tau_s / (tau - tau_s))
        - (tau_s / tau) ** (tau / (tau - tau_s))
    )
    k = v0 * (jnp.exp(-dt / tau) - jnp.exp(-dt / tau_s))
    return jnp.where(dt >= 0, k, 0.0)


def gaussian_tuning_encode(
    x: jax.Array, n_neurons: int, t_max: float, x_min: float, x_max: float
) -> jax.Array:
    """Gaussian tuning-curve latency encoder: each feature drives
    ``n_neurons`` with centers spread over [x_min, x_max]; response r in
    [0, 1] maps to spike time t = t_max * (1 - r) (late = weak).

    x: (..., F) -> spike times (..., F, n_neurons).
    """
    if n_neurons <= 2:
        raise ValueError(
            f"gaussian_tuning_encode needs n_neurons > 2 (got {n_neurons}): "
            "the reference tuning-curve spacing divides by (m - 2)"
        )
    i = jnp.arange(1, n_neurons + 1, dtype=jnp.float32)
    mu = x_min + (2 * i - 3) / 2 * (x_max - x_min) / (n_neurons - 2)
    sigma = (x_max - x_min) / (1.5 * (n_neurons - 2))
    r = jnp.exp(-((x[..., None] - mu) ** 2) / (2 * sigma**2))
    return t_max * (1.0 - r)


def tempotron_v(
    weights: jax.Array,  # (n_in,)
    t_spikes: jax.Array,  # (n_in,) input spike times
    t_grid: jax.Array,  # (n_t,) evaluation times
    tau: float = 15.0,
) -> jax.Array:
    """Membrane trace v(t) = sum_i w_i K(t - t_i) on a time grid."""
    k = psp_kernel(t_grid[:, None], t_spikes[None, :], tau)  # (n_t, n_in)
    return k @ weights


def tempotron_classify(
    weights: jax.Array,  # (classes, n_in)
    t_spikes: jax.Array,  # (batch, n_in)
    t_grid: jax.Array,
    v_threshold: float = 1.0,
    tau: float = 15.0,
) -> Tuple[jax.Array, jax.Array]:
    """Peak membrane per class; prediction = argmax peak.

    Returns (v_peak (batch, classes), predictions (batch,)). Training uses
    the standard Tempotron rule outside: on error, nudge weights by the
    PSP at the peak time (differentiable through v_peak here, so plain
    gradient descent on a margin loss also works).
    """
    k = psp_kernel(
        t_grid[None, :, None], t_spikes[:, None, :], tau
    )  # (B, n_t, n_in)
    v = jnp.einsum("btn,cn->btc", k, weights)  # (B, n_t, C)
    v_peak = v.max(axis=1)
    return v_peak, jnp.argmax(v_peak, axis=1)
