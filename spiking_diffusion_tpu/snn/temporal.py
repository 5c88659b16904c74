"""Temporal primitives: PSP filter, membrane readout, time-flattened apply.

Parity targets:
  * ``seq_apply`` — spikingjelly ``functional.seq_to_ann_forward``
    (``functional.py:653-688``): fold the T axis into the batch axis so a
    stateless layer (conv/BN/linear) runs once over (T*N, ...). On TPU this
    is the key trick that turns 16 small convs into one big MXU-friendly
    conv. BatchNorm statistics are therefore computed over T*N jointly —
    matching the reference's ``layer.BatchNorm2d`` in multi-step mode.
  * ``psp`` — first-order synaptic low-pass (``snn_model/snn_layers.py:6-26``):
    syn[t] = syn[t-1] + (x[t] - syn[t-1]) / tau_s, returned for all t.
  * ``membrane_output`` — leaky readout (``snn_model/snn_layers.py:28-41``):
    out = sum_t 0.8^(T-1-t) * x[t].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def seq_apply(fn: Callable[[jax.Array], jax.Array], x_seq: jax.Array) -> jax.Array:
    """Apply a stateless function over a (T, N, ...) sequence by flattening
    time into batch: (T, N, ...) -> (T*N, ...) -> fn -> (T, N, ...)."""
    t, n = x_seq.shape[0], x_seq.shape[1]
    y = fn(x_seq.reshape((t * n,) + x_seq.shape[2:]))
    return y.reshape((t, n) + y.shape[1:])


def psp(x_seq: jax.Array, tau_s: float = 2.0) -> jax.Array:
    """First-order postsynaptic-potential filter over the leading T axis.

    Returns the full (T, ...) filtered sequence, matching ``PSP.forward``.
    """

    def body(syn, x):
        syn = syn + (x - syn) / tau_s
        return syn, syn

    init = jnp.zeros(x_seq.shape[1:], x_seq.dtype)
    _, syns = jax.lax.scan(body, init, x_seq)
    return syns


def membrane_output_coef(
    num_steps: int, decay: float = 0.8, dtype=jnp.float32
) -> jax.Array:
    """(T,) readout weights 0.8^(T-1-t) — the reference registers these as a
    buffer (``snn_layers.py:33-34``)."""
    arr = jnp.arange(num_steps - 1, -1, -1, dtype=dtype)
    return jnp.power(jnp.asarray(decay, dtype), arr)


def membrane_output(x_seq: jax.Array, decay: float = 0.8) -> jax.Array:
    """Leaky membrane readout: sum_t decay^(T-1-t) * x[t] over axis 0.

    Accepts any (T, ...) tensor (the reference fixes (T,N,C,H,W)).
    """
    coef = membrane_output_coef(x_seq.shape[0], decay, x_seq.dtype)
    coef = coef.reshape((-1,) + (1,) * (x_seq.ndim - 1))
    return jnp.sum(x_seq * coef, axis=0)
