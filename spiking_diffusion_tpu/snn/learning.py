"""Trace-based STDP learners — spikingjelly ``learning.py`` parity.

``STDPLearner``/``MSTDPLearner``/``MSTDPETLearner``
(``spikingjelly/activation_based/learning.py:12-497``): pre/post synaptic
traces with exponential decay drive local weight updates. The reference
implements these as monitors hooked onto stateful layers; here they are
pure functions over explicit trace state, scanned over the spike trains —
the whole update is one jit with no hooks.

    trace_pre[t]  = trace_pre[t-1]  * (1 - 1/tau_pre)  + s_pre[t]
    trace_post[t] = trace_post[t-1] * (1 - 1/tau_post) + s_post[t]
    dw[t] = f_post(w) * outer(s_post[t], trace_pre[t])     (potentiation)
          - f_pre(w)  * outer(trace_post[t], s_pre[t])^T   (depression)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class STDPState(NamedTuple):
    trace_pre: jax.Array  # (..., n_pre)
    trace_post: jax.Array  # (..., n_post)


def init_state(n_pre: int, n_post: int, batch: int = 1) -> STDPState:
    return STDPState(
        trace_pre=jnp.zeros((batch, n_pre), jnp.float32),
        trace_post=jnp.zeros((batch, n_post), jnp.float32),
    )


def stdp_step(
    state: STDPState,
    s_pre: jax.Array,  # (B, n_pre) spikes
    s_post: jax.Array,  # (B, n_post) spikes
    tau_pre: float = 2.0,
    tau_post: float = 2.0,
    f_pre: float = 1.0,
    f_post: float = 1.0,
) -> Tuple[STDPState, jax.Array]:
    """One STDP step; returns (new_state, dw (n_pre, n_post)) summed over
    the batch (the reference accumulates per-batch, ``learning.py``
    ``stdp_linear_single_step``)."""
    trace_pre = state.trace_pre - state.trace_pre / tau_pre + s_pre
    trace_post = state.trace_post - state.trace_post / tau_post + s_post
    # potentiation: post spike x pre trace; depression: pre spike x post trace
    dw_pot = f_post * jnp.einsum("bi,bj->ij", trace_pre, s_post)
    dw_dep = f_pre * jnp.einsum("bi,bj->ij", s_pre, trace_post)
    return STDPState(trace_pre, trace_post), dw_pot - dw_dep


def stdp_scan(
    s_pre_seq: jax.Array,  # (T, B, n_pre)
    s_post_seq: jax.Array,  # (T, B, n_post)
    tau_pre: float = 2.0,
    tau_post: float = 2.0,
    f_pre: float = 1.0,
    f_post: float = 1.0,
) -> jax.Array:
    """Total STDP weight update over a spike-train pair; one lax.scan."""
    b, n_pre = s_pre_seq.shape[1], s_pre_seq.shape[2]
    n_post = s_post_seq.shape[2]
    init = init_state(n_pre, n_post, b)

    def body(carry, inp):
        st, acc = carry
        sp, spo = inp
        st, dw = stdp_step(st, sp, spo, tau_pre, tau_post, f_pre, f_post)
        return (st, acc + dw), None

    (final_state, dw_total), _ = jax.lax.scan(
        body, (init, jnp.zeros((n_pre, n_post), jnp.float32)),
        (s_pre_seq, s_post_seq),
    )
    return dw_total


def mstdp_scan(
    s_pre_seq: jax.Array,
    s_post_seq: jax.Array,
    reward_seq: jax.Array,  # (T,) modulatory reward per step
    tau_pre: float = 2.0,
    tau_post: float = 2.0,
) -> jax.Array:
    """Reward-modulated STDP (MSTDP): dw[t] scaled by reward[t]."""
    b, n_pre = s_pre_seq.shape[1], s_pre_seq.shape[2]
    n_post = s_post_seq.shape[2]
    init = init_state(n_pre, n_post, b)

    def body(carry, inp):
        st, acc = carry
        sp, spo, r = inp
        st, dw = stdp_step(st, sp, spo, tau_pre, tau_post)
        return (st, acc + r * dw), None

    (_, dw_total), _ = jax.lax.scan(
        body, (init, jnp.zeros((n_pre, n_post), jnp.float32)),
        (s_pre_seq, s_post_seq, reward_seq),
    )
    return dw_total


def mstdpet_scan(
    s_pre_seq: jax.Array,
    s_post_seq: jax.Array,
    reward_seq: jax.Array,
    tau_pre: float = 2.0,
    tau_post: float = 2.0,
    tau_e: float = 5.0,
) -> jax.Array:
    """MSTDP with eligibility traces: e[t] = e[t-1] exp(-1/tau_e) + dw[t];
    dw_applied[t] = reward[t] * e[t]."""
    b, n_pre = s_pre_seq.shape[1], s_pre_seq.shape[2]
    n_post = s_post_seq.shape[2]
    init = init_state(n_pre, n_post, b)
    zero = jnp.zeros((n_pre, n_post), jnp.float32)

    def body(carry, inp):
        st, elig, acc = carry
        sp, spo, r = inp
        st, dw = stdp_step(st, sp, spo, tau_pre, tau_post)
        elig = elig - elig / tau_e + dw
        return (st, elig, acc + r * elig), None

    (_, _, dw_total), _ = jax.lax.scan(
        body, (init, zero, zero), (s_pre_seq, s_post_seq, reward_seq)
    )
    return dw_total
