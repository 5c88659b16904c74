"""Forward Propagation Through Time (FPTT) online training.

Parity target: ``spikingjelly/activation_based/functional.py:1162-1280``
(``fptt_online_training``; Kag & Saligrama 2021, Yin et al. 2021): instead
of BPTT over the whole window, parameters are updated at every timestep
with the instantaneous loss plus a running-average anchor regularizer:

    step t:
      L_t(w)   = f(y_t(w), target_t) + (alpha/2) * ||w - a_t||^2,
                 a_t = w_ra + g_last / (2 alpha)
      w       <- w - lr * dL_t/dw                     (SGD step)
      g_last  <- d f(y_t(w_new)) / dw  (bare loss at the new params)
      w_ra    <- (w_ra + w_new)/2 - g_last / (2 alpha)

JAX rebuild: one ``lax.scan`` over T whose carry holds
(params, w_ra, g_last, hidden state) — the whole online-learning loop is
a single jitted computation, where the reference re-enters the optimizer
per step from Python.

``cell_apply(params, state, x_t) -> (state, y_t)`` is the stateful model
step (e.g. Linear+LIF stacks built from ``lif_step``).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

CellApply = Callable[[Any, Any, jax.Array], Tuple[Any, jax.Array]]


def fptt_online_training(
    cell_apply: CellApply,
    params: Any,
    state0: Any,
    x_seq: jax.Array,
    target_seq: jax.Array,
    f_loss: Callable[[jax.Array, jax.Array], jax.Array],
    lr: float = 0.1,
    alpha: float = 0.1,
) -> Tuple[Any, jax.Array]:
    """Run FPTT over (T, ...) inputs/targets; returns (new_params,
    per-step losses (T,))."""

    zeros = jax.tree.map(jnp.zeros_like, params)

    def step(carry, inp):
        p, w_ra, g_last, state = carry
        x_t, tgt_t = inp

        anchor = jax.tree.map(
            lambda a, g: a + g / (2.0 * alpha), w_ra, g_last
        )

        def total_loss(pp):
            new_state, y = cell_apply(pp, state, x_t)
            reg = sum(
                jnp.sum((w - aw) ** 2)
                for w, aw in zip(jax.tree.leaves(pp), jax.tree.leaves(anchor))
            )
            return f_loss(y, tgt_t) + 0.5 * alpha * reg, new_state

        (loss_t, new_state), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(p)
        p_new = jax.tree.map(lambda w, g: w - lr * g, p, grads)

        # bare-loss gradient at the new params (same input, same pre-step
        # state — the reference restores hidden states for this pass)
        def bare_loss(pp):
            _, y = cell_apply(pp, state, x_t)
            return f_loss(y, tgt_t)

        g_bare = jax.grad(bare_loss)(p_new)
        w_ra_new = jax.tree.map(
            lambda a, w, g: (a + w) / 2.0 - g / (2.0 * alpha),
            w_ra, p_new, g_bare,
        )
        return (p_new, w_ra_new, g_bare, new_state), loss_t

    init = (params, params, zeros, state0)
    (p_final, _, _, _), losses = jax.lax.scan(
        step, init, (x_seq, target_seq)
    )
    return p_final, losses
