"""Train state pytree: params + batch_stats + optimizer state + step.

The optimizer is AdamW(lr=1e-3, betas=(0.9, 0.999), weight_decay=1e-3),
matching ``main.py:113-116`` — decoupled weight decay applied to all
parameters (torch AdamW does not exempt norms/biases, so neither do we).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
            opt_state=new_opt_state,
        )


def make_adamw(
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=learning_rate, b1=b1, b2=b2, weight_decay=weight_decay
    )


def create_train_state(
    model,
    variables,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    if tx is None:
        tx = make_adamw(learning_rate, weight_decay, b1, b2)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
