"""Stateful layer extras: NeuNorm, SynapseFilter, recurrent containers,
threshold-dependent BatchNorm — the remaining spikingjelly ``layer.py``
stateful modules.

All are scan-based: the module exposes ``__call__(x_seq)`` over (T, ...)
and the recurrence is a ``lax.scan``; the recurrent containers wrap a
user-supplied *cell* function ``(sub_state, x) -> (sub_state, y)`` (the
functional analogue of wrapping an ``nn.Module``).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.models.layers import seq_apply
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_step
from spiking_diffusion_tpu.utils.init import torch_bias_init, torch_kernel_init

class Cell:
    """A stateful per-step cell: ``init_state(shape) -> state`` and
    ``(state, x_t) -> (state, y_t)`` (the functional analogue of the
    wrapped ``nn.Module`` in spikingjelly's containers)."""

    def __init__(self, step_fn, init_fn):
        self._step = step_fn
        self._init = init_fn

    def init_state(self, shape):
        return self._init(shape)

    def __call__(self, state, x):
        return self._step(state, x)


def lif_cell(params: NeuronParams = NeuronParams()) -> Cell:
    """LIF neuron as a container cell (v carried)."""
    return Cell(
        step_fn=lambda v, x: lif_step(v, x, params),
        init_fn=lambda shape: jnp.full(shape, params.v_reset, jnp.float32),
    )


def stateless_cell(fn: Callable[[jax.Array], jax.Array] = lambda x: x) -> Cell:
    """Wrap a stateless function as a container cell."""
    return Cell(
        step_fn=lambda s, x: (s, fn(x)),
        init_fn=lambda shape: jnp.zeros((), jnp.float32),
    )


class NeuNorm(nn.Module):
    """Neuron normalization (``layer.py:961-1045``; Wu et al. 2019):
    aux[t] = k0 * aux[t-1] + k1 * sum_c(spikes[t]);
    out[t] = spikes[t] - w * aux[t],  k1 = (1 - k0)/C^2.

    Input (T, N, H, W, C) spike trains (must follow Conv -> LIF).
    """

    k: float = 0.9
    shared_across_channels: bool = False

    @nn.compact
    def __call__(self, s_seq: jax.Array) -> jax.Array:
        t, n, h, w, c = s_seq.shape
        w_shape = (h, w, 1) if self.shared_across_channels else (h, w, c)
        weight = self.param("w", torch_kernel_init, (1,) + w_shape)
        k0 = self.k
        k1 = (1.0 - k0) / (c**2)

        def body(aux, s):
            aux = k0 * aux + k1 * jnp.sum(s, axis=-1, keepdims=True)
            return aux, s - weight * aux

        aux0 = jnp.zeros((n, h, w, 1), jnp.float32)
        _, out = jax.lax.scan(body, aux0, s_seq)
        return out


class SynapseFilter(nn.Module):
    """Synaptic current low-pass (``layer.py:1182+``):
    I[t] = I[t-1] - (1 - S[t]) * I[t-1]/tau + S[t].

    ``learnable=True`` learns log(tau - 1) (tau > 1 guaranteed).
    """

    tau: float = 100.0
    learnable: bool = False

    @nn.compact
    def __call__(self, s_seq: jax.Array) -> jax.Array:
        import numpy as np

        if self.learnable:
            w = self.param(
                "w",
                nn.initializers.constant(float(np.log(self.tau - 1.0))), (),
            )
            tau = 1.0 + jnp.exp(w)
        else:
            tau = self.tau

        def body(i, s):
            i = i - (1.0 - s) * i / tau + s
            return i, i

        i0 = jnp.zeros(s_seq.shape[1:], jnp.float32)
        _, out = jax.lax.scan(body, i0, s_seq)
        return out


def element_wise_recurrent(
    cell: Cell,
    f: Callable[[jax.Array, jax.Array], jax.Array],
    x_seq: jax.Array,
) -> jax.Array:
    """ElementWiseRecurrentContainer (``layer.py``): the cell's previous
    output feeds back element-wise: y[t] = cell(f(x[t], y[t-1]))."""

    def body(carry, x):
        sub_state, y_prev = carry
        sub_state, y = cell(sub_state, f(x, y_prev))
        return (sub_state, y), y

    y0 = jnp.zeros(x_seq.shape[1:], jnp.float32)
    s0 = cell.init_state(x_seq.shape[1:])
    (_, _), out = jax.lax.scan(body, (s0, y0), x_seq)
    return out


class LinearRecurrentContainer(nn.Module):
    """LinearRecurrentContainer (``layer.py``): y[t] = cell(W [x; y[t-1]]).

    ``out_features`` must match the cell's output width.
    """

    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_seq: jax.Array, cell: Cell) -> jax.Array:
        in_features = x_seq.shape[-1]
        rc = nn.Dense(
            in_features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(in_features + self.out_features),
        )
        if self.is_initializing():
            rc(jnp.zeros(x_seq.shape[1:-1] + (in_features + self.out_features,)))

        def body(carry, x):
            sub_state, y_prev = carry
            h = rc(jnp.concatenate([x, y_prev], axis=-1))
            sub_state, y = cell(sub_state, h)
            return (sub_state, y), y

        out_shape = x_seq.shape[1:-1] + (self.out_features,)
        y0 = jnp.zeros(out_shape, jnp.float32)
        s0 = cell.init_state(x_seq.shape[1:-1] + (in_features,))
        (_, _), out = jax.lax.scan(body, (s0, y0), x_seq)
        return out


class ThresholdDependentBatchNorm(nn.Module):
    """tdBN (``layer.py`` ``ThresholdDependentBatchNorm2d``; Zheng et al.
    2021): BatchNorm over T*N with the scale initialized to
    alpha * v_threshold, so normalized drive matches the firing threshold.
    """

    alpha: float = 1.0
    v_threshold: float = 1.0
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x_seq: jax.Array, use_running_average: Optional[bool] = None
    ) -> jax.Array:
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        bn = nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.constant(
                self.alpha * self.v_threshold
            ),
        )
        return seq_apply(bn, x_seq)
