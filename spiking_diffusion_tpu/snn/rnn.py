"""Spiking recurrent networks — spikingjelly ``rnn.py`` parity.

``SpikingLSTM``/``SpikingGRU``/``SpikingVanillaRNN``
(``spikingjelly/activation_based/rnn.py:7-902``): standard RNN cell wiring
with every nonlinearity replaced by a Heaviside spike with surrogate
gradient, so hidden states are binary spike vectors and the whole network
is event-driven. Multi-step processing is a ``lax.scan`` over T;
bidirectional runs a second scan on the time-reversed sequence.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.utils.init import torch_bias_init, torch_kernel_init
from spiking_diffusion_tpu.snn.surrogate import SurrogateFn, atan


class SpikingLSTMCell(nn.Module):
    """LSTM cell with spiking gates: i,f,o,g = Theta(Wx + Uh + b);
    c' = f*c + i*g; h' = o * c' (spikes via surrogate grad)."""

    hidden: int
    surrogate: SurrogateFn = atan

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        gates = nn.Dense(4 * self.hidden, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(x.shape[-1]),
                         name="ih")(x) + \
                nn.Dense(4 * self.hidden, use_bias=False,
                         kernel_init=torch_kernel_init, name="hh")(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, g, o = (self.surrogate(v) for v in (i, f, g, o))
        c_raw = f * c + i * g  # can reach 2
        # clamp to 1 with straight-through gradient — the reference clamps
        # under no_grad (``rnn.py:698-705``): "threshold this output to 1
        # when it is 1 or 2"
        c_next = c_raw + jax.lax.stop_gradient(
            jnp.minimum(c_raw, 1.0) - c_raw
        )
        h_next = o * c_next
        return (h_next, c_next), h_next

    def init_carry(self, batch: int):
        z = jnp.zeros((batch, self.hidden), jnp.float32)
        return (z, z)


class SpikingGRUCell(nn.Module):
    """GRU cell with spiking gates."""

    hidden: int
    surrogate: SurrogateFn = atan

    @nn.compact
    def __call__(self, carry, x):
        (h,) = carry
        zr = nn.Dense(2 * self.hidden, kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init(x.shape[-1]),
                      name="ih_zr")(x) + \
             nn.Dense(2 * self.hidden, use_bias=False,
                      kernel_init=torch_kernel_init, name="hh_zr")(h)
        z, r = jnp.split(zr, 2, axis=-1)
        z, r = self.surrogate(z), self.surrogate(r)
        n = nn.Dense(self.hidden, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]),
                     name="ih_n")(x) + \
            r * nn.Dense(self.hidden, use_bias=False,
                         kernel_init=torch_kernel_init, name="hh_n")(h)
        n = self.surrogate(n)
        h_next = (1.0 - z) * n + z * h
        return (h_next,), h_next

    def init_carry(self, batch: int):
        return (jnp.zeros((batch, self.hidden), jnp.float32),)


class SpikingVanillaRNNCell(nn.Module):
    """Elman cell with a spiking activation."""

    hidden: int
    surrogate: SurrogateFn = atan

    @nn.compact
    def __call__(self, carry, x):
        (h,) = carry
        pre = nn.Dense(self.hidden, kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(x.shape[-1]),
                       name="ih")(x) + \
              nn.Dense(self.hidden, use_bias=False,
                       kernel_init=torch_kernel_init, name="hh")(h)
        h_next = self.surrogate(pre)
        return (h_next,), h_next

    def init_carry(self, batch: int):
        return (jnp.zeros((batch, self.hidden), jnp.float32),)


class SpikingRNN(nn.Module):
    """Multi-step (optionally bidirectional) spiking RNN over (T, N, F).

    ``cell_type``: 'lstm' | 'gru' | 'vanilla'. Outputs (T, N, H) spike
    trains ((T, N, 2H) when bidirectional), plus the final carry.
    """

    hidden: int
    cell_type: str = "lstm"
    bidirectional: bool = False
    surrogate: SurrogateFn = atan

    def setup(self):
        cells = {
            "lstm": SpikingLSTMCell,
            "gru": SpikingGRUCell,
            "vanilla": SpikingVanillaRNNCell,
        }
        if self.cell_type not in cells:
            raise ValueError(f"unknown cell_type {self.cell_type!r}")
        mk = lambda name: cells[self.cell_type](
            hidden=self.hidden, surrogate=self.surrogate, name=name
        )
        self.fwd_cell = mk("fwd")
        if self.bidirectional:
            self.bwd_cell = mk("bwd")

    def _run(self, cell, x_seq):
        batch = x_seq.shape[1]
        if self.is_initializing():
            cell(cell.init_carry(batch), x_seq[0])

        def body(carry, x):
            return cell(carry, x)

        carry, ys = jax.lax.scan(body, cell.init_carry(batch), x_seq)
        return carry, ys

    def __call__(self, x_seq: jax.Array):
        carry_f, ys_f = self._run(self.fwd_cell, x_seq)
        if not self.bidirectional:
            return ys_f, carry_f
        carry_b, ys_b = self._run(self.bwd_cell, x_seq[::-1])
        return jnp.concatenate([ys_f, ys_b[::-1]], axis=-1), (carry_f, carry_b)
