"""Attention blocks for spike trains — spikingjelly ``layer.py`` parity.

``TemporalWiseAttention`` (``layer.py:1934-2014``; Yao et al., "Temporal-
wise Attention SNN"): squeeze-excitation over the T axis — average- and
max-pool all feature dims per timestep, share a bottleneck MLP, sigmoid
scores rescale each timestep. ``MultiDimensionalAttention``
(``layer.py:2016-2145``; MA-SNN): the same gating applied along T, C, and
spatial dims in sequence.

Note these attentions are *not* used by the Spiking-Diffusion model path
(no attention anywhere in the reference app, SURVEY §2d); they are part of
the runtime library surface.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalWiseAttention(nn.Module):
    """(T, N, ...) -> (T, N, ...) with per-timestep sigmoid gates."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        t = x_seq.shape[0]
        feat_axes = tuple(range(2, x_seq.ndim))
        avg = jnp.mean(x_seq, axis=feat_axes)  # (T, N)
        mx = jnp.max(x_seq, axis=feat_axes)  # (T, N)
        hidden = max(t // self.reduction, 1)
        d1 = nn.Dense(hidden, use_bias=False, name="fc1")
        d2 = nn.Dense(t, use_bias=False, name="fc2")

        def mlp(v):  # v: (N, T)
            return d2(nn.relu(d1(v)))

        scores = jax.nn.sigmoid(mlp(avg.T) + mlp(mx.T))  # (N, T)
        scores = scores.T.reshape((t, x_seq.shape[1]) + (1,) * (x_seq.ndim - 2))
        return x_seq * scores


class MultiDimensionalAttention(nn.Module):
    """Temporal + channel + spatial attention (MA-SNN) over
    (T, N, H, W, C) spike trains."""

    reduction_t: int = 16
    reduction_c: int = 16
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        t, n, h, w, c = x_seq.shape
        # --- temporal attention
        x_seq = TemporalWiseAttention(self.reduction_t, name="ta")(x_seq)
        # --- channel attention (squeeze over T, H, W)
        avg_c = jnp.mean(x_seq, axis=(0, 2, 3))  # (N, C)
        max_c = jnp.max(x_seq, axis=(0, 2, 3))
        hidden = max(c // self.reduction_c, 1)
        d1 = nn.Dense(hidden, use_bias=False, name="ca_fc1")
        d2 = nn.Dense(c, use_bias=False, name="ca_fc2")
        ca = jax.nn.sigmoid(d2(nn.relu(d1(avg_c))) + d2(nn.relu(d1(max_c))))
        x_seq = x_seq * ca[None, :, None, None, :]
        # --- spatial attention (channel+time squeeze -> kxk conv)
        avg_s = jnp.mean(x_seq, axis=(0, 4))  # (N, H, W)
        max_s = jnp.max(x_seq, axis=(0, 4))
        sa_in = jnp.stack([avg_s, max_s], axis=-1)  # (N, H, W, 2)
        k = self.kernel_size
        sa = nn.Conv(
            1, (k, k), padding=((k // 2, k // 2),) * 2, use_bias=False,
            name="sa_conv",
        )(sa_in)
        sa = jax.nn.sigmoid(sa)  # (N, H, W, 1)
        return x_seq * sa[None]
