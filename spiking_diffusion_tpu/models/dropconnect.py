"""DropConnect linear layer — spikingjelly ``layer.DropConnectLinear``.

Weight-level dropout (``layer.py:1368-1561``): a Bernoulli mask on the
*weights* (not activations), resampled per forward and — in the SNN
setting — frozen across the T axis like the activation Dropout. At eval
the weights are scaled by the keep probability (``invariant=False``
torch-style semantics: train uses masked raw weights, eval uses p*W).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.utils.init import torch_bias_init, torch_kernel_init


class DropConnectLinear(nn.Module):
    features: int
    p: float = 0.5  # drop probability
    use_bias: bool = True
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: Optional[bool] = None
    ) -> jax.Array:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (in_features, self.features)
        )
        bias = (
            self.param("bias", torch_bias_init(in_features), (self.features,))
            if self.use_bias
            else None
        )
        keep = 1.0 - self.p
        if det:
            w = kernel * keep  # expected weight at eval
            b = bias * keep if bias is not None else None
        else:
            rng = self.make_rng("dropconnect")
            k1, k2 = jax.random.split(rng)
            w = kernel * jax.random.bernoulli(k1, keep, kernel.shape)
            b = (
                bias * jax.random.bernoulli(k2, keep, bias.shape)
                if bias is not None
                else None
            )
        y = x @ w
        return y + b if b is not None else y
