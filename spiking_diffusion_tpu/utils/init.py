"""Parameter initializers mirroring torch defaults.

torch Conv2d/Linear kernels: kaiming_uniform(a=sqrt(5)) == uniform with
bound sqrt(1/fan_in) == variance_scaling(1/3, fan_in, uniform); biases:
U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Kept dependency-free so both the snn
and models layers can import it without cycles.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
