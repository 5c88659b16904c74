"""DropConnectLinear tests."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.models.dropconnect import DropConnectLinear


def test_eval_uses_expected_weights():
    m = DropConnectLinear(4, p=0.5)
    x = jnp.ones((2, 3))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropconnect": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    y = m.apply(variables, x, deterministic=True)
    k = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    np.testing.assert_allclose(
        np.asarray(y), np.ones((2, 3)) @ (k * 0.5) + b * 0.5, rtol=1e-5
    )


def test_train_masks_weights():
    m = DropConnectLinear(64, p=0.5, use_bias=False)
    x = jnp.ones((1, 64))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropconnect": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    y1 = m.apply(variables, x, deterministic=False,
                 rngs={"dropconnect": jax.random.PRNGKey(2)})
    y2 = m.apply(variables, x, deterministic=False,
                 rngs={"dropconnect": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # same rng -> same mask
    y3 = m.apply(variables, x, deterministic=False,
                 rngs={"dropconnect": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))
