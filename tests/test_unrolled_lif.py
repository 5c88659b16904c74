"""Parity: ops.unrolled_lif vs the snn.lif_scan oracle.

Same oracle pattern as tests/test_pallas_lif.py — the reference's
torch-vs-cupy backend checker reborn
(``spikingjelly/activation_based/neuron_kernel.py:1264-1311``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.ops.unrolled_lif import lif_unrolled
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_scan


def _x(shape=(16, 3, 5, 7), seed=0, scale=2.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * scale


@pytest.mark.parametrize("hard_reset", [True, False])
@pytest.mark.parametrize("detach_reset", [True, False])
@pytest.mark.parametrize("decay_input", [True, False])
def test_forward_parity(hard_reset, detach_reset, decay_input):
    p = NeuronParams(hard_reset=hard_reset, detach_reset=detach_reset,
                     decay_input=decay_input)
    x = _x()
    ref, _ = lif_scan(x, params=p)
    out = lif_unrolled(x, params=p)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("hard_reset", [True, False])
@pytest.mark.parametrize("detach_reset", [True, False])
def test_grad_parity(hard_reset, detach_reset):
    p = NeuronParams(hard_reset=hard_reset, detach_reset=detach_reset)
    x = _x(seed=3)

    def loss_ref(x):
        s, _ = lif_scan(x, params=p)
        return jnp.sum(jnp.sin(s * 3.0) * jnp.cos(x))

    def loss_new(x):
        return jnp.sum(jnp.sin(lif_unrolled(x, params=p) * 3.0) * jnp.cos(x))

    g_ref = jax.grad(loss_ref)(x)
    g_new = jax.grad(loss_new)(x)
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_new), atol=1e-6
    )


def test_v_init_and_dtype():
    p = NeuronParams()
    x = _x(seed=5).astype(jnp.bfloat16)
    v0 = jnp.full(x.shape[1:], 0.3, jnp.float32)
    ref, _ = lif_scan(x, v_init=v0, params=p)
    out = lif_unrolled(x, v_init=v0, params=p)
    assert out.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(ref, np.float32), np.asarray(out, np.float32)
    )


def test_jit_and_vmap_compose():
    p = NeuronParams()
    x = _x((8, 4, 6), seed=7)
    out = jax.jit(lambda x: lif_unrolled(x, params=p))(x)
    ref, _ = lif_scan(x, params=p)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # vmap over an extra batch axis (axis 1 of a stacked input)
    xb = jnp.stack([x, x * 0.5])
    outb = jax.vmap(lambda x: lif_unrolled(x, params=p))(xb)
    refb = jnp.stack([lif_scan(x, params=p)[0], lif_scan(x * 0.5, params=p)[0]])
    np.testing.assert_array_equal(np.asarray(refb), np.asarray(outb))


def test_backend_dispatch_unroll():
    from spiking_diffusion_tpu.snn.neuron import lif_multi_step

    x = _x(seed=9)
    out = lif_multi_step(x, backend="unroll")
    ref, _ = lif_scan(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
