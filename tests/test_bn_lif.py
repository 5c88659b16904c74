"""Parity tests for the fused BN-apply+LIF kernel (ops/bn_lif.py).

Oracle: the unfused composition ``scale * y + shift`` ->
:func:`snn.neuron.lif_scan` (the parity-locked reference neuron). fp32
must match exactly (the kernel computes the same fp32 ops in the same
order per step); gradients through ``jax.grad`` of the composition are
the analytical check for the in-kernel reverse recurrence AND the
per-channel scale/shift grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.ops import bn_lif
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_scan

bn_lif._INTERPRET = True  # CPU

P = NeuronParams()


def _oracle(y_seq, scale, shift, t_out=None):
    z = y_seq.astype(jnp.float32) * scale + shift
    if t_out is not None and y_seq.shape[0] == 1:
        z = jnp.broadcast_to(z, (t_out,) + z.shape[1:])
    s, _ = lif_scan(z, params=P)
    return s


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype) * 2.0


def test_forward_matches_oracle_fp32():
    k = jax.random.PRNGKey(0)
    y = _rand(k, (6, 4, 3, 3, 8))
    scale = jnp.linspace(0.5, 1.5, 8)
    shift = jnp.linspace(-0.3, 0.3, 8)
    got = jax.jit(
        lambda y: bn_lif.bn_lif(y, scale, shift, P)
    )(y)
    want = jax.jit(lambda y: _oracle(y, scale, shift))(y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_forward_time_broadcast_matches_oracle():
    k = jax.random.PRNGKey(1)
    y = _rand(k, (1, 4, 3, 3, 8))
    scale = jnp.linspace(0.5, 1.5, 8)
    shift = jnp.zeros((8,))
    got = jax.jit(
        lambda y: bn_lif.bn_lif(y, scale, shift, P, t_out=6)
    )(y)
    want = jax.jit(lambda y: _oracle(y, scale, shift, t_out=6))(y)
    assert got.shape == (6, 4, 3, 3, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("t_in,t_out", [(6, 6), (1, 6)])
def test_grads_match_oracle(t_in, t_out):
    k = jax.random.PRNGKey(2)
    y = _rand(k, (t_in, 4, 3, 3, 8))
    scale = jnp.linspace(0.5, 1.5, 8)
    shift = jnp.linspace(-0.3, 0.3, 8)

    def loss_fused(y, sc, sh):
        s = bn_lif.bn_lif(y, sc, sh, P, t_out=t_out)
        w = jnp.cos(jnp.arange(s.size, dtype=jnp.float32)).reshape(s.shape)
        return jnp.sum(s.astype(jnp.float32) * w)

    def loss_oracle(y, sc, sh):
        s = _oracle(y, sc, sh, t_out=t_out if t_in == 1 else None)
        w = jnp.cos(jnp.arange(s.size, dtype=jnp.float32)).reshape(s.shape)
        return jnp.sum(s * w)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(y, scale, shift)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))(y, scale, shift)
    for a, b, name in zip(gf, go, ("dy", "dscale", "dshift")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=name,
        )


def test_bf16_forward_close_and_dtypes():
    k = jax.random.PRNGKey(3)
    y32 = _rand(k, (6, 4, 3, 3, 8))
    y16 = y32.astype(jnp.bfloat16)
    scale = jnp.linspace(0.5, 1.5, 8)
    shift = jnp.linspace(-0.3, 0.3, 8)
    got = jax.jit(lambda y: bn_lif.bn_lif(y, scale, shift, P))(y16)
    assert got.dtype == jnp.bfloat16
    # oracle on the SAME bf16 input values, fp32 arithmetic (what the
    # kernel does): spikes must agree exactly — thresholding identical
    # fp32 numbers
    want = jax.jit(lambda y: _oracle(y, scale, shift))(y16)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want)
    )

    def loss(y):
        return jnp.sum(
            bn_lif.bn_lif(y, scale, shift, P).astype(jnp.float32) ** 2
        )

    g = jax.jit(jax.grad(loss))(y16)
    assert g.dtype == jnp.bfloat16


def test_padding_region_is_inert():
    # M = 4*3*3*5 = 180, far from a multiple of 128: padded lanes must
    # not spike or contribute grads
    k = jax.random.PRNGKey(4)
    y = _rand(k, (4, 4, 3, 3, 5))
    scale = jnp.ones((5,))
    shift = jnp.zeros((5,))
    got = jax.jit(lambda y: bn_lif.bn_lif(y, scale, shift, P))(y)
    want = jax.jit(lambda y: _oracle(y, scale, shift))(y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
