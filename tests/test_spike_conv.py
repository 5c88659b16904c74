"""ops/spike_conv: masked-shift training conv kernel vs lax.conv oracle.

Forward values, BN moments, and the fused dx/dW/db backward must match
XLA's conv and jax.grad of it (fp32 tight; bf16 at storage-rounding
tolerances).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.ops import spike_conv

spike_conv._INTERPRET = True  # CPU


def _oracle(x_seq, kernel, bias):
    """XLA mirror: SAME 3x3 conv per time step + rounded-y moments."""
    t, n, h, w, cin = x_seq.shape
    y = jax.lax.conv_general_dilated(
        x_seq.reshape(t * n, h, w, cin), kernel.astype(x_seq.dtype),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    y = y.astype(x_seq.dtype).reshape(t, n, h, w, kernel.shape[-1])
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, (0, 1, 2, 3)), jnp.sum(yf * yf, (0, 1, 2, 3))


def _data(key, t=3, n=5, hw=7, cin=6, cout=10, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (t, n, hw, hw, cin), jnp.float32).astype(dtype)
    kernel = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.2
    bias = jax.random.normal(k3, (cout,), jnp.float32) * 0.1
    return x, kernel, bias


@pytest.mark.parametrize("hw,cin,cout", [(7, 6, 10), (4, 3, 5)])
def test_forward_matches_conv_fp32(hw, cin, cout):
    x, kernel, bias = _data(jax.random.PRNGKey(0), hw=hw, cin=cin,
                            cout=cout)
    y, s1, s2 = jax.jit(
        functools.partial(spike_conv.spike_conv3x3)
    )(x, kernel, bias)
    yr, s1r, s2r = jax.jit(_oracle)(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-4, atol=1e-3)


def test_forward_bf16_rounding_matches():
    x, kernel, bias = _data(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    y, s1, s2 = jax.jit(spike_conv.spike_conv3x3)(x, kernel, bias)
    yr, s1r, s2r = jax.jit(_oracle)(x, kernel, bias)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=2e-2, atol=0.5)


def test_batch_padding():
    # n not a multiple of the 8-sublane padding
    x, kernel, bias = _data(jax.random.PRNGKey(2), n=3)
    y, s1, _ = jax.jit(spike_conv.spike_conv3x3)(x, kernel, bias)
    yr, s1r, _ = jax.jit(_oracle)(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    # pad rows must not leak into the accumulated moments
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-4, atol=1e-3)


def test_grads_match_conv_grads():
    x, kernel, bias = _data(jax.random.PRNGKey(3))
    tgt = jax.random.normal(jax.random.PRNGKey(9), (10,), jnp.float32)

    def loss_fused(x, kernel, bias):
        y, s1, s2 = spike_conv.spike_conv3x3(x, kernel, bias)
        # touch every output so all three cotangents flow
        return (
            jnp.sum(y * y) + jnp.sum(s1 * tgt) + 0.1 * jnp.sum(s2)
        )

    def loss_ref(x, kernel, bias):
        y, s1, s2 = _oracle(x, kernel, bias)
        return (
            jnp.sum(y * y) + jnp.sum(s1 * tgt) + 0.1 * jnp.sum(s2)
        )

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, kernel, bias)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, kernel, bias)
    for a, b, tol in zip(gf, gr, (1e-4, 1e-4, 1e-4)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tol, atol=tol
        )


def test_grads_without_moment_use():
    x, kernel, bias = _data(jax.random.PRNGKey(4))

    def loss_fused(x, kernel, bias):
        y, _, _ = spike_conv.spike_conv3x3(x, kernel, bias)
        return jnp.sum(jnp.tanh(y))

    def loss_ref(x, kernel, bias):
        y, _, _ = _oracle(x, kernel, bias)
        return jnp.sum(jnp.tanh(y))

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, kernel, bias)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, kernel, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_tchunk_grid_parity():
    """Force the T-chunked 2-D grid (the big-channel TPU path): moments
    and dW/db accumulate across BOTH grid axes."""
    old = spike_conv._VMEM_BUDGET
    spike_conv._VMEM_BUDGET = 200 * 1024  # tiny: forces tchunk < t
    try:
        # t=4 divides into chunks; distinct shape so the lru_cached
        # pallas_call builds fresh under this budget
        x, kernel, bias = _data(jax.random.PRNGKey(6), t=4, n=5, hw=5,
                                cin=7, cout=9)
        blk, tchunk = spike_conv._tiling(8, 25, 4, 7, 9, 4)
        assert tchunk < 4, "budget did not force T-chunking"
        tgt = jax.random.normal(jax.random.PRNGKey(8), (9,), jnp.float32)

        def loss(f):
            def g(x, kernel, bias):
                y, s1, s2 = f(x, kernel, bias)
                return (jnp.sum(y * y) + jnp.sum(s1 * tgt)
                        + 0.1 * jnp.sum(s2))
            return g

        y, s1, s2 = jax.jit(spike_conv.spike_conv3x3)(x, kernel, bias)
        yr, s1r, s2r = jax.jit(_oracle)(x, kernel, bias)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                                   rtol=1e-4, atol=1e-3)
        gf = jax.jit(jax.grad(loss(spike_conv.spike_conv3x3),
                              argnums=(0, 1, 2)))(x, kernel, bias)
        gr = jax.jit(jax.grad(loss(_oracle),
                              argnums=(0, 1, 2)))(x, kernel, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
    finally:
        spike_conv._VMEM_BUDGET = old


def test_no_moments_flag():
    x, kernel, bias = _data(jax.random.PRNGKey(5))
    y, s1, s2 = jax.jit(
        functools.partial(spike_conv.spike_conv3x3, with_moments=False)
    )(x, kernel, bias)
    yr, _, _ = jax.jit(_oracle)(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.sum(jnp.abs(s1))) == 0.0
    assert float(jnp.sum(jnp.abs(s2))) == 0.0
