"""PSP filter, membrane readout, seq_apply, encoders — golden values.

Parity targets: ``snn_model/snn_layers.py`` (PSP recursion, 0.8^(T-1-t)
readout coefficients) and ``main.py:133`` direct coding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn import (
    direct_encode,
    latency_encode,
    membrane_output,
    membrane_output_coef,
    poisson_encode,
    psp,
    seq_apply,
)


def test_psp_recursion_golden():
    x = np.zeros((3, 1), np.float32)
    x[0] = 1.0
    out = psp(jnp.asarray(x), tau_s=2.0)
    # syn: 0.5, 0.25, 0.125 (impulse response of syn += (x-syn)/2)
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], [0.5, 0.25, 0.125], atol=1e-7
    )


def test_psp_matches_loop_reference():
    rng = np.random.RandomState(0)
    x = rng.rand(16, 2, 3).astype(np.float32)
    out = np.asarray(psp(jnp.asarray(x)))
    syn = np.zeros((2, 3), np.float32)
    for t in range(16):
        syn = syn + (x[t] - syn) / 2.0
        np.testing.assert_allclose(out[t], syn, atol=1e-6)


def test_membrane_output_coef():
    coef = np.asarray(membrane_output_coef(16, 0.8))
    expected = 0.8 ** np.arange(15, -1, -1)
    np.testing.assert_allclose(coef, expected, rtol=1e-5)
    # last step has weight 1.0
    assert coef[-1] == 1.0


def test_membrane_output_weighted_sum():
    x = np.ones((4, 2, 2), np.float32)
    out = np.asarray(membrane_output(jnp.asarray(x), 0.8))
    expected = sum(0.8 ** (3 - t) for t in range(4))
    np.testing.assert_allclose(out, np.full((2, 2), expected), rtol=1e-6)


def test_seq_apply_matches_per_step():
    x = jnp.asarray(np.random.RandomState(1).rand(3, 2, 5).astype(np.float32))
    f = lambda v: v * 2.0 + 1.0
    out = seq_apply(f, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1, rtol=1e-6)


def test_direct_encode():
    x = jnp.arange(6.0).reshape(2, 3)
    e = direct_encode(x, 4)
    assert e.shape == (4, 2, 3)
    np.testing.assert_array_equal(np.asarray(e[0]), np.asarray(e[3]))


def test_poisson_encode_rate():
    key = jax.random.PRNGKey(0)
    x = jnp.full((100,), 0.3)
    spikes = poisson_encode(key, x, 200)
    rate = float(spikes.mean())
    assert abs(rate - 0.3) < 0.02
    assert set(np.unique(np.asarray(spikes))) <= {0.0, 1.0}


def test_latency_encode():
    x = jnp.array([1.0, 0.0, 0.5])
    s = latency_encode(x, 5)
    assert s.shape == (5, 3)
    # brightest spikes at t=0, darkest at t=T-1
    assert float(s[0, 0]) == 1.0
    assert float(s[4, 1]) == 1.0
    np.testing.assert_array_equal(np.asarray(s.sum(0)), [1, 1, 1])
