"""NeuNorm, SynapseFilter, recurrent containers, tdBN tests."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.models import recurrent as R
from spiking_diffusion_tpu.snn.neuron import NeuronParams


def test_neunorm_recursion():
    s = jnp.asarray(
        (np.random.RandomState(0).rand(3, 2, 4, 4, 5) < 0.4).astype(np.float32)
    )
    m = R.NeuNorm(k=0.9)
    variables = m.init(jax.random.PRNGKey(0), s)
    out = m.apply(variables, s)
    assert out.shape == s.shape
    # manual recursion check
    w = np.asarray(variables["params"]["w"])
    k0, k1 = 0.9, 0.1 / 25
    aux = np.zeros((2, 4, 4, 1), np.float32)
    sn = np.asarray(s)
    for t in range(3):
        aux = k0 * aux + k1 * sn[t].sum(-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(out[t]), sn[t] - w * aux, rtol=1e-5, atol=1e-6
        )


def test_synapse_filter():
    s = np.zeros((4, 1), np.float32)
    s[0] = 1.0
    m = R.SynapseFilter(tau=2.0)
    out = np.asarray(m.apply({}, jnp.asarray(s)))
    # I1 = 0 - 0 + 1 = 1; I2 = 1 - 1/2 = 0.5; I3 = 0.25 ...
    np.testing.assert_allclose(out[:, 0], [1.0, 0.5, 0.25, 0.125], rtol=1e-6)


def test_synapse_filter_learnable():
    # mixed spikes: the decay term (gated by 1-S) must be exercised for
    # tau to receive gradient
    s = jnp.asarray([[1.0, 1.0], [0.0, 0.0], [0.0, 1.0]])
    m = R.SynapseFilter(tau=5.0, learnable=True)
    variables = m.init(jax.random.PRNGKey(0), s)
    assert "w" in variables["params"]
    out = m.apply(variables, s)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(
        lambda p: jnp.sum(m.apply({"params": p}, s))
    )(variables["params"])
    assert abs(float(g["w"])) > 0


def test_element_wise_recurrent():
    # identity cell with additive feedback: y[t] = x[t] + y[t-1] (cumsum)
    cell = R.stateless_cell()
    x = jnp.ones((4, 3))
    out = R.element_wise_recurrent(cell, lambda x, y: x + y, x)
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(np.ones((4, 3)), 0), rtol=1e-6
    )


def test_element_wise_recurrent_with_lif():
    cell = R.lif_cell(NeuronParams())
    x = jnp.full((6, 2, 3), 0.8)
    out = R.element_wise_recurrent(cell, lambda x, y: x + y, x)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_linear_recurrent_container():
    cell = R.lif_cell(NeuronParams())
    m = R.LinearRecurrentContainer(out_features=5)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 2, 5).astype(np.float32) * 2)
    variables = m.init(jax.random.PRNGKey(0), x, cell)
    out = m.apply(variables, x, cell)
    assert out.shape == (4, 2, 5)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_tdbn_scale_init():
    m = R.ThresholdDependentBatchNorm(alpha=2.0, v_threshold=1.0,
                                      use_running_average=False)
    x = jnp.asarray(np.random.RandomState(2).randn(3, 4, 2, 2, 6).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    scale = np.asarray(jax.tree.leaves(
        {k: v for k, v in variables["params"].items()}
    )[0] if "scale" not in str(variables["params"]) else None)
    # find the scale leaf
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    scales = [np.asarray(v) for p, v in flat if "scale" in str(p)]
    assert scales and np.allclose(scales[0], 2.0)
    out, _ = m.apply(variables, x, mutable=["batch_stats"])
    # normalized then scaled by 2 -> per-channel std ~2
    flat_out = np.asarray(out).reshape(-1, 6)
    np.testing.assert_allclose(flat_out.std(0), 2.0, rtol=0.05)
