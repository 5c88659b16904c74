"""Spiking RNNs, STDP learners, Tempotron, extra encoders, extra datasets."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn import (
    learning,
    periodic_encode,
    rnn,
    tempotron,
    weighted_phase_encode,
)


def test_spiking_lstm_shapes_and_binary():
    m = rnn.SpikingRNN(hidden=8, cell_type="lstm")
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3, 4).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    ys, carry = jax.jit(lambda v, x: m.apply(v, x))(variables, x)
    assert ys.shape == (5, 3, 8)
    assert set(np.unique(np.asarray(ys))) <= {0.0, 1.0}


def test_spiking_gru_and_vanilla():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 2, 3).astype(np.float32))
    for cell in ("gru", "vanilla"):
        m = rnn.SpikingRNN(hidden=6, cell_type=cell)
        variables = m.init(jax.random.PRNGKey(0), x)
        ys, _ = m.apply(variables, x)
        assert ys.shape == (4, 2, 6)
        assert set(np.unique(np.asarray(ys))) <= {0.0, 1.0}


def test_spiking_rnn_bidirectional():
    m = rnn.SpikingRNN(hidden=5, cell_type="lstm", bidirectional=True)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 2, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    ys, _ = m.apply(variables, x)
    assert ys.shape == (4, 2, 10)


def test_spiking_rnn_gradients():
    m = rnn.SpikingRNN(hidden=4, cell_type="lstm")
    x = jnp.asarray(np.random.RandomState(3).randn(3, 2, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        ys, _ = m.apply({"params": params}, x)
        return jnp.sum(ys * jnp.arange(1.0, 4.0)[:, None, None])

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total)


def test_stdp_causality():
    # pre fires at t=0, post at t=1 -> potentiation (positive dw)
    T, B = 4, 1
    s_pre = np.zeros((T, B, 1), np.float32)
    s_post = np.zeros((T, B, 1), np.float32)
    s_pre[0] = 1.0
    s_post[1] = 1.0
    dw = learning.stdp_scan(jnp.asarray(s_pre), jnp.asarray(s_post))
    assert float(dw[0, 0]) > 0
    # post before pre -> depression
    dw2 = learning.stdp_scan(jnp.asarray(s_post), jnp.asarray(s_pre))
    assert float(dw2[0, 0]) < 0


def test_mstdp_reward_scaling():
    T, B = 3, 2
    rng = np.random.RandomState(4)
    s_pre = jnp.asarray(rng.binomial(1, 0.5, (T, B, 3)).astype(np.float32))
    s_post = jnp.asarray(rng.binomial(1, 0.5, (T, B, 2)).astype(np.float32))
    r_pos = jnp.ones((T,))
    dw_pos = learning.mstdp_scan(s_pre, s_post, r_pos)
    dw_neg = learning.mstdp_scan(s_pre, s_post, -r_pos)
    np.testing.assert_allclose(np.asarray(dw_pos), -np.asarray(dw_neg), atol=1e-6)
    # eligibility-trace variant runs and is finite
    dw_et = learning.mstdpet_scan(s_pre, s_post, r_pos)
    assert np.isfinite(np.asarray(dw_et)).all()


def test_tempotron():
    t_grid = jnp.linspace(0, 50, 101)
    # 2 classes, 4 inputs: class-0 weights match early spikes
    w = jnp.asarray([[1.0, 1.0, -0.5, -0.5], [-0.5, -0.5, 1.0, 1.0]])
    t_spikes = jnp.asarray([[1.0, 2.0, 40.0, 45.0]])  # early on first pair
    v_peak, pred = tempotron.tempotron_classify(w, t_spikes, t_grid)
    assert v_peak.shape == (1, 2)
    assert int(pred[0]) == 0
    # kernel is zero before the spike
    k = tempotron.psp_kernel(jnp.asarray(0.5), jnp.asarray(1.0))
    assert float(k) == 0.0


def test_gaussian_tuning_encoder():
    x = jnp.asarray([[0.0, 0.5, 1.0]])
    t = tempotron.gaussian_tuning_encode(x, n_neurons=8, t_max=20.0,
                                         x_min=0.0, x_max=1.0)
    assert t.shape == (1, 3, 8)
    tt = np.asarray(t)
    assert tt.min() >= 0 and tt.max() <= 20.0
    # best-matching neuron spikes earliest
    assert tt[0, 1].min() < 5.0


def test_periodic_encode():
    pat = jnp.asarray(np.eye(3, dtype=np.float32))  # (3, 3)
    out = periodic_encode(pat, 7)
    assert out.shape == (7, 3)
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(pat[0]))
    np.testing.assert_array_equal(np.asarray(out[6]), np.asarray(pat[0]))


def test_weighted_phase_encode():
    x = jnp.asarray([0.75, 0.5, 0.0])
    s = weighted_phase_encode(x, 4)
    assert s.shape == (4, 3)
    # reconstruct: sum_k s_k * 2^-(k+1)
    w = 2.0 ** -(jnp.arange(4) + 1)
    recon = jnp.einsum("kf,k->f", s, w)
    np.testing.assert_allclose(np.asarray(recon), [0.75, 0.5, 0.0], atol=2**-4)


def test_extra_datasets_synthetic_fallbacks():
    from spiking_diffusion_tpu.data import (
        load_celeba,
        load_cifar10,
        load_mnist_c,
        load_notmnist,
        mnist_square,
    )

    cel = load_celeba(data_path="/nonexistent")
    assert cel.train_images.shape[-1] == 3
    assert cel.train_images.shape[1] == 64

    c = load_cifar10(data_path="/nonexistent")
    assert c.train_images.shape[-1] == 3
    cbw = load_cifar10(data_path="/nonexistent", grayscale=True)
    assert cbw.train_images.shape[-1] == 1
    sq = mnist_square(n_train=16, n_test=4)
    assert sq.train_images.shape == (16, 28, 28, 1)
    assert sq.train_images.max() == 1.0
    nm = load_notmnist(data_path="/nonexistent")
    assert nm.train_images.shape[1:] == (28, 28, 1)
    mc = load_mnist_c("identity", data_path="/nonexistent")
    assert mc.train_images.shape[1:] == (28, 28, 1)


def test_bilinear_resize():
    from spiking_diffusion_tpu.data.extra_datasets import _bilinear_resize

    x = np.zeros((1, 32, 32, 3), np.float32)
    x[:, 8:24, 8:24] = 1.0
    y = _bilinear_resize(x, 28)
    assert y.shape == (1, 28, 28, 3)
    assert 0.0 <= y.min() and y.max() <= 1.0
    # mass approximately preserved under resize (scaled by area ratio)
    ratio = (y.sum() / (28 * 28)) / (x.sum() / (32 * 32))
    assert 0.9 < ratio < 1.1
