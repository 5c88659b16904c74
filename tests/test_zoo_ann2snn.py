"""Model zoo (VGG/ResNet/SEW/PLIF), ANN->SNN conversion, visualizing,
and the new Seq layers (pool/dropout/voting)."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.models import ann2snn, zoo
from spiking_diffusion_tpu.models.layers import (
    SeqAvgPool,
    SeqDropout,
    SeqMaxPool,
    VotingLayer,
)


def test_seq_pools():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 8, 8, 4).astype(np.float32))
    assert SeqMaxPool(2).apply({}, x).shape == (2, 3, 4, 4, 4)
    assert SeqAvgPool(2).apply({}, x).shape == (2, 3, 4, 4, 4)


def test_seq_dropout_frozen_mask():
    x = jnp.ones((4, 2, 16))
    drop = SeqDropout(rate=0.5)
    y = drop.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    # mask is identical across the T axis
    for t in range(1, 4):
        np.testing.assert_array_equal(y[t], y[0])
    # deterministic mode = identity
    y2 = drop.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(x))


def test_voting_layer():
    x = jnp.arange(20.0).reshape(1, 20)
    v = VotingLayer(voting_size=10).apply({}, x)
    assert v.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(v)[0], [4.5, 14.5])


def test_spiking_vgg_forward():
    m = zoo.SpikingVGG(cfg=(8, "M", 16, "M"), num_classes=10, backend="scan")
    x = jnp.zeros((2, 2, 28, 28, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    logits, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 10)


def test_spiking_resnet_and_sew():
    x = jnp.zeros((2, 2, 16, 16, 1))
    for sew in (None, "ADD", "AND", "IAND"):
        m = zoo.SpikingResNet(stages=(1, 1), width=8, num_classes=5,
                              backend="scan", sew=sew)
        variables = m.init(jax.random.PRNGKey(0), x, train=True)
        logits, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert logits.shape == (2, 5), sew
        assert np.isfinite(np.asarray(logits)).all()


def test_plif_net():
    m = zoo.PLIFNet(channels=8, num_classes=10, voting_size=2)
    x = jnp.zeros((2, 2, 28, 28, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    # learnable tau params exist
    assert "plif_w_0" in variables["params"]
    logits, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 10)


def test_train_classifier_learns():
    from spiking_diffusion_tpu.data import synthetic_dataset

    ds = synthetic_dataset("MNIST", n_train=256, n_test=64, seed=1)
    m = zoo.SpikingVGG(cfg=(8, "M", 8, "M"), num_classes=10, backend="scan")
    variables, acc = zoo.train_classifier(
        m, ds.train_images, ds.train_labels, num_steps=2, epochs=6,
        batch_size=64,
    )
    assert acc > 0.2, acc  # well above 0.1 chance


def test_ann2snn_conversion_accuracy():
    # ANN: conv-relu-flatten-dense-relu-dense; SNN rate approximation must
    # track the ANN output ordering on most samples
    rng = np.random.RandomState(0)
    specs = [
        ("conv", {"stride": 1, "padding": 1}),
        ("relu",),
        ("pool", 2),
        ("flatten",),
        ("dense", {}),
        ("relu",),
        ("dense", {}),
    ]
    params = [
        {"kernel": jnp.asarray(rng.randn(3, 3, 1, 4).astype(np.float32) * 0.3),
         "bias": jnp.zeros(4)},
        None,
        None,
        None,
        {"kernel": jnp.asarray(rng.randn(4 * 7 * 7, 16).astype(np.float32) * 0.1),
         "bias": jnp.zeros(16)},
        None,
        {"kernel": jnp.asarray(rng.randn(16, 5).astype(np.float32) * 0.3),
         "bias": jnp.zeros(5)},
    ]
    x = jnp.asarray(rng.rand(8, 14, 14, 1).astype(np.float32))
    y_ann = ann2snn.ann_forward(specs, params, x)

    snn_fn, scales = ann2snn.convert(specs, params, x, num_steps=64)
    y_snn = snn_fn(x)
    assert y_snn.shape == y_ann.shape
    assert sum(s is not None for s in scales) == 2
    # argmax agreement on most samples (rate approximation)
    agree = (np.asarray(y_ann).argmax(1) == np.asarray(y_snn).argmax(1)).mean()
    assert agree >= 0.6, agree


def test_visualizing_helpers(tmp_path):
    from spiking_diffusion_tpu.utils import visualizing as V

    s = (np.random.RandomState(0).rand(16, 8) < 0.3).astype(np.float32)
    v = np.random.RandomState(1).randn(16, 8).astype(np.float32)
    V.plot_1d_spikes(s, save_path=str(tmp_path / "raster.png"))
    V.plot_2d_heatmap(v, save_path=str(tmp_path / "heat.png"))
    V.plot_2d_feature_map(
        np.random.RandomState(2).rand(6, 7, 7), save_path=str(tmp_path / "fm.png")
    )
    V.plot_one_neuron_v_s(v[:, 0], s[:, 0], save_path=str(tmp_path / "vs.png"))
    for f in ("raster.png", "heat.png", "fm.png", "vs.png"):
        assert (tmp_path / f).exists()
