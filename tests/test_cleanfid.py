"""clean-fid-equivalent module: resize correctness, scoring, stats registry."""

import numpy as np
import pytest

from spiking_diffusion_tpu.metrics import cleanfid


def _fake_feature_fn(images):
    # deterministic cheap features: channel means over coarse blocks
    x = np.asarray(images, np.float32)
    if x.max(initial=0.0) > 1.5:
        x = x / 255.0
    n = x.shape[0]
    f = x.reshape(n, 4, x.shape[1] // 4, 4, x.shape[2] // 4, -1).mean(
        axis=(2, 4, 5)
    )
    return f.reshape(n, -1)


def test_clean_resize_shapes_and_ranges():
    u8 = np.random.RandomState(0).randint(0, 256, (3, 28, 28, 1), np.uint8)
    out = np.asarray(cleanfid.clean_resize(u8))
    assert out.shape == (3, 299, 299, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    f01 = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    out2 = np.asarray(cleanfid.clean_resize(f01))
    assert out2.shape == (2, 299, 299, 3)


def test_clean_resize_antialiases():
    """On an aliasing-prone checkerboard, the anti-aliased resize must
    differ from naive bilinear (the whole point of clean-fid)."""
    import jax

    cb = (np.indices((64, 64)).sum(axis=0) % 2).astype(np.float32)
    img = np.repeat(cb[None, ..., None], 3, axis=-1)  # (1, 64, 64, 3)
    clean = np.asarray(cleanfid.clean_resize(img, size=16))
    naive = np.asarray(
        jax.image.resize(
            np.asarray(img), (1, 16, 16, 3), method="nearest"
        )
    )
    assert np.abs(clean - naive).mean() > 0.05


def test_compute_fid_zero_for_identical_sets():
    imgs = np.random.RandomState(2).rand(64, 28, 28, 1).astype(np.float32)
    fid = cleanfid.compute_fid(imgs, imgs, feature_fn=_fake_feature_fn)
    assert fid < 1e-6


def test_compute_fid_orders_similarity():
    rng = np.random.RandomState(3)
    a = rng.rand(64, 28, 28, 1).astype(np.float32)
    near = np.clip(a + rng.normal(0, 0.02, a.shape).astype(np.float32), 0, 1)
    far = rng.rand(64, 28, 28, 1).astype(np.float32) ** 3  # different dist
    f_near = cleanfid.compute_fid(a, near, feature_fn=_fake_feature_fn)
    f_far = cleanfid.compute_fid(a, far, feature_fn=_fake_feature_fn)
    assert f_near < f_far


def test_stats_registry_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    real = rng.rand(64, 28, 28, 1).astype(np.float32)
    gen = rng.rand(32, 28, 28, 1).astype(np.float32)
    root = str(tmp_path)
    cleanfid.save_stats(real, _fake_feature_fn, "testset", root=root)
    assert cleanfid.list_stats(root) == ["testset"]
    stats = cleanfid.load_stats("testset", root=root)
    via_stats = cleanfid.compute_fid(
        images1=gen, feature_fn=_fake_feature_fn, stats2=stats
    )
    direct = cleanfid.compute_fid(gen, real, feature_fn=_fake_feature_fn)
    np.testing.assert_allclose(via_stats, direct, rtol=1e-6)


def test_feature_fn_requires_model():
    with pytest.raises(ValueError):
        cleanfid.make_clean_feature_fn()
