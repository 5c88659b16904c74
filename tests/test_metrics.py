"""Metric suite tests: SSIM, FID, IS, KID, LeNet features, mode coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.metrics import (
    frechet_distance,
    gaussian_stats,
    inception_score_from_probs,
    kid_from_features,
    ssim,
)
from spiking_diffusion_tpu.metrics.scores import fid_from_features


def test_ssim_identical_images():
    img = jnp.asarray(np.random.RandomState(0).rand(4, 28, 28, 1).astype(np.float32))
    assert float(ssim(img, img)) > 0.999


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(4, 28, 28, 1).astype(np.float32))
    noisy1 = img + 0.05 * jnp.asarray(rng.randn(4, 28, 28, 1).astype(np.float32))
    noisy2 = img + 0.5 * jnp.asarray(rng.randn(4, 28, 28, 1).astype(np.float32))
    s1, s2 = float(ssim(img, noisy1)), float(ssim(img, noisy2))
    assert s1 > s2
    assert -1.0 <= s2 <= 1.0


def test_frechet_distance_zero_for_same():
    rng = np.random.RandomState(2)
    feats = rng.randn(500, 16)
    mu, sigma = gaussian_stats(feats)
    d = frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-6


def test_frechet_distance_mean_shift():
    rng = np.random.RandomState(3)
    a = rng.randn(2000, 8)
    b = rng.randn(2000, 8) + 2.0
    d = fid_from_features(a, b)
    # |mu diff|^2 = 8 * 4 = 32 (cov terms ~0)
    assert 28 < d < 36


def test_frechet_distance_positive_and_symmetricish():
    rng = np.random.RandomState(4)
    a = rng.randn(1000, 4)
    b = 2.0 * rng.randn(1000, 4)
    d1 = fid_from_features(a, b)
    d2 = fid_from_features(b, a)
    assert d1 > 0
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_inception_score_bounds():
    # perfectly confident uniform-over-classes predictions -> IS = C
    n, c = 400, 10
    probs = np.zeros((n, c))
    probs[np.arange(n), np.arange(n) % c] = 1.0
    is_mean, is_std = inception_score_from_probs(probs, splits=4)
    assert abs(is_mean - c) < 1e-6
    # uniform probs -> IS = 1
    probs2 = np.full((n, c), 1.0 / c)
    is2, _ = inception_score_from_probs(probs2, splits=4)
    assert abs(is2 - 1.0) < 1e-6


def test_kid_zero_for_same_distribution():
    rng = np.random.RandomState(5)
    a = rng.randn(600, 8)
    b = rng.randn(600, 8)
    kid, _ = kid_from_features(a, b, subsets=10, subset_size=200)
    assert abs(kid) < 0.05
    c = rng.randn(600, 8) + 1.5
    kid2, _ = kid_from_features(a, c, subsets=10, subset_size=200)
    assert kid2 > kid + 0.5


def test_kid_unit_normalize_is_scale_invariant_and_readable():
    rng = np.random.RandomState(7)
    a = rng.randn(600, 8)
    b = rng.randn(600, 8)
    c = rng.randn(600, 8) + 1.5
    # LeNet-scale features (x100): raw kernel explodes, unit mode doesn't
    kid_raw, _ = kid_from_features(a * 100, c * 100, subsets=10,
                                   subset_size=200)
    assert kid_raw > 1e3  # the r4 illegibility failure mode
    kid_same, _ = kid_from_features(a * 100, b * 100, subsets=10,
                                    subset_size=200, normalize="unit")
    kid_diff, _ = kid_from_features(a * 100, c * 100, subsets=10,
                                    subset_size=200, normalize="unit")
    assert abs(kid_same) < 0.05
    assert 0.01 < kid_diff < 8.0  # bounded kernel -> readable range
    # invariant to global feature scale
    kid_diff_s, _ = kid_from_features(a, c, subsets=10, subset_size=200,
                                      normalize="unit")
    assert abs(kid_diff - kid_diff_s) < 1e-9


def test_lenet_trains_and_extracts():
    from spiking_diffusion_tpu.data import synthetic_dataset
    from spiking_diffusion_tpu.metrics.features import (
        lenet_feature_fn,
        train_lenet,
    )

    ds = synthetic_dataset("MNIST", n_train=512, n_test=128, seed=0)
    model, params = train_lenet(
        ds.train_images, ds.train_labels, ds.num_classes, epochs=20
    )
    fn = lenet_feature_fn(model, params)
    feats, probs = fn(ds.test_images)
    assert feats.shape == (128, 84)
    assert probs.shape == (128, 10)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
    # the synthetic classes are separable enough to beat chance easily
    acc = (probs.argmax(1) == ds.test_labels).mean()
    assert acc > 0.3, acc


def test_mode_coverage():
    from spiking_diffusion_tpu.metrics.mode_coverage import mode_coverage_kl

    def fake_fn(images):
        n = len(images)
        probs = np.zeros((n, 4))
        probs[np.arange(n), np.arange(n) % 4] = 1.0
        return np.zeros((n, 8)), probs

    out = mode_coverage_kl(fake_fn, np.zeros((100, 28, 28, 1)), 4)
    assert out["covered_modes"] == 4
    assert out["kl"] < 1e-3

    def collapsed_fn(images):
        n = len(images)
        probs = np.zeros((n, 4))
        probs[:, 0] = 1.0
        return np.zeros((n, 8)), probs

    out2 = mode_coverage_kl(collapsed_fn, np.zeros((100, 28, 28, 1)), 4)
    assert out2["covered_modes"] == 1
    assert out2["kl"] > 1.0


def test_per_class_grids(tmp_path):
    from spiking_diffusion_tpu.metrics.mode_coverage import per_class_grids

    def fake_fn(images):
        n = len(images)
        probs = np.zeros((n, 4))
        probs[np.arange(n), np.arange(n) % 4] = 1.0
        return np.zeros((n, 8)), probs

    imgs = np.random.RandomState(0).rand(20, 28, 28, 1).astype(np.float32)
    paths = per_class_grids(fake_fn, imgs, 4, str(tmp_path))
    assert set(paths) == {0, 1, 2, 3}
    import os

    for p in paths.values():
        assert os.path.exists(p)


def test_paper_montage(tmp_path):
    from spiking_diffusion_tpu.metrics.mode_coverage import paper_montage

    rng = np.random.RandomState(0)
    imgs = rng.rand(40, 28, 28, 1).astype(np.float32)

    def fake_fn(x, **kw):
        n = x.shape[0]
        probs = rng.rand(n, 4).astype(np.float32)
        probs /= probs.sum(1, keepdims=True)
        return np.zeros((n, 8), np.float32), probs

    out = paper_montage(fake_fn, imgs, 4, str(tmp_path / "m.png"),
                        per_class=2)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0
