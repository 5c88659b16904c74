"""clean-fid-equivalent scoring: anti-aliased resize + cached stats.

The reference vendors GaParmar/clean-fid (``metric/cleanfid/``, ~1.4 kLoC)
but never wires it (it imports the top-level ``cleanfid`` package and is
dead code — SURVEY.md §2a). The *capability* it exists to provide is:

1. a correctly anti-aliased float resize to 299x299 before feature
   extraction (``metric/cleanfid/resize.py`` — naive nearest/bilinear
   resizing of uint8 images is the main source of FID irreproducibility
   the clean-fid paper identifies);
2. an InceptionV3 feature space (``inception_pytorch.py`` /
   ``inception_torchscript.py``);
3. cached/named reference statistics so scores are comparable across runs
   (``downloads_helper.py`` — here a LOCAL store: this environment has no
   egress, and pinning stats to files is the reproducible version anyway).

This module provides all three TPU-natively: Lanczos anti-aliased resize
on device, the numerically-proven flax InceptionV3
(:mod:`spiking_diffusion_tpu.metrics.inception`, FID configuration), and
an npz-based stats registry.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.metrics.scores import (
    frechet_distance,
    gaussian_stats,
)

FeatureFn = Callable[[np.ndarray], np.ndarray]


def clean_resize(images: np.ndarray, size: int = 299) -> jax.Array:
    """Anti-aliased float resize — the clean-fid correctness fix.

    (N, H, W, 1|3) uint8 or [0,1] float -> (N, size, size, 3) float32 in
    [0, 1]. Resizing happens in float with a Lanczos-3 kernel and
    anti-aliasing enabled (``metric/cleanfid/resize.py`` uses PIL bicubic
    on float; Lanczos-3 is the same family of windowed-sinc filters and
    equally alias-free).
    """
    x = jnp.asarray(images, jnp.float32)
    if x.ndim == 3:
        x = x[..., None]
    if float(np.asarray(x).max(initial=0.0)) > 1.5:
        x = x / 255.0
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    out = jax.image.resize(
        x, (x.shape[0], size, size, 3), method="lanczos3", antialias=True
    )
    return jnp.clip(out, 0.0, 1.0)


def make_clean_feature_fn(
    model=None, variables=None, batch_size: int = 64
) -> FeatureFn:
    """images -> (N, 2048) Inception features with clean resizing.

    ``model``/``variables`` default to a feature extractor built from
    :func:`metrics.inception.load_torch_weights_npz` output; pass the
    loaded pair explicitly (weights are environment-provided, see
    scripts/convert_inception_weights.py).
    """
    if model is None or variables is None:
        raise ValueError(
            "pass (model, variables) from "
            "metrics.inception.load_torch_weights_npz / "
            "load_converted_weights"
        )

    @jax.jit
    def fwd(x):
        feats, _ = model.apply(
            variables, x * 2.0 - 1.0, train=False, transform_input=True
        )
        return feats

    def fn(images: np.ndarray) -> np.ndarray:
        n = images.shape[0]
        out = []
        for i in range(0, n, batch_size):
            xb = clean_resize(images[i : i + batch_size])
            out.append(np.asarray(fwd(xb)))
        return np.concatenate(out)[:n]

    return fn


def compute_fid(
    images1: Optional[np.ndarray] = None,
    images2: Optional[np.ndarray] = None,
    feature_fn: Optional[FeatureFn] = None,
    stats1: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    stats2: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> float:
    """clean-fid's ``compute_fid``: images and/or precomputed stats.

    Each side is either an image array (run through ``feature_fn``) or a
    precomputed (mu, sigma) pair (e.g. from :func:`load_stats`).
    """
    def side(images, stats):
        if stats is not None:
            return stats
        if images is None:
            raise ValueError("need images or stats for each side")
        if feature_fn is None:
            raise ValueError("feature_fn required when passing images")
        return gaussian_stats(feature_fn(images))

    mu1, s1 = side(images1, stats1)
    mu2, s2 = side(images2, stats2)
    return float(frechet_distance(mu1, s1, mu2, s2))


# ---------------------------------------------------------------------------
# local named-stats registry (the no-egress replacement for clean-fid's
# downloads_helper: stats are produced once and pinned to disk)
# ---------------------------------------------------------------------------

def _stats_path(root: str, name: str) -> str:
    return os.path.join(root, f"cleanfid_stats_{name}.npz")


def save_stats(
    images: np.ndarray, feature_fn: FeatureFn, name: str,
    root: str = "./cleanfid_stats",
) -> str:
    """Compute and pin named reference statistics (mu, sigma)."""
    os.makedirs(root, exist_ok=True)
    mu, sigma = gaussian_stats(feature_fn(images))
    path = _stats_path(root, name)
    np.savez(path, mu=mu, sigma=sigma, n=images.shape[0])
    return path


def load_stats(
    name: str, root: str = "./cleanfid_stats"
) -> Tuple[np.ndarray, np.ndarray]:
    data = np.load(_stats_path(root, name))
    return data["mu"], data["sigma"]


def list_stats(root: str = "./cleanfid_stats"):
    if not os.path.isdir(root):
        return []
    pre, suf = "cleanfid_stats_", ".npz"
    return sorted(
        f[len(pre):-len(suf)]
        for f in os.listdir(root)
        if f.startswith(pre) and f.endswith(suf)
    )
