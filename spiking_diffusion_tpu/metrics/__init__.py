"""Evaluation suite: SSIM, FID, IS, KID, mode-coverage.

Rebuilds the reference metric layer (``Spiking-Diffusion-release/metric/``
+ torchmetrics KID + ``classify.py``) in JAX/numpy:

  * :mod:`ssim` — Gaussian-window SSIM (window 11), parity with
    ``metric/pytorch_ssim``.
  * :mod:`scores` — Fréchet distance, Inception Score math, KID polynomial-
    kernel MMD. All operate on feature/logit arrays and are extractor-
    agnostic.
  * :mod:`features` — feature extractors: a flax InceptionV3 (weights
    loadable from a local converted checkpoint; this environment cannot
    download the torchvision weights) and a trainable LeNet fallback.
  * :mod:`mode_coverage` — LeNet-based class-histogram KL eval
    (parity with ``classify.py``).
"""

from spiking_diffusion_tpu.metrics.ssim import ssim
from spiking_diffusion_tpu.metrics.scores import (
    frechet_distance,
    gaussian_stats,
    inception_score_from_probs,
    kid_from_features,
)

__all__ = [
    "ssim",
    "frechet_distance",
    "gaussian_stats",
    "inception_score_from_probs",
    "kid_from_features",
]
