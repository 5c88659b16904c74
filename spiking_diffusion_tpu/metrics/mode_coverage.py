"""Mode-coverage evaluation: classify generated samples, histogram the
predicted classes, and report KL(uniform || histogram).

Parity target: ``Spiking-Diffusion-release/classify.py:106-127`` — a LeNet
trained on the real dataset classifies generated images; an even class
histogram (low KL vs uniform) indicates the generator covers all modes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from spiking_diffusion_tpu.metrics.features import FeatureFn


def class_histogram(
    feature_fn: FeatureFn, images: np.ndarray, num_classes: int
) -> np.ndarray:
    """Predicted-class counts over generated images."""
    _, probs = feature_fn(images)
    preds = probs.argmax(axis=1)
    return np.bincount(preds, minlength=num_classes).astype(np.float64)


def mode_coverage_kl(
    feature_fn: FeatureFn, images: np.ndarray, num_classes: int
) -> Dict[str, object]:
    """KL(uniform || empirical class histogram) + the histogram itself.

    Matches ``classify.py:119-127``: hist normalized to probabilities,
    KL = sum_c (1/C) * log((1/C) / p_c).
    """
    hist = class_histogram(feature_fn, images, num_classes)
    p = hist / max(hist.sum(), 1.0)
    u = 1.0 / num_classes
    kl = float(np.sum(u * (np.log(u) - np.log(np.maximum(p, 1e-12)))))
    covered = int((hist > 0).sum())
    return {"kl": kl, "histogram": hist, "covered_modes": covered}
