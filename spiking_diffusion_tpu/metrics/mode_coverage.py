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


def per_class_grids(
    feature_fn: FeatureFn,
    images: np.ndarray,
    num_classes: int,
    out_dir: str,
    max_per_class: int = 32,
) -> Dict[int, str]:
    """Save one sample grid per predicted class.

    Parity: ``classify.py:129-156`` — group generated images by the
    classifier's prediction and write a grid for each class. Returns
    {class: png_path} for classes with at least one sample.
    """
    import os

    from spiking_diffusion_tpu.utils.grids import save_image_grid

    _, probs = feature_fn(images)
    preds = probs.argmax(axis=1)
    paths: Dict[int, str] = {}
    os.makedirs(out_dir, exist_ok=True)
    for c in range(num_classes):
        members = images[preds == c][:max_per_class]
        if len(members) == 0:
            continue
        rows = max(1, -(-len(members) // 8))
        path = os.path.join(out_dir, f"class_{c}.png")
        # images arrive in [0, 1]; grid saver expects [-0.5, 0.5]
        save_image_grid(members - 0.5, path, rows=rows, cols=8)
        paths[c] = path
    return paths


def paper_montage(
    feature_fn: FeatureFn,
    images: np.ndarray,
    num_classes: int,
    out_path: str,
    per_class: int = 1,
) -> str:
    """One-per-class showcase montage — the automated stand-in for the
    reference's HAND-picked paper figure (``classify.py:158-184`` selects
    per-class sample indices by eye); here the classifier's own
    max-confidence sample per class is chosen, which reproduces the
    "best-looking representative per mode" intent without a human in the
    loop. Classes with no confident sample fall back to the highest
    available probability.
    """
    import os

    from spiking_diffusion_tpu.utils.grids import save_image_grid

    _, probs = feature_fn(images)
    chosen = []
    for c in range(num_classes):
        order = np.argsort(-probs[:, c])[:per_class]
        chosen.append(images[order])
    montage = np.concatenate(chosen, axis=0)
    rows = max(1, -(-len(montage) // 5))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    # images arrive in [0, 1]; grid saver expects [-0.5, 0.5]
    save_image_grid(montage - 0.5, out_path, rows=rows, cols=5)
    return out_path


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
