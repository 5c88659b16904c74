"""Produce the committed frozen metric feature spaces (one per dataset).

Canonical protocol (any change here invalidates committed assets — bump
``metrics.frozen.FREEZE_SEED`` deliberately):

  * dataset at canonical sizes: 60,000 train / 10,240 test (real IDX
    files are used when present; otherwise the deterministic per-name
    synthetic fallback — the same data every flagship run trains on);
  * LeNet (``classify.py:18-54`` geometry) trained 5 epochs, Adam 1e-3,
    seed ``FREEZE_SEED`` — deterministic init + epoch permutations;
  * committed artifacts: ``metrics/assets/lenet_<name>.npz`` (the space)
    and ``stats_<name>.npz`` (mu/sigma of the canonical 8,192-image real
    reference set + its data sha, the "reproducible to the digit" anchor).

Usage::

    python scripts/freeze_metric_space.py [DATASET ...]
"""

import sys

sys.path.insert(0, ".")

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.data import load_dataset
from spiking_diffusion_tpu.metrics.frozen import (
    FREEZE_EPOCHS,
    FREEZE_SEED,
    freeze_feature_space,
)

CANONICAL_SIZES = (60000, 10240)
DATASETS = ["MNIST", "KMNIST", "FMNIST", "Letters", "CIFAR10-BW", "CIFAR10"]


def main(names):
    for name in names:
        ds = load_dataset(name, synthetic_size=CANONICAL_SIZES)
        print(f"freezing {name}: train={ds.train_images.shape} "
              f"synthetic={ds.synthetic} classes={ds.num_classes}")
        out = freeze_feature_space(
            name, ds.train_images, ds.train_labels, ds.test_images,
            ds.num_classes, epochs=FREEZE_EPOCHS, seed=FREEZE_SEED,
        )
        print(f"  -> {out['space_sha'][:16]}")


if __name__ == "__main__":
    main(sys.argv[1:] or DATASETS)
