"""Data layer: MNIST-family loaders as pure-numpy IDX readers.

TPU-native equivalent of ``Spiking-Diffusion-release/load_dataset_snn.py``
(torchvision loaders): datasets are loaded once into host RAM as numpy
arrays (a few tens of MB) and batched with a lightweight shuffling iterator
— there is no per-worker process pool because there is no per-item decode
work; images go to the device as whole batches.

When the raw IDX files are absent (this build environment has no network
egress), ``load_dataset(..., synthetic_ok=True)`` falls back to a
deterministic procedurally-generated digit-like dataset with the same
shapes/dtypes, which keeps training, benchmarking, and tests runnable
anywhere. Real runs point ``data_path`` at standard MNIST-layout IDX files.
"""

from spiking_diffusion_tpu.data.datasets import (
    Dataset,
    batch_iterator,
    data_variance,
    load_dataset,
    synthetic_dataset,
)
from spiking_diffusion_tpu.data.extra_datasets import (
    load_celeba,
    load_cifar10,
    load_mnist_c,
    load_notmnist,
    mnist_square,
)
from spiking_diffusion_tpu.data.audio import SpeechCommands, load_wav
from spiking_diffusion_tpu.data.neuromorphic import (
    CIFAR10DVS,
    DVS128Gesture,
    EventDatasetFolder,
    NMNIST,
    integrate_by_fixed_duration,
    integrate_by_fixed_frames,
    load_aedat_v3,
    load_atis_bin,
    load_jaer_dat,
)

__all__ = [
    "Dataset",
    "batch_iterator",
    "data_variance",
    "load_dataset",
    "synthetic_dataset",
    "load_celeba",
    "load_cifar10",
    "load_mnist_c",
    "load_notmnist",
    "mnist_square",
    "CIFAR10DVS",
    "DVS128Gesture",
    "EventDatasetFolder",
    "NMNIST",
    "integrate_by_fixed_duration",
    "integrate_by_fixed_frames",
    "load_aedat_v3",
    "load_atis_bin",
    "load_jaer_dat",
    "SpeechCommands",
    "load_wav",
]
