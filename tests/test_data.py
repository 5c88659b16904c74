"""Data layer tests: synthetic generator, batch iterator, IDX parsing."""

import gzip
import os
import struct

import numpy as np

from spiking_diffusion_tpu.data import (
    batch_iterator,
    data_variance,
    load_dataset,
    synthetic_dataset,
)
from spiking_diffusion_tpu.data.datasets import _read_idx


def test_synthetic_shapes_and_range():
    ds = synthetic_dataset("MNIST", n_train=32, n_test=8)
    assert ds.train_images.shape == (32, 28, 28, 1)
    assert ds.test_images.shape == (8, 28, 28, 1)
    assert ds.train_images.dtype == np.float32
    assert 0.0 <= ds.train_images.min() and ds.train_images.max() <= 1.0
    assert ds.train_labels.shape == (32,)
    assert ds.synthetic


def test_synthetic_deterministic():
    a = synthetic_dataset("MNIST", n_train=8, n_test=2, seed=5)
    b = synthetic_dataset("MNIST", n_train=8, n_test=2, seed=5)
    np.testing.assert_array_equal(a.train_images, b.train_images)


def test_synthetic_class_structure():
    # images of the same class should correlate more than across classes
    ds = synthetic_dataset("MNIST", n_train=256, n_test=8, seed=1)
    x = ds.train_images.reshape(256, -1)
    y = ds.train_labels
    c0 = x[y == 0]
    c1 = x[y == 1]
    if len(c0) > 2 and len(c1) > 2:
        within = np.corrcoef(c0[0], c0[1])[0, 1]
        across = np.corrcoef(c0[0], c1[0])[0, 1]
        assert within > across


def test_load_dataset_falls_back_to_synthetic():
    ds = load_dataset("MNIST", data_path="/nonexistent", synthetic_ok=True,
                      synthetic_size=(16, 4))
    assert ds.synthetic
    assert ds.train_images.shape[0] == 16


def test_load_dataset_unknown_name():
    import pytest

    with pytest.raises(ValueError):
        load_dataset("CIFAR-100")


def test_data_variance():
    x = np.zeros((10, 2, 2, 1), np.float32)
    x[5:] = 1.0
    assert abs(data_variance(x) - 0.25) < 1e-6


def test_batch_iterator_deterministic_and_complete():
    x = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1)
    b1 = list(batch_iterator(x, 3, seed=1, epoch=0))
    b2 = list(batch_iterator(x, 3, seed=1, epoch=0))
    assert len(b1) == 3  # drop remainder
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    b3 = list(batch_iterator(x, 3, seed=1, epoch=1))
    assert any((a != b).any() for a, b in zip(b1, b3))


def test_read_idx_roundtrip(tmp_path):
    # write a small IDX3 file (and gz) and read back
    data = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    raw = struct.pack(">HBB", 0, 8, 3) + struct.pack(">III", 2, 3, 4) + data.tobytes()
    p = tmp_path / "test-idx3"
    p.write_bytes(raw)
    out = _read_idx(str(p))
    np.testing.assert_array_equal(out, data)
    pz = tmp_path / "test-idx3.gz"
    with gzip.open(pz, "wb") as f:
        f.write(raw)
    np.testing.assert_array_equal(_read_idx(str(pz)), data)


def test_load_real_idx_layout(tmp_path):
    # fabricate an MNIST-layout directory and load it
    def idx3(images):
        n, h, w = images.shape
        return (struct.pack(">HBB", 0, 8, 3)
                + struct.pack(">III", n, h, w) + images.tobytes())

    def idx1(labels):
        return (struct.pack(">HBB", 0, 8, 1)
                + struct.pack(">I", len(labels)) + labels.tobytes())

    raw_dir = tmp_path / "MNIST" / "raw"
    os.makedirs(raw_dir)
    tri = np.random.RandomState(0).randint(0, 255, (8, 28, 28)).astype(np.uint8)
    tei = np.random.RandomState(1).randint(0, 255, (4, 28, 28)).astype(np.uint8)
    trl = np.arange(8, dtype=np.uint8) % 10
    tel = np.arange(4, dtype=np.uint8) % 10
    (raw_dir / "train-images-idx3-ubyte").write_bytes(idx3(tri))
    (raw_dir / "train-labels-idx1-ubyte").write_bytes(idx1(trl))
    (raw_dir / "t10k-images-idx3-ubyte").write_bytes(idx3(tei))
    (raw_dir / "t10k-labels-idx1-ubyte").write_bytes(idx1(tel))

    ds = load_dataset("MNIST", data_path=str(tmp_path), synthetic_ok=False)
    assert not ds.synthetic
    assert ds.train_images.shape == (8, 28, 28, 1)
    assert ds.train_images.max() <= 1.0
    np.testing.assert_array_equal(ds.train_labels, trl)
