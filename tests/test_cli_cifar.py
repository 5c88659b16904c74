"""CIFAR10(-BW) CLI wiring (VERDICT #8): the paper's CIFAR10 baseline row
(``Readme.md:5``) is exercisable end-to-end, including the 3-channel path
the reference's loader produces (``load_dataset_snn.py:69-94``)."""

import json

import numpy as np
import pytest

from spiking_diffusion_tpu import cli
from spiking_diffusion_tpu.data import load_dataset


def test_cifar_dataset_names_parse():
    assert cli.parse_args(["--dataset_name", "CIFAR10"]).dataset_name == "CIFAR10"
    assert (
        cli.parse_args(["--dataset_name", "CIFAR10-BW"]).dataset_name
        == "CIFAR10-BW"
    )


def test_load_dataset_cifar_shapes():
    ds_bw = load_dataset("CIFAR10-BW")
    assert ds_bw.train_images.shape[1:] == (28, 28, 1)
    ds = load_dataset("CIFAR10")
    assert ds.train_images.shape[1:] == (28, 28, 3)
    assert ds.num_classes == 10


@pytest.mark.slow
def test_cli_cifar10_color_end_to_end_tiny(tmp_path, monkeypatch):
    """Full two-stage pipeline on 3-channel 28x28 input at toy scale."""
    monkeypatch.setattr(cli, "TEMPERATURES", [1.0])
    from spiking_diffusion_tpu.data import datasets as dsmod

    orig = dsmod.synthetic_dataset

    def small_synth(name, n_train=2048, n_test=512, **kw):
        kw.pop("num_classes", None)
        return orig(name, n_train=96, n_test=48, num_classes=10)

    monkeypatch.setattr(dsmod, "synthetic_dataset", small_synth)

    cli.main([
        "--dataset_name", "CIFAR10",
        "--model", "snn-vq-vae",
        "--epochs", "1",
        "--num_steps", "2",
        "--codebook_size", "8",
        "--batch_size", "16",
        "--lif_backend", "scan",
        "--sample_batches", "1",
        "--grid_batches", "1",
        "--result_dir", str(tmp_path / "result"),
        "--sample_dir", str(tmp_path / "sample"),
    ])

    res = tmp_path / "result" / "CIFAR10" / "snn-vq-vae"
    assert (res / "epoch=0_test.png").exists()
    assert (res / "diff_result" / "diff_model").is_dir()
    metrics = json.loads(
        (tmp_path / "sample" / "CIFAR10" / "snn-vq-vae" / "metrics.json")
        .read_text()
    )
    assert np.isfinite(metrics["1.0"]["FID"])
