"""CLI smoke test: the full main.py-parity driver at toy scale."""

import json
import os

import numpy as np
import pytest

from spiking_diffusion_tpu import cli


def test_cli_parse_defaults():
    args = cli.parse_args([])
    assert args.dataset_name == "MNIST"
    assert args.model == "snn-vq-vae"
    assert args.codebook_size == 128
    assert args.mask == "codebook_size"


def test_cli_rejects_unknown_model():
    with pytest.raises(SystemExit):
        cli.parse_args(["--model", "bogus"])


@pytest.mark.slow
def test_cli_end_to_end_tiny(tmp_path, monkeypatch):
    # tiny synthetic run exercising: stage-1 train + grids + checkpoints,
    # index extraction, mask_id, stage-2 train, temperature sweep, metrics
    monkeypatch.setattr(cli, "TEMPERATURES", [0.5, 1.0])
    from spiking_diffusion_tpu.data import datasets as dsmod

    # shrink the synthetic dataset for speed
    orig = dsmod.synthetic_dataset

    def small_synth(name, n_train=2048, n_test=512, **kw):
        kw.pop("num_classes", None)
        return orig(name, n_train=128, n_test=64, num_classes=10)

    monkeypatch.setattr(dsmod, "synthetic_dataset", small_synth)

    cli.main([
        "--dataset_name", "MNIST",
        "--model", "snn-vq-vae",
        "--epochs", "1",
        "--num_steps", "2",
        "--codebook_size", "8",
        "--batch_size", "16",
        "--lif_backend", "scan",
        "--sample_batches", "2",
        "--grid_batches", "1",
        "--syops",
        "--result_dir", str(tmp_path / "result"),
        "--sample_dir", str(tmp_path / "sample"),
    ])

    res = tmp_path / "result" / "MNIST" / "snn-vq-vae"
    assert (res / "epoch=0_test.png").exists()
    assert (res / "model").is_dir()  # orbax checkpoint
    assert (res / "diff_result" / "diff_model").is_dir()
    samp = tmp_path / "sample" / "MNIST" / "snn-vq-vae"
    metrics = json.loads((samp / "metrics.json").read_text())
    assert set(metrics) == {"0.5", "1.0", "null_FID", "feature_space"}
    assert np.isfinite(metrics["null_FID"])
    for temp in ("0.5", "1.0"):
        entry = metrics[temp]
        assert "IS" in entry and "FID" in entry and "KID_x1e3" in entry
        assert np.isfinite(entry["FID"])
