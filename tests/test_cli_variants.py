"""CLI branch coverage: snn-vae and vq-vae end-to-end at toy scale."""

import numpy as np
import pytest

from spiking_diffusion_tpu import cli


@pytest.fixture
def tiny_data(monkeypatch):
    from spiking_diffusion_tpu.data import datasets as dsmod

    orig = dsmod.synthetic_dataset

    def small(name, n_train=2048, n_test=512, **kw):
        kw.pop("num_classes", None)
        return orig(name, n_train=96, n_test=64, num_classes=10)

    monkeypatch.setattr(dsmod, "synthetic_dataset", small)


@pytest.mark.slow
def test_cli_snn_vae_branch(tmp_path, tiny_data):
    cli.main([
        "--dataset_name", "MNIST", "--model", "snn-vae",
        "--epochs", "1", "--num_steps", "2", "--batch_size", "16",
        "--lif_backend", "scan",
        "--result_dir", str(tmp_path / "result"),
        "--sample_dir", str(tmp_path / "sample"),
    ])
    res = tmp_path / "result" / "MNIST" / "snn-vae"
    assert (res / "model").is_dir()
    assert (tmp_path / "sample" / "MNIST" / "snn-vae" / "image.png").exists()


@pytest.mark.slow
def test_cli_ann_vqvae_branch(tmp_path, tiny_data, monkeypatch):
    monkeypatch.setattr(cli, "TEMPERATURES", [0.8])
    cli.main([
        "--dataset_name", "MNIST", "--model", "vq-vae",
        "--epochs", "1", "--num_steps", "2", "--codebook_size", "8",
        "--batch_size", "16", "--sample_batches", "2", "--grid_batches", "1",
        "--result_dir", str(tmp_path / "result"),
        "--sample_dir", str(tmp_path / "sample"),
    ])
    import json

    res = tmp_path / "result" / "MNIST" / "vq-vae"
    assert (res / "model").is_dir()
    assert (res / "diff_result" / "diff_model").is_dir()
    metrics = json.loads(
        (tmp_path / "sample" / "MNIST" / "vq-vae" / "metrics.json").read_text()
    )
    assert "0.8" in metrics
    assert np.isfinite(metrics["0.8"]["FID"])


@pytest.mark.slow
def test_cli_ready_path(tmp_path, tiny_data, monkeypatch):
    """--ready: skip stage-1 training, start stage 2 from a checkpoint
    (reference main.py:122-123,203-206)."""
    monkeypatch.setattr(cli, "TEMPERATURES", [0.8])
    common = [
        "--dataset_name", "MNIST", "--model", "snn-vq-vae",
        "--num_steps", "2", "--codebook_size", "8",
        "--batch_size", "16", "--lif_backend", "scan",
        "--sample_batches", "1", "--grid_batches", "1",
    ]
    cli.main(common + [
        "--epochs", "1",
        "--result_dir", str(tmp_path / "r1"),
        "--sample_dir", str(tmp_path / "s1"),
    ])
    ckpt = tmp_path / "r1" / "MNIST" / "snn-vq-vae"
    assert (ckpt / "model").is_dir()

    cli.main(common + [
        "--epochs", "1",
        "--ready", str(ckpt),
        "--result_dir", str(tmp_path / "r2"),
        "--sample_dir", str(tmp_path / "s2"),
    ])
    # stage 2 trained + evaluated without stage-1 training
    assert (tmp_path / "r2" / "MNIST" / "snn-vq-vae" / "diff_result"
            / "diff_model").is_dir()
    assert (tmp_path / "s2" / "MNIST" / "snn-vq-vae" / "metrics.json").exists()
