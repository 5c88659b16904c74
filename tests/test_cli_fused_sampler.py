"""CLI --fused_sampler: the megakernel generation path through the driver.

Runs the tiny end-to-end CLI flow with ``--fused_sampler on`` and the
Pallas interpreter (CPU test host), verifying the product path composes:
trained stage-2 variables -> BN-folded megakernel -> temperature sweep ->
metrics.
"""

import json

import numpy as np
import pytest

from spiking_diffusion_tpu import cli
from spiking_diffusion_tpu.ops import fused_denoiser


@pytest.mark.slow
def test_cli_fused_sampler_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setattr(cli, "TEMPERATURES", [1.0])
    monkeypatch.setattr(fused_denoiser, "_INTERPRET", True)
    from spiking_diffusion_tpu.data import datasets as dsmod

    orig = dsmod.synthetic_dataset

    def small_synth(name, n_train=2048, n_test=512, **kw):
        kw.pop("num_classes", None)
        return orig(name, n_train=96, n_test=64, num_classes=10)

    monkeypatch.setattr(dsmod, "synthetic_dataset", small_synth)

    cli.main([
        "--dataset_name", "MNIST",
        "--model", "snn-vq-vae",
        "--epochs", "1",
        "--num_steps", "2",
        "--codebook_size", "8",
        "--batch_size", "16",
        "--lif_backend", "scan",
        "--sample_batches", "1",
        "--grid_batches", "1",
        "--fused_sampler", "on",
        "--result_dir", str(tmp_path / "result"),
        "--sample_dir", str(tmp_path / "sample"),
    ])

    samp = tmp_path / "sample" / "MNIST" / "snn-vq-vae"
    metrics = json.loads((samp / "metrics.json").read_text())
    assert set(metrics) == {"1.0", "null_FID", "feature_space"}
    assert np.isfinite(metrics["1.0"]["FID"])
