"""Generation-quality regression gate (VERDICT #6).

Round 1 had 206 green tests but nothing asserting generation QUALITY — a
refactor could silently regress FID while loss-decrease smoke tests stayed
green. This gate trains the full two-stage pipeline at fixed seed on
synthetic data and asserts quality floors:

- reconstruction MSE after stage 1 must beat a fixed threshold;
- LeNet-space FID of generated samples must clearly beat the FID of
  uniform-noise images (a self-calibrating bar: robust to LeNet retrain
  jitter, impossible to pass with broken generation);
- generated samples must cover multiple modes (not collapse to one).

Mirrors the reference's eval-as-test pattern (``main.py:154-197,445-529``)
but with hard assertions.
"""

import numpy as np
import pytest

import jax

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.data.datasets import synthetic_dataset
from spiking_diffusion_tpu.metrics.features import lenet_feature_fn, train_lenet
from spiking_diffusion_tpu.metrics.scores import fid_from_features
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser, diffusion
from spiking_diffusion_tpu.train import extract_code_indices, train_vqvae
from spiking_diffusion_tpu.train.stage1 import eval_step_vqvae
from spiking_diffusion_tpu.train.stage2 import sample_codes, train_diffusion


@pytest.mark.slow
def test_generation_quality_floor():
    ds = synthetic_dataset("MNIST", n_train=512, n_test=256, num_classes=10)

    vq_cfg = VQVAEConfig(num_steps=4, embedding_dim=8, num_embeddings=16,
                         enc_channels=(16, 32), dec_channels=(32, 16))
    model = SNNVQVAE(vq_cfg, backend="scan")
    state = train_vqvae(
        model, ds.train_images, data_variance=float(np.var(ds.train_images)),
        epochs=12, batch_size=32, seed=42, log_fn=None,
    )

    # --- stage-1 quality: reconstruction MSE floor -----------------------
    test_batch = ds.test_images[:64] - 0.5
    recon, _ = eval_step_vqvae(
        state.apply_fn, state.params, state.batch_stats, test_batch
    )
    mse = float(np.mean((np.asarray(recon) - test_batch) ** 2))
    assert mse < 0.03, f"stage-1 recon regressed: mse={mse:.4f}"

    # --- stage 2 ----------------------------------------------------------
    indices = extract_code_indices(state, ds.train_images, batch_size=128)
    d_cfg = DiffusionConfig(num_timesteps=16, num_embeddings=16, mask_id=16,
                            num_steps=4, denoiser_channels=(32, 64, 32))
    denoiser = SpikingDenoiser(d_cfg, backend="scan")
    dstate = train_diffusion(
        denoiser, d_cfg, indices, epochs=8, batch_size=32, seed=42,
        log_fn=None,
    )
    codes = sample_codes(dstate, d_cfg, jax.random.PRNGKey(7),
                         n_samples=128, temperature=0.8)
    assert int(np.max(np.asarray(codes))) < 16, "mask tokens leaked out"
    gen = np.asarray(
        jax.jit(
            lambda c: model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                c, method="decode_indices",
            )
        )(codes)
    )  # (128, 28, 28, 1) in [-0.5, 0.5]-ish (tanh output)
    gen01 = np.clip(gen + 0.5, 0.0, 1.0)

    # --- LeNet-space FID vs a noise bar -----------------------------------
    # 12 epochs reaches 100% test accuracy on the synthetic set (2 epochs
    # leaves a ~15%-accurate net that predicts one class for everything —
    # the gate would then measure the metric net, not generation)
    lenet, lenet_params = train_lenet(
        ds.train_images, ds.train_labels, ds.num_classes, epochs=12, seed=0
    )
    feat = lenet_feature_fn(lenet, lenet_params)
    real_f, _ = feat(ds.test_images[:256])
    gen_f, gen_p = feat(gen01)
    noise = np.random.RandomState(0).rand(128, 28, 28, 1).astype(np.float32)
    noise_f, _ = feat(noise)

    fid_gen = fid_from_features(gen_f, real_f)
    fid_noise = fid_from_features(noise_f, real_f)
    assert np.isfinite(fid_gen)
    assert fid_gen < 0.7 * fid_noise, (
        f"generation quality regressed: FID(gen)={fid_gen:.2f} vs "
        f"FID(noise)={fid_noise:.2f}"
    )

    # --- mode coverage: no collapse to a single class ----------------------
    pred_classes = np.argmax(gen_p, axis=-1)
    n_modes = len(np.unique(pred_classes))
    assert n_modes >= 3, f"mode collapse: only {n_modes} classes generated"
