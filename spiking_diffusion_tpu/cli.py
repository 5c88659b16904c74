"""Command-line driver — the reference ``main.py`` rebuilt.

Flag surface parity (``main.py:46-59``): --checkpoint, --dataset_name,
--seed, --model, --data_path, --epochs, --metric, --ready, --mask,
--codebook_size; artifact layout parity: result/<dataset>/<model>/ with
per-epoch recon grids and checkpoints, diff_result/ for the prior,
sample/<dataset>/<model>/<temp>/ grids, then MSE/SSIM + IS/KID/FID.

Differences by design:
  * checkpoints are orbax directories with optimizer state (not .pth);
  * sampling and metric batches run jitted on-device; the 12-temperature
    sweep reuses one compiled sampler;
  * IS/FID/KID use a LeNet feature space by default — this environment
    cannot download pretrained InceptionV3 weights (documented in
    metrics/features.py); numbers are self-consistent across models but
    not directly comparable to the paper's Inception-based table.

Usage:
    python -m spiking_diffusion_tpu.cli --dataset_name MNIST \
        --model snn-vq-vae --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import (
    DiffusionConfig,
    SNNVAEConfig,
    VQVAEConfig,
)
from spiking_diffusion_tpu.data import batch_iterator, data_variance, load_dataset
from spiking_diffusion_tpu.metrics import (
    inception_score_from_probs,
    kid_from_features,
    ssim,
)
from spiking_diffusion_tpu.metrics.mode_coverage import mode_coverage_kl
from spiking_diffusion_tpu.metrics.scores import fid_from_features
from spiking_diffusion_tpu.models import (
    ANNVQVAE,
    SNNVAE,
    SNNVQVAE,
    SpikingDenoiser,
    diffusion,
)
from spiking_diffusion_tpu.train import (
    create_train_state,
    extract_code_indices,
    train_vqvae,
)
from spiking_diffusion_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from spiking_diffusion_tpu.train.stage2 import sample_codes, train_diffusion
from spiking_diffusion_tpu.utils import save_image_grid, save_recon_grid

TEMPERATURES = [0.001, 0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="result dir of a trained run to evaluate")
    p.add_argument("--dataset_name", default="MNIST",
                   choices=["MNIST", "KMNIST", "FMNIST", "Letters",
                            "CIFAR10", "CIFAR10-BW"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model", default="snn-vq-vae",
                   choices=["snn-vq-vae", "snn-vq-vae-uni", "snn-vae",
                            "vq-vae"])
    p.add_argument("--data_path", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--metric", default=None,
                   choices=[None, "IS", "KID", "FID", "MODE"])
    p.add_argument("--ready", default=None,
                   help="stage-1 checkpoint dir: skip stage-1 training")
    p.add_argument("--mask", default="codebook_size",
                   choices=["codebook_size", "max", "min"])
    p.add_argument("--codebook_size", type=int, default=128)
    # extensions over the reference surface
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_steps", type=int, default=16, help="SNN T")
    p.add_argument("--lif_backend", default="auto",
                   choices=["auto", "scan", "pallas", "unroll"])
    p.add_argument("--sample_batches", type=int, default=80,
                   help="16-image batches per temperature for metrics")
    p.add_argument("--grid_batches", type=int, default=4,
                   help="sample grids saved per temperature")
    p.add_argument("--result_dir", default="./result")
    p.add_argument("--sample_dir", default="./sample")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="train stage 1 over an n-device data mesh")
    p.add_argument("--synthetic_train", type=int, default=2048,
                   help="synthetic-fallback train set size (no IDX files)")
    p.add_argument("--synthetic_test", type=int, default=512,
                   help="synthetic-fallback test set size")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="reverse-diffusion steps for generation (default: "
                        "num_timesteps=49, the reference's fixed count); "
                        "fewer steps trade quality for throughput")
    p.add_argument("--unmask_mode", default="random",
                   choices=["random", "confidence"],
                   help="which masked positions each reverse step reveals: "
                        "'random' (the reference's uniform subset) or "
                        "'confidence' (MaskGIT-style highest-confidence "
                        "tokens first; much better at low --sample_steps)")
    p.add_argument("--sample_spacing", default="linear",
                   choices=["linear", "cosine"],
                   help="t-schedule spacing for --sample_steps < 49: "
                        "'linear' strides uniformly; 'cosine' follows the "
                        "MaskGIT masked-fraction trajectory (few reveals "
                        "early, many late)")
    p.add_argument("--choice_temperature", type=float, default=1.0,
                   help="Gumbel noise scale for --unmask_mode confidence "
                        "(annealed to 0 over the schedule)")
    p.add_argument("--temperatures", default=None,
                   help="comma-separated sampling temperatures for the "
                        "eval sweep (default: the reference's 12-point "
                        "sweep, main.py:418-421)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv activations/spikes (membranes stay "
                        "fp32); ~25%% faster train step on TPU")
    p.add_argument("--fused_sampler", default="auto",
                   choices=["auto", "on", "off"],
                   help="whole-denoiser Pallas megakernel for generation "
                        "(auto: on TPU only)")
    p.add_argument("--sampler_dtype", default="auto",
                   choices=["auto", "fp32", "bf16", "int8"],
                   help="megakernel compute dtype for the eval sweep "
                        "(auto: follow --bf16; int8: per-channel weight "
                        "quantization, spikes exact — ~1.4x generation)")
    p.add_argument("--frozen_metrics", default="auto",
                   choices=["auto", "on", "off"],
                   help="score FID/IS/KID in the COMMITTED frozen LeNet "
                        "feature space (metrics/assets/) so numbers "
                        "compare across runs and rounds; auto falls back "
                        "to retraining when no compatible space exists")
    p.add_argument("--ref_size", type=int, default=1280,
                   help="real reference-set size for FID/KID (LeNet-FID "
                        "draw variance shrinks with this; flagship runs "
                        "use 8192)")
    p.add_argument("--vae_scheduled_p", default="off",
                   help="snn-vae scheduled-sampling probability: 'off' = 0 "
                        "(default — what the reference as-shipped actually "
                        "runs: main.py:128 gates update_p on model=='vae', "
                        "never matched by 'snn-vae'; measured r4 A/B: off "
                        "FID 203.5 vs annealed 1728.8); 'anneal' = "
                        "FSVAE-paper 0.1->0.3 over training; or a fixed "
                        "float")
    p.add_argument("--syops", action="store_true",
                   help="print the spike-aware op/energy report "
                        "(the reference's commented-out complexity print, "
                        "main.py:325-338)")
    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> None:
    from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    # resolve the sweep without mutating the module global (a second
    # in-process main() must see the default again)
    args.sweep_temperatures = (
        [float(x) for x in args.temperatures.split(",")]
        if args.temperatures else list(TEMPERATURES)
    )
    np.random.seed(args.seed)
    root_key = jax.random.PRNGKey(args.seed)

    save_path = os.path.join(args.result_dir, args.dataset_name, args.model)
    os.makedirs(save_path, exist_ok=True)
    sample_path = os.path.join(args.sample_dir, args.dataset_name, args.model)
    os.makedirs(sample_path, exist_ok=True)

    ds = load_dataset(
        args.dataset_name, args.data_path,
        synthetic_size=(args.synthetic_train, args.synthetic_test),
    )
    print(f"load data: {args.dataset_name}! "
          f"(synthetic={ds.synthetic}, train={ds.train_images.shape})")
    variance = data_variance(ds.train_images)

    vq_cfg = VQVAEConfig(
        num_steps=args.num_steps,
        num_embeddings=args.codebook_size,
        in_channels=int(ds.train_images.shape[-1]),  # 3 for CIFAR10
        # 'snn-vq-vae-uni': the reference's codebook-usage-uniformity
        # variant, here with a loss that actually works (the original's
        # FID_loss is constant 0 and its model class is clobbered,
        # ``vae_model.py:674-879``)
        usage_loss_weight=0.1 if args.model == "snn-vq-vae-uni" else 0.0,
    )
    if args.model in ("snn-vq-vae", "snn-vq-vae-uni"):
        model = SNNVQVAE(vq_cfg, backend=args.lif_backend,
                         dtype=jnp.bfloat16 if args.bf16 else None)
    elif args.model == "vq-vae":
        model = ANNVQVAE(vq_cfg)
    else:
        model = SNNVAE(
            SNNVAEConfig(num_steps=args.num_steps),
            vq_cfg=vq_cfg,
            backend=args.lif_backend,
        )
    print("The model is ready!")

    if args.model == "snn-vae":
        _run_snn_vae(args, model, ds, save_path, sample_path, root_key)
        return

    # ---- stage 1: VQ-VAE ------------------------------------------------
    state = _init_state(args, model, ds, root_key)
    if args.checkpoint:
        state = restore_checkpoint(state, args.checkpoint, "model")
        print(f"loaded stage-1 checkpoint from {args.checkpoint}")
    elif args.ready:
        state = restore_checkpoint(state, args.ready, "model")
        print(f"loaded ready stage-1 checkpoint from {args.ready}")
    else:
        def epoch_cb(epoch, st):
            imgs = ds.test_images[:32] - 0.5
            recon, _ = _eval_model(model, st, imgs)
            save_recon_grid(
                imgs, recon,
                os.path.join(save_path, f"epoch={epoch}_test.png"),
            )
            save_checkpoint(st, save_path, "model")

        state = train_vqvae(
            model, ds.train_images, variance,
            epochs=args.epochs, batch_size=args.batch_size,
            seed=args.seed, epoch_callback=epoch_cb,
            data_parallel=args.data_parallel,
        )

    if args.syops:
        from spiking_diffusion_tpu.profiling import syops as syops_mod

        imgs = jnp.asarray(ds.test_images[: args.batch_size] - 0.5)
        _, per_layer, total = syops_mod.profile_apply(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False,
        )
        n_params = syops_mod.count_params(state.params)
        print(syops_mod.format_report(per_layer, total, n_params))
        print("{:<30}  {:.3e}".format(
            "Computational complexity ACs:", total["acs"]))
        print("{:<30}  {:.3e}".format(
            "Computational complexity MACs:", total["macs"]))
        print("{:<30}  {:,}".format("Number of parameters: ", n_params))

    # ---- stage 2: diffusion prior ---------------------------------------
    print("prepare data for train diffusion...")
    indices = extract_code_indices(state, ds.train_images)
    mask_id = diffusion.pick_mask_id(
        args.mask, args.codebook_size, jnp.asarray(indices[: args.batch_size])
    )
    print("mask_id = ", mask_id)
    d_cfg = DiffusionConfig(
        num_embeddings=args.codebook_size,
        mask_id=mask_id,
        num_steps=args.num_steps,
    )
    d_backend = args.lif_backend
    d_bn_axis = None
    if d_backend == "auto" and jax.devices()[0].platform == "tpu":
        # measured winner for stage-2 training on v5e: fused BN-apply+LIF
        # kernel, 27.8 ms/step bf16 vs 40.3 unrolled (batch 256). The
        # Pallas call is opaque to GSPMD, so data-parallel runs take the
        # explicit shard_map step with SyncBN (stage2.py).
        d_backend = "bnlif"
        if args.data_parallel > 1:
            d_bn_axis = "data"
        print("denoiser backend: bnlif (fused BN+LIF kernel)"
              + (" + shard_map DP" if d_bn_axis else ""))
    denoiser = SpikingDenoiser(d_cfg, backend=d_backend,
                               bn_axis_name=d_bn_axis,
                               dtype=jnp.bfloat16 if args.bf16 else None)
    diff_path = os.path.join(save_path, "diff_result")
    os.makedirs(diff_path, exist_ok=True)

    dstate = _init_diff_state(args, denoiser, indices, root_key)
    if args.checkpoint:
        dstate = restore_checkpoint(
            dstate, os.path.join(args.checkpoint, "diff_result"), "diff_model"
        )
        print("loaded diffusion checkpoint")
    else:
        def diff_cb(epoch, st):
            if epoch % 10 == 0:
                codes = sample_codes(
                    st, d_cfg, jax.random.PRNGKey(epoch), n_samples=32,
                    temperature=0.65,
                )
                imgs = _decode_codes(model, state, codes)
                save_image_grid(
                    imgs, os.path.join(diff_path, f"epoch={epoch}_test.png")
                )
                save_checkpoint(st, diff_path, "diff_model")

        dstate = train_diffusion(
            denoiser, d_cfg, indices,
            epochs=args.epochs * 2, batch_size=args.batch_size,
            seed=args.seed, epoch_callback=diff_cb,
            data_parallel=args.data_parallel,
        )
        save_checkpoint(dstate, diff_path, "diff_model")

    # ---- evaluation ------------------------------------------------------
    _eval_recon(args, model, state, ds)
    _eval_generation(args, model, state, d_cfg, dstate, ds, sample_path)


def _init_state(args, model, ds, key):
    sample = jnp.asarray(ds.train_images[: args.batch_size] - 0.5)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(key, sample)
    return create_train_state(model, variables)


def _init_diff_state(args, denoiser, indices, key):
    x0 = jnp.asarray(indices[: args.batch_size])
    t0 = jnp.ones((x0.shape[0],), jnp.int32)
    variables = jax.jit(
        lambda k, x, t: denoiser.init(k, x, t, train=True)
    )(key, x0, t0)
    return create_train_state(denoiser, variables)


def _eval_model(model, state, images_np):
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fwd(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(images_np),
    )
    return np.asarray(out["recon"]), out


def _decode_codes(model, state, codes):
    dec = jax.jit(lambda v, i: model.apply(v, i, method="decode_indices"))
    return np.asarray(
        dec({"params": state.params, "batch_stats": state.batch_stats}, codes)
    )


def _eval_recon(args, model, state, ds):
    mses, ssims = [], []
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for batch in batch_iterator(
        ds.test_images, args.batch_size, shuffle=False
    ):
        x = jnp.asarray(batch - 0.5)
        out = fwd(variables, x)
        mses.append(float(jnp.mean((out["recon"] - x) ** 2)))
        ssims.append(1.0 - float(ssim(out["recon"], x)))
    print("loss_ssim = ", round(float(np.mean(ssims)), 3))
    print("loss_mse = ", round(float(np.mean(mses)), 3))


def _eval_generation(args, model, state, d_cfg, dstate, ds, sample_path):
    """Temperature sweep: grids + metric batches (``main.py:377-529``)."""
    # the metric feature space: committed frozen LeNet (comparable across
    # runs/rounds) when available, retrained otherwise
    from spiking_diffusion_tpu.metrics.frozen import (
        data_hash,
        get_feature_space,
        load_frozen_stats,
    )

    feature_fn, space_info = get_feature_space(
        args.dataset_name, ds.train_images, ds.train_labels,
        ds.num_classes, mode=getattr(args, "frozen_metrics", "auto"),
    )

    ref_size = getattr(args, "ref_size", 1280)
    real = ds.test_images[:ref_size]
    real_feats, _ = feature_fn(real)

    # reproducibility anchor: when this eval's real set is byte-identical
    # to the one the committed stats were pinned from, assert the
    # recomputed stats match to float precision
    if space_info.get("frozen"):
        stats = load_frozen_stats(args.dataset_name)
        if stats is not None and stats["data_sha"] == data_hash(real):
            mu = np.mean(real_feats, axis=0)
            sigma = np.cov(real_feats, rowvar=False)
            if not (
                np.allclose(mu, stats["mu"], rtol=1e-4, atol=1e-4)
                and np.allclose(
                    sigma, stats["sigma"], rtol=1e-3, atol=1e-4
                )
            ):
                raise RuntimeError(
                    "frozen stats drifted (mu/sigma mismatch vs committed "
                    "reference) — feature space not reproducible"
                )
            space_info["stats_verified"] = True
            print("frozen reference stats verified (bit-reproducible)")

    # Self-calibration anchor: FID between two halves of the real set in
    # THIS feature space. LeNet-FID values are only meaningful relative to
    # this floor (retraining the feature net rescales all distances, so
    # absolute FIDs are not comparable across runs/rounds without it).
    held = ds.test_images[ref_size: ref_size + len(real)]
    if len(held) >= 256:
        held_feats, _ = feature_fn(held)
        null_fid = round(fid_from_features(real_feats, held_feats), 4)
    else:
        half = len(real) // 2
        null_fid = round(
            fid_from_features(real_feats[:half], real_feats[half:]), 4
        )
    print(f"null FID (real vs real, n={len(real)}): {null_fid}")

    # The reference generates 16 images per sampler call (80 calls per
    # temperature, each a full 49-step loop at batch 16 — ``main.py:384``).
    # On TPU the 49 sequential steps have fixed per-step cost that a tiny
    # batch cannot amortize, so we run the SAME protocol at a large device
    # batch: one compiled sampler (temperature is a traced scalar) serving
    # every temperature, n_samples per call = up to 512.
    n_total = args.sample_batches * 16
    chunk = min(512, n_total)

    # Sampler backend: the whole-denoiser Pallas megakernel (VMEM-resident
    # weights/membranes across the T loop — ops/fused_denoiser.py) on TPU;
    # the layerwise path elsewhere. Eval precision follows --bf16.
    from spiking_diffusion_tpu.ops.fused_denoiser import make_denoise_fn

    fused = getattr(args, "fused_sampler", "auto")
    sd = getattr(args, "sampler_dtype", "auto")
    sampler_dtype = {
        "auto": jnp.bfloat16 if args.bf16 else jnp.float32,
        "fp32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8,
    }[sd]
    denoise = make_denoise_fn(
        {"params": dstate.params, "batch_stats": dstate.batch_stats},
        d_cfg, dstate.apply_fn,
        fused=True if fused == "on" else (False if fused == "off" else "auto"),
        dtype=sampler_dtype,
    )

    @jax.jit
    def gen_chunk(key, temp):
        codes = diffusion.sample(
            key, denoise, d_cfg, n_samples=chunk, temperature=temp,
            sample_steps=args.sample_steps,
            unmask_mode=args.unmask_mode,
            choice_temperature=args.choice_temperature,
            spacing=args.sample_spacing,
        )
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            codes, method="decode_indices",
        )

    results = {}
    key = jax.random.PRNGKey(args.seed + 1)
    for temp in getattr(args, "sweep_temperatures", TEMPERATURES):
        t0 = time.time()
        chunks = []
        produced = 0
        while produced < n_total:
            key, k = jax.random.split(key)
            chunks.append(np.asarray(gen_chunk(k, temp)))
            produced += chunk
        gen = np.concatenate(chunks, axis=0)[:n_total]  # [-.5,.5]
        for g in range(min(args.grid_batches, len(gen) // 32)):
            tdir = os.path.join(sample_path, str(temp))
            save_image_grid(
                gen[32 * g : 32 * g + 32],
                os.path.join(tdir, f"image_{temp}_{g}.png"),
            )
        gen01 = np.clip(gen + 0.5, 0, 1)
        feats, probs = feature_fn(gen01)
        entry = {"images_per_sec": round(len(gen) / (time.time() - t0), 1)}
        if args.metric in (None, "IS"):
            is_mean, is_std = inception_score_from_probs(probs, splits=4)
            entry["IS"] = round(is_mean, 4)
        if args.metric in (None, "FID"):
            entry["FID"] = round(fid_from_features(feats, real_feats), 4)
        if args.metric in (None, "KID"):
            # LeNet-space features need the unit-norm kernel convention
            # (raw-feature cubic kernel is unreadable at this scale —
            # see metrics/scores.kid_from_features). Reported x 1e3, the
            # usual KID convention (torchmetrics ``main.py:463-496``).
            kid_mean, _ = kid_from_features(
                real_feats, feats, subsets=10,
                subset_size=min(500, len(gen)), normalize="unit",
            )
            entry["KID_x1e3"] = round(kid_mean * 1e3, 4)
        if args.metric in (None, "MODE"):
            mc = mode_coverage_kl(feature_fn, gen01, ds.num_classes)
            entry["mode_KL"] = round(mc["kl"], 4)
            entry["covered_modes"] = mc["covered_modes"]
        results[temp] = entry
        print(f"temp={temp}: {entry}")
        last_gen01 = gen01

    # showcase artifacts at the final (reference-default highest)
    # temperature: per-class grids + the paper-figure montage
    # (``classify.py:129-184``, automated best-per-mode selection)
    if args.metric in (None, "MODE"):
        from spiking_diffusion_tpu.metrics.mode_coverage import (
            paper_montage,
            per_class_grids,
        )

        per_class_grids(
            feature_fn, last_gen01, ds.num_classes,
            os.path.join(sample_path, "classes"),
        )
        paper_montage(
            feature_fn, last_gen01, ds.num_classes,
            os.path.join(sample_path, "paper_image.png"), per_class=2,
        )

    results["null_FID"] = null_fid
    results["feature_space"] = {
        "frozen": bool(space_info.get("frozen")),
        "name": space_info.get("name"),
        "sha256": space_info.get("space_sha", "")[:16],
        "stats_verified": bool(space_info.get("stats_verified", False)),
        "ref_size": int(len(real)),
    }
    with open(os.path.join(sample_path, "metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("metrics written to", os.path.join(sample_path, "metrics.json"))


def _run_snn_vae(args, model, ds, save_path, sample_path, root_key):
    """SNN-VAE train/eval path (``main.py:103-105,128-135,345-375``)."""
    import optax

    from spiking_diffusion_tpu.train.state import TrainState, make_adamw

    sample = jnp.asarray(ds.train_images[: args.batch_size] - 0.5)
    key, init_key, fwd_key = jax.random.split(root_key, 3)
    variables = jax.jit(
        lambda k1, x, k2: model.init(k1, x, k2, train=True)
    )(init_key, sample, fwd_key)
    tx = make_adamw()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        apply_fn=model.apply,
        tx=tx,
    )

    @jax.jit
    def train_step(state, batch, key, p_sched):
        def loss_fn(params, bs):
            out, mut = model.apply(
                {"params": params, "batch_stats": bs}, batch, key,
                train=True, p_scheduled=p_sched, mutable=["batch_stats"],
            )
            return out["mmd_loss"] + out["recon_loss"], (out, mut)

        (loss, (out, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats)
        new_state = state.apply_gradients(
            grads, new_batch_stats=mut["batch_stats"]
        )
        metrics = {
            "loss": loss,
            "mmd": out["mmd_loss"],
            "rec": out["recon_loss"],
        }
        return new_state, metrics

    if args.checkpoint:
        state = restore_checkpoint(state, args.checkpoint, "model")
    else:
        n = ds.train_images.shape[0]
        spe = n // args.batch_size
        p_mode = getattr(args, "vae_scheduled_p", "off")
        for epoch in range(args.epochs):
            if p_mode == "anneal":
                # p annealed 0.1 -> 0.3 (``vae_model.py:292-295``)
                p_sched = 0.1 + (0.3 - 0.1) * epoch / max(args.epochs, 1)
            elif p_mode == "off":
                p_sched = 0.0  # reference-as-shipped (main.py:128 gate)
            else:
                p_sched = float(p_mode)
            for i, batch in enumerate(
                batch_iterator(ds.train_images, args.batch_size,
                               seed=args.seed, epoch=epoch)
            ):
                key, k = jax.random.split(key)
                state, m = train_step(
                    state, jnp.asarray(batch - 0.5), k, p_sched
                )
                if (i + 1) % 20 == 0 or i + 1 == spe:
                    print(f"[{epoch}/{args.epochs}][{i}/{spe}]: "
                          f"loss {float(m['loss']):.3f} "
                          f"loss_eq {float(m['mmd']):.3f} "
                          f"loss_rec {float(m['rec']):.3f}")
            save_checkpoint(state, save_path, "model")

    # sampling + IS/KID via LeNet features (``main.py:345-375,445+``)
    @jax.jit
    def sample_fn(key):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            key, args.batch_size, method="sample",
        )

    key, k = jax.random.split(key)
    x, _ = sample_fn(k)
    save_image_grid(np.asarray(x), os.path.join(sample_path, "image.png"))

    all_images = []
    for i in range(40):
        key, k = jax.random.split(key)
        x, _ = sample_fn(k)
        all_images.append(np.asarray(x))
    gen = np.clip(np.concatenate(all_images) + 0.5, 0, 1)

    from spiking_diffusion_tpu.metrics.frozen import get_feature_space

    feature_fn, space_info = get_feature_space(
        args.dataset_name, ds.train_images, ds.train_labels,
        ds.num_classes, mode=getattr(args, "frozen_metrics", "auto"),
    )
    feats, probs = feature_fn(gen)
    real_feats, _ = feature_fn(
        ds.test_images[: getattr(args, "ref_size", 1280)]
    )
    is_mean, _ = inception_score_from_probs(probs, splits=4)
    kid_mean, _ = kid_from_features(real_feats, feats, subsets=10,
                                    subset_size=min(500, len(gen)),
                                    normalize="unit")
    fid = fid_from_features(feats, real_feats)
    print(f"IS = {is_mean:.4f}  KIDx1e3 = {kid_mean * 1e3:.4f}  "
          f"FID = {fid:.4f}  "
          f"[space {space_info.get('space_sha', '')[:16]}"
          f"{' frozen' if space_info.get('frozen') else ''}]")


if __name__ == "__main__":
    main()
