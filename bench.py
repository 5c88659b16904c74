"""Headline benchmark: end-to-end generation throughput (images/sec/chip).

Measures the full Spiking-Diffusion generation pipeline at reference scale —
49-step absorbing-diffusion reverse sampling with the T=16 spiking denoiser,
followed by the VQ-SVAE decode (re-spike + LIF deconv decoder + membrane
readout) — entirely on one chip inside a single jit.

Reference configuration being matched (Spiking-Diffusion-release):
  * sampler batch 16, 49 steps (``snn_model/vq_diffusion.py:48,51``)
  * denoiser: 6 conv blocks at T=16 (``vq_diffusion.py:150-208``)
  * decode: quantize -> poisson re-spike -> 3 deconvs -> tanh(memout)
    (``main.py:388-399``)

The reference publishes no throughput numbers (BASELINE.md). ``vs_baseline``
is computed against a MEASURED run of the actual reference code
(``scripts/measure_reference_baseline.py`` -> ``BASELINE_MEASURED.json``:
torch+spikingjelly on this host's CPU, single-threaded, times the same
49-step sample + decode pipeline) scaled by a documented, generous
CPU->GPU factor. See the json for the measurement details.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N,
   "mfu": f, "hbm_util": f}
where mfu/hbm_util come from XLA's compiled cost analysis (flops / bytes
accessed) over the measured wall time, against v5e peak (197 bf16 TFLOP/s,
819 GB/s HBM) — making the perf claim auditable against hardware limits.
"""

import json
import os
import time

# Headline config (since round 5): int8 megakernel weights with
# per-kernel-row dequant scales, 'xyband' conv mode (sliced valid-row
# dy matmuls), interleave 1 — the measured best end-to-end config.
# The r5 post-xyband ladder inverted the r4 interleave result: il1
# 1116.1 img/s > il2 1100.8 > il2+bf16-logits 1014.5 (il4 x xyband hits
# a Mosaic layout limitation, "result/input offset mismatch"); bf16
# xyband 718.7 vs xyrow 592.7. Quality gate passed at the flagship
# tier: the int8 sampler at exactly this config scores FID 36.05 on the
# committed 60+120 MNIST checkpoint vs bf16's 41.62 — at parity or
# better (sample_r5_e60_int8). BENCH_DTYPE=bf16 restores the bf16 path.
# Env defaults must land before fused_denoiser import (its knobs are
# read at module import).
_BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "int8")
os.environ.setdefault("BENCH_DTYPE", _BENCH_DTYPE)
if _BENCH_DTYPE == "int8":
    os.environ.setdefault("SD_FUSED_INTERLEAVE", "1")

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser
from spiking_diffusion_tpu.models import diffusion


def _reference_img_per_sec() -> float:
    """Measured reference throughput (see module docstring)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["reference_gpu_images_per_sec_est"])
    except Exception:
        # fallback: the last committed measurement (2026-08-16, torch
        # 2.13 CPU single-thread 0.519 img/s x 50 GPU scale)
        return 25.968


_PEAK_FLOPS = 197e12  # v5e bf16 peak (fp32 runs below this; conservative)
if os.environ.get("BENCH_DTYPE") == "int8":
    _PEAK_FLOPS = 394e12  # v5e int8 MXU peak — MFU stays hardware-honest
_PEAK_HBM = 819e9  # v5e HBM bytes/sec

# per-chip generation batch. Early (bf16-era, pre-megakernel-tuning) sweep:
# 1024 -> 497 img/s, 2048 -> 530, 4096 -> 543. Re-swept at the r5 int8
# headline config (int8+row scales, xyband, il1) the optimum moved up:
# 2048 -> ~1095-1126, 4096 -> 1196, 6144 -> 1220 (mfu_useful 0.604),
# 8192 -> HBM OOM (program 19.14G > 15.75G). 6144 is the largest batch
# that fits v5e HBM and is the default.
BATCH = int(os.environ.get("BENCH_BATCH", "6144"))
N_ITERS = 4
# bf16 activations/spikes; membranes stay fp32 in-kernel (CLAUDE.md rule).
# BENCH_DTYPE=int8 quantizes the MEGAKERNEL weights to symmetric
# per-channel int8 (spikes are {0,1}, so activation-side exact; ~2x MXU
# peak on v5e) — the VQ decode modules stay bf16.
import jax.numpy as _jnp

DTYPE = {
    "bf16": _jnp.bfloat16, "fp32": _jnp.float32, "int8": _jnp.int8,
}[os.environ.get("BENCH_DTYPE", "bf16")]


# The sampler's denoiser runs as the whole-network fused Pallas megakernel
# (ops/fused_denoiser.py): all conv blocks + LIF recurrences + skip +
# logits readout inside one kernel per batch tile, weights and membranes
# VMEM-resident across the T loop. Default "auto" = fused on TPU only (a
# Pallas call with TPU compiler params cannot lower elsewhere);
# BENCH_FUSED=0 forces the layerwise path, =1 forces fused.
_FUSED_ENV = os.environ.get("BENCH_FUSED", "auto")
USE_FUSED = (
    _FUSED_ENV == "1"
    or (_FUSED_ENV not in ("0",) and jax.default_backend() == "tpu")
)


def build(dtype=DTYPE, batch=None):
    from spiking_diffusion_tpu.ops.fused_denoiser import (
        make_fused_denoise_apply,
    )

    batch = BATCH if batch is None else batch

    vq_cfg = VQVAEConfig()  # T=16, K=128, D=16
    d_cfg = DiffusionConfig()  # 49 steps, mask_id=128

    # int8 applies to the fused megakernel only; flax module paths (VQ
    # decode, layerwise denoiser fallback) keep bf16 activations
    mdtype = jnp.bfloat16 if jnp.dtype(dtype) == jnp.int8 else dtype

    key = jax.random.PRNGKey(0)
    model = SNNVQVAE(vq_cfg, backend="auto", dtype=mdtype)
    img = jnp.zeros((2, 28, 28, 1), jnp.float32)
    m_vars = jax.jit(lambda k, x: model.init(k, x, train=True))(key, img)

    denoiser = SpikingDenoiser(d_cfg, backend="auto", dtype=mdtype)
    x0 = jnp.zeros((2, 7, 7), jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    d_vars = jax.jit(
        lambda k, x, t: denoiser.init(k, x, t, train=True)
    )(key, x0, t0)

    fused_apply = (
        make_fused_denoise_apply(d_cfg, dtype=dtype) if USE_FUSED else None
    )

    def generate(m_vars, d_vars, rng):
        if USE_FUSED:
            def denoise(x_t, t):
                return fused_apply(d_vars, x_t, t)
        else:
            def denoise(x_t, t):
                return denoiser.apply(d_vars, x_t, t, train=False)

        codes = diffusion.sample(
            rng, denoise, d_cfg, n_samples=batch, temperature=0.65
        )
        return model.apply(m_vars, codes, method="decode_indices")

    return (jax.jit(generate), m_vars, d_vars, denoiser, model, d_cfg,
            fused_apply)


def _cost_analysis(jitted, *args):
    """(flops, bytes accessed) per call from XLA, or (None, None)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def _pipeline_cost(denoiser, d_vars, model, m_vars, d_cfg, fused=False):
    """(flops, bytes) for the FULL generation: XLA's cost analysis counts a
    while-loop body once, so cost-analyze one denoiser forward and one
    decode separately and scale the denoiser by the 49 reverse steps —
    otherwise MFU is understated ~49x. When the fused megakernel is used,
    the module's static flop/byte count stands in for the denoiser
    (XLA cannot cost-analyze inside a Pallas custom call)."""
    x_t = jnp.full((BATCH, 7, 7), d_cfg.mask_id, jnp.int32)
    tt = jnp.ones((BATCH,), jnp.int32)
    if fused:
        # XLA cost_analysis can't see inside the Pallas megakernel: use the
        # module's static flop/byte count for the denoiser. Two flop
        # counts: ALL taps (the kernel really runs the masked SAME-padding
        # taps as zero rows on the MXU -> hardware MFU) and valid taps only
        # (~82% at 7x7 -> useful-work MFU).
        from spiking_diffusion_tpu.ops.fused_denoiser import denoiser_cost

        itemsize = jnp.dtype(DTYPE).itemsize
        f_den, b_den = denoiser_cost(d_cfg, BATCH, itemsize=itemsize)
        f_den_u, _ = denoiser_cost(
            d_cfg, BATCH, itemsize=itemsize, useful_only=True
        )
    else:
        den = jax.jit(lambda v, x, t: denoiser.apply(v, x, t, train=False))
        f_den, b_den = _cost_analysis(den, d_vars, x_t, tt)
        f_den_u = f_den  # XLA counts only algorithmic conv flops
    dec = jax.jit(lambda v, c: model.apply(v, c, method="decode_indices"))
    f_dec, b_dec = _cost_analysis(dec, m_vars, x_t)
    if f_den is None or f_dec is None:
        return None, None, None
    steps = d_cfg.num_timesteps
    return (
        f_den * steps + f_dec,
        f_den_u * steps + f_dec,
        b_den * steps + b_dec,
    )


def main():
    import sys

    import numpy as np

    # Guard: this benchmark's number is only meaningful on TPU. If the axon
    # plugin failed and jax silently fell back to CPU, a "valid" JSON line
    # at ~0.5 img/s would be banked as the round's driver-verified number
    # (observed: BENCH_EXTRAS.json 0.49 img/s from a wedged-tunnel run).
    # Refuse loudly instead; BENCH_ALLOW_CPU=1 overrides for local testing.
    backend = jax.default_backend()
    print(f"bench: jax backend = {backend}", file=sys.stderr, flush=True)
    if backend != "tpu" and os.environ.get("BENCH_ALLOW_CPU") != "1":
        print(
            "bench: refusing to run on non-TPU backend (set "
            "BENCH_ALLOW_CPU=1 to override)",
            file=sys.stderr, flush=True,
        )
        sys.exit(3)

    t_start = time.perf_counter()
    # wall budget for OPTIONAL extras (batch-16 latency, energy): they run
    # only if the headline finished with this much slack left. The headline
    # JSON line is printed the moment the throughput loop ends — a hang in
    # any extra can no longer lose the round's number (BENCH_r03 lesson).
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "900"))

    gen, m_vars, d_vars, denoiser, model, d_cfg, _fused_apply = build()
    key = jax.random.PRNGKey(42)

    # Single big compile: the sum-reduced generator. The in-jit scalar
    # reduction depends on every output element, so float() is a sound
    # host-copy sync point (block_until_ready is not reliable over the
    # measurement tunnel) without paying ~35 MB/s for full image copies.
    gen_sum = jax.jit(
        lambda mv, dv, k: jnp.sum(gen(mv, dv, k).astype(jnp.float32))
    )
    s = float(gen_sum(m_vars, d_vars, key))  # compile + warm
    assert np.isfinite(s), "warmup produced non-finite output"
    t0 = time.perf_counter()
    for i in range(N_ITERS):
        key, k = jax.random.split(key)
        s = float(gen_sum(m_vars, d_vars, k))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)

    img_per_sec = BATCH * N_ITERS / dt
    dt_iter = dt / N_ITERS

    # cost analysis: denoiser side is a static count when fused (free);
    # the decode side compiles one (small) program — best-effort.
    try:
        flops, flops_useful, hbm_bytes = _pipeline_cost(
            denoiser, d_vars, model, m_vars, d_cfg, fused=USE_FUSED
        )
    except Exception:
        flops = flops_useful = hbm_bytes = None
    mfu = round(flops / dt_iter / _PEAK_FLOPS, 4) if flops else None
    # useful-work MFU: discounts the masked SAME-padding taps the fused
    # kernel executes as zero rows on the MXU (hardware-honest `mfu`
    # counts them; the gap is the padding overhead of the 7x7 grid)
    mfu_u = (
        round(flops_useful / dt_iter / _PEAK_FLOPS, 4) if flops_useful
        else None
    )
    hbm = round(hbm_bytes / dt_iter / _PEAK_HBM, 4) if hbm_bytes else None

    record = {
        "metric": "generated_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / _reference_img_per_sec(), 2),
        "mfu": mfu,
        "mfu_useful": mfu_u,
        "hbm_util": hbm,
        "dtype": os.environ.get("BENCH_DTYPE", "bf16"),
    }
    # THE one JSON line — emitted now, before any optional extra can hang
    print(json.dumps(record), flush=True)

    # ---- optional extras (stderr + side file only; never stdout) ----
    extras = {}

    def _room(need):
        return (time.perf_counter() - t_start) + need < budget

    # latency at the reference's own sampler config (batch 16,
    # ``vq_diffusion.py:51``): 8 sequential batch-16 generations, one
    # end-of-loop sync — device programs execute in order, so dt/8 is the
    # per-call device latency without the ~28 ms measurement-tunnel RTT
    # a per-call sync would add. Costs one more (small) compile.
    if os.environ.get("BENCH_EXTRAS", "1") == "1" and _room(120):
        try:
            lat_iters = 8
            gen16, m16, d16 = gen, m_vars, d_vars
            if BATCH != 16:
                gen16, m16, d16 = build(batch=16)[:3]
            gen16_sum = jax.jit(
                lambda mv, dv, k: jnp.sum(
                    gen16(mv, dv, k).astype(jnp.float32))
            )
            float(gen16_sum(m16, d16, key))  # compile + warm
            t1 = time.perf_counter()
            for i in range(lat_iters):
                key, k = jax.random.split(key)
                s16 = gen16_sum(m16, d16, k)
            s16 = float(s16)
            lat = (time.perf_counter() - t1) / lat_iters
            assert np.isfinite(s16)
            extras["latency_batch16_ms"] = round(lat * 1e3, 2)
            extras["img_per_sec_batch16"] = round(16.0 / lat, 2)
        except Exception as e:  # noqa: BLE001 — extras must never kill us
            extras["latency_error"] = repr(e)

    if os.environ.get("BENCH_ENERGY", "0") == "1" and _room(300):
        # spike-aware AC/MAC energy per generated image (45nm pJ model,
        # the reference's syops convention) — optional: needs an extra
        # layerwise sampler compile
        try:
            from spiking_diffusion_tpu.profiling.syops import (
                generation_energy,
            )

            e = generation_energy(
                denoiser, d_vars, model, m_vars, d_cfg,
                jax.random.PRNGKey(7), n_samples=64,
            )
            extras["energy_uJ_per_img"] = round(
                float(e["energy_uJ_per_img"]), 2
            )
            extras["denoiser_spike_rate"] = round(
                float(e["denoiser_spike_rate"]), 4
            )
        except Exception as e:  # noqa: BLE001
            extras["energy_error"] = repr(e)

    if extras:
        extras.update(record)
        print(json.dumps(extras), file=sys.stderr, flush=True)
        try:
            side = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_EXTRAS.json",
            )
            with open(side, "w") as f:
                json.dump(extras, f)
        except OSError:
            pass


if __name__ == "__main__":
    main()
