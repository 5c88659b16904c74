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

The reference publishes no throughput numbers (BASELINE.md). ``VS_BASELINE``
is therefore computed against a documented estimate of the PyTorch
reference's per-chip generation rate; see ``_REFERENCE_IMG_PER_SEC`` below.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser
from spiking_diffusion_tpu.models import diffusion

# Estimated PyTorch+spikingjelly reference throughput on its own hardware
# (single CUDA GPU): each reverse step runs a full T=16 SNN denoiser forward
# (6 conv blocks x 16 sequential LIF python-loop steps ~= 100+ small CUDA
# kernel launches) plus a host sync through torch.distributions.Categorical;
# at the reference's batch of 16 this is ~50-100 ms/step on a V100-class
# part => 49 steps ~= 2.5-5 s per 16 images ~= 3-6 images/sec. We take the
# optimistic end. (No published number exists; BASELINE.json.published = {}.)
_REFERENCE_IMG_PER_SEC = 6.0

BATCH = 1024  # per-chip generation batch (the TPU eats the reference's 16)
N_ITERS = 4
# measured on v5e: fp32 261 img/s vs bf16 228 img/s at batch 256 — the
# 7x7-spatial convs are layout/compute-shape dominated, so halving
# activation bytes does not pay here; fp32 is the faster default.
# (bf16 remains available via SNNVQVAE/SpikingDenoiser dtype=... .)
DTYPE = None  # fp32


def build(dtype=DTYPE):
    vq_cfg = VQVAEConfig()  # T=16, K=128, D=16
    d_cfg = DiffusionConfig()  # 49 steps, mask_id=128

    key = jax.random.PRNGKey(0)
    model = SNNVQVAE(vq_cfg, backend="auto", dtype=dtype)
    img = jnp.zeros((2, 28, 28, 1), jnp.float32)
    m_vars = jax.jit(lambda k, x: model.init(k, x, train=True))(key, img)

    denoiser = SpikingDenoiser(d_cfg, backend="auto", dtype=dtype)
    x0 = jnp.zeros((2, 7, 7), jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    d_vars = jax.jit(
        lambda k, x, t: denoiser.init(k, x, t, train=True)
    )(key, x0, t0)

    def generate(m_vars, d_vars, rng):
        def denoise(x_t, t):
            return denoiser.apply(d_vars, x_t, t, train=False)

        codes = diffusion.sample(
            rng, denoise, d_cfg, n_samples=BATCH, temperature=0.65
        )
        return model.apply(m_vars, codes, method="decode_indices")

    return jax.jit(generate), m_vars, d_vars


def main():
    import numpy as np

    gen, m_vars, d_vars = build()
    key = jax.random.PRNGKey(42)

    # compile + warmup (host-materialize: on this platform
    # block_until_ready does not reliably track async work — a device->host
    # copy is the only sound synchronization point)
    out = np.asarray(gen(m_vars, d_vars, key))

    t0 = time.perf_counter()
    for i in range(N_ITERS):
        key, k = jax.random.split(key)
        out = np.asarray(gen(m_vars, d_vars, k))
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * N_ITERS / dt
    print(
        json.dumps(
            {
                "metric": "generated_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(img_per_sec / _REFERENCE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
