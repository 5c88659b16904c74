"""Benchmark the stage-1 train step on TPU (the VERDICT #3 target).

Round-1 measurement: 63.4 ms/step at batch 256, T=16, fp32, pallas backend.
This script re-measures variants (backend, dtype, batch) and prints XLA
cost-analysis bytes/flops so HBM-bound expectations are auditable.

Usage: python scripts/bench_train_step.py [--batch 256] [--variants ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.train import create_train_state, make_train_step_vqvae


def bench(backend: str, dtype, batch: int, iters: int = 20) -> dict:
    cfg = VQVAEConfig()
    model = SNNVQVAE(cfg, backend=backend, dtype=dtype)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, 28, 28, 1), jnp.float32) - 0.5
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        key, images[:2]
    )
    state = create_train_state(model, variables)
    step = make_train_step_vqvae(data_variance=0.1, donate=True)

    # compile + warmup; host-sync via loss materialization
    state, m = step(state, images)
    loss0 = float(m["loss"])

    # time N steps with ONE final host sync: the steps chain through state,
    # so materializing the last loss waits for the whole chain (per-step
    # float() would add the ~28 ms tunnel RTT to every step)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    try:
        lowered = make_train_step_vqvae(data_variance=0.1, donate=False)
        ca = jax.jit(lowered).lower(state, images).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops, hbm = float(ca["flops"]), float(ca.get("bytes accessed", 0))
    except Exception:
        flops = hbm = float("nan")
    return {
        "backend": backend,
        "dtype": str(dtype),
        "batch": batch,
        "ms_per_step": round(dt * 1e3, 2),
        "img_per_sec": round(batch / dt, 1),
        "loss0": round(loss0, 4),
        "GFLOP": round(flops / 1e9, 1),
        "GB_accessed": round(hbm / 1e9, 2),
        "hbm_bound_ms_at_819GBps": round(hbm / 819e9 * 1e3, 2),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--variants", nargs="*",
                    default=["pallas:fp32", "scan:fp32", "pallas:bf16"])
    args = ap.parse_args()
    for v in args.variants:
        backend, d = v.split(":")
        dtype = jnp.bfloat16 if d == "bf16" else None
        print(bench(backend, dtype, args.batch), flush=True)
