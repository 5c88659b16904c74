"""Static HBM-traffic breakdown of the STAGE-2 (diffusion) train step.

Same methodology as analyze_train_hlo.py (VERDICT r2 next #2: find where
the 40.3 ms bf16 step's ~24 GB of traffic actually goes before deciding
whether a training megakernel is worth building): compile the step, walk
the optimized HLO entry computation, rank instructions by output bytes.

Usage: python scripts/analyze_stage2_hlo.py [--bf16]
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import SpikingDenoiser
from spiking_diffusion_tpu.train import create_train_state
from spiking_diffusion_tpu.train.stage2 import make_train_step_diffusion

BATCH = 256

DT_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
            "u8": 1, "f16": 2, "s64": 8, "u64": 8}

shape_re = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in shape_re.findall(sig):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main():
    bf16 = "--bf16" in sys.argv
    backend = "auto"
    for a in sys.argv[1:]:
        if a.startswith("--backend="):
            backend = a.split("=", 1)[1]
    cfg = DiffusionConfig()
    denoiser = SpikingDenoiser(
        cfg, backend=backend, dtype=jnp.bfloat16 if bf16 else None
    )
    key = jax.random.PRNGKey(0)
    x0 = jax.random.randint(key, (BATCH, 7, 7), 0, cfg.num_embeddings,
                            jnp.int32)
    t0 = jnp.ones((BATCH,), jnp.int32)
    variables = jax.jit(
        lambda k, x, t: denoiser.init(k, x, t, train=True)
    )(key, x0[:2], t0[:2])
    state = create_train_state(denoiser, variables)
    step = make_train_step_diffusion(cfg, donate=False)
    hlo = jax.jit(step.__wrapped__).lower(
        state, x0, jax.random.PRNGKey(1)
    ).compile().as_text()

    entry = hlo.split("ENTRY")[-1]
    rows = []
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (.+?) (\w+)\(", line)
        if not m:
            continue
        name, sig, op = m.groups()
        out_b = shape_bytes(sig.split(" ")[0] if "(" not in sig else sig)
        rows.append((out_b, op, name, line[:200]))
    rows.sort(reverse=True)
    print(f"dtype={'bf16' if bf16 else 'fp32'} backend={backend} batch={BATCH}")
    print(f"total output bytes (entry): {sum(r[0] for r in rows)/1e9:.2f} GB")
    by_op = defaultdict(float)
    for b, op, *_ in rows:
        by_op[op] += b
    print("\n-- bytes by op kind --")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{op:20s} {b/1e9:8.3f} GB")
    print("\n-- top 40 instructions by output bytes --")
    for b, op, name, line in rows[:40]:
        print(f"{b/1e6:9.1f} MB  {line}")


if __name__ == "__main__":
    main()
