"""Static HBM-traffic breakdown of the stage-1 train step.

Compiles the train step, walks the optimized HLO entry computation, and
ranks instructions by output bytes (a proxy for HBM writes; operands of
fusions are the reads). Used to target the VERDICT #3 bandwidth work.
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

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.train import create_train_state, make_train_step_vqvae

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
    cfg = VQVAEConfig()
    model = SNNVQVAE(cfg, backend="auto")
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (BATCH, 28, 28, 1), jnp.float32) - 0.5
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        key, images[:2]
    )
    state = create_train_state(model, variables)
    step = make_train_step_vqvae(data_variance=0.1, donate=False)
    hlo = jax.jit(step).lower(state, images).compile().as_text()

    # entry computation = the one with ENTRY marker
    entry = hlo.split("ENTRY")[-1]
    rows = []
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (.+?) (\w+)\(", line)
        if not m:
            continue
        name, sig, op = m.groups()
        out_b = shape_bytes(sig.split(" ")[0] if "(" not in sig else sig)
        rows.append((out_b, op, name, line[:160]))
    rows.sort(reverse=True)
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
