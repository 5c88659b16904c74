"""Static HBM-traffic breakdown of the generation pipeline (bench.py's
jitted 49-step sampler + decode), mirroring analyze_train_hlo.py."""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench as B
from scripts.analyze_train_hlo import DT_BYTES, shape_bytes  # noqa: E402


def main():
    gen, m_vars, d_vars = B.build()[:3]
    key = jax.random.PRNGKey(0)
    compiled = gen.lower(m_vars, d_vars, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"cost analysis: {ca['flops']/1e12:.2f} TFLOP, "
          f"{ca.get('bytes accessed', 0)/1e9:.2f} GB accessed")
    hlo = compiled.as_text()

    # the sampler's 49-step loop lives in a while-body computation — walk
    # ALL computations, aggregate by op kind and report the largest
    rows = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (.+?) (\w+)\(", line)
        if not m:
            continue
        name, sig, op = m.groups()
        rows.append((shape_bytes(sig), op, name, line[:200]))
    rows.sort(reverse=True)
    by_op = defaultdict(float)
    for b, op, *_ in rows:
        by_op[op] += b
    print("\n-- output bytes by op kind (all computations; loop bodies "
          "execute 49x but are counted once) --")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{op:20s} {b/1e9:8.3f} GB")
    print("\n-- top 30 instructions --")
    for b, op, name, line in rows[:30]:
        print(f"{b/1e6:9.1f} MB  {line[:170]}")


if __name__ == "__main__":
    main()
