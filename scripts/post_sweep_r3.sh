#!/bin/bash
# Round-3 post-sweep TPU batch: perf measurements + fast-sampling quality
# + on-hardware parity, run SERIALLY (one TPU client at a time).
set -u
cd /root/repo

echo "=== 1. bench.py (new fields: mfu_useful, batch-16 latency) ==="
timeout 1800 python bench.py 2>/dev/null | tail -1 | tee /tmp/r3_bench.json

echo "=== 2. bench.py xyrow A/B ==="
SD_CONV_MODE=xyrow timeout 1800 python bench.py 2>/dev/null | tail -1 \
  | tee /tmp/r3_bench_xyrow.json

echo "=== 3. stage-2 train step bench ==="
timeout 1800 python scripts/bench_stage2_step.py 2>/dev/null \
  | tee /tmp/r3_s2bench.txt

echo "=== 4. stage-2 TPU HLO traffic ==="
timeout 1800 python scripts/analyze_stage2_hlo.py --bf16 \
  > /tmp/r3_s2hlo_tpu.log 2>&1
head -14 /tmp/r3_s2hlo_tpu.log

echo "=== 5. fast-sampling quality (strided 25 vs 49, frozen space) ==="
timeout 3600 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.0 --sample_steps 25 \
  --sample_dir ./sample_r3_fast25 > /tmp/r3_fast25.log 2>&1
tail -4 /tmp/r3_fast25.log

echo "=== 6. pallas LIF parity on real TPU ==="
timeout 900 python -u - > /tmp/r3_pallas_parity.log 2>&1 << 'EOF'
import jax, jax.numpy as jnp, numpy as np
from spiking_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_scan
from spiking_diffusion_tpu.ops.pallas_lif import lif_fused
from spiking_diffusion_tpu.ops.unrolled_lif import lif_unrolled
p = NeuronParams()
x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 1024), jnp.float32)
s_ref = np.asarray(jax.jit(lambda x: lif_scan(x, params=p)[0])(x))
g_ref = np.asarray(jax.jit(
    jax.grad(lambda x: jnp.sum(lif_scan(x, params=p)[0] ** 2))
)(x))
for name, fn in (("pallas", lif_fused), ("unroll", lif_unrolled)):
    s_new = np.asarray(jax.jit(lambda x: fn(x, params=p))(x))
    fwd = float(np.max(np.abs(s_new - s_ref)))
    g_new = np.asarray(jax.jit(
        jax.grad(lambda x: jnp.sum(fn(x, params=p) ** 2))
    )(x))
    gd = float(np.max(np.abs(g_new - g_ref)))
    print(f"{name}: fwd maxdiff {fwd:.2e}  grad maxdiff {gd:.2e}")
EOF
cat /tmp/r3_pallas_parity.log | tail -3

echo "=== 7. serving latency (batch 16, MNIST checkpoint) ==="
timeout 1800 python examples/serve.py \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --batch 16 --bench 8 \
  2>/dev/null | tail -1 | tee /tmp/r3_serve_bench.json

echo "POST-SWEEP BATCH COMPLETE"
