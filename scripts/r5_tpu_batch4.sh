#!/bin/bash
# Round-5 TPU batch 4 — int8 evidence at the new flagship tier + ladder
# confirmation under the 'xyband' default. Waits for batch3's completion
# marker before touching the chip.
#
#   setsid nohup bash scripts/r5_tpu_batch4.sh >> /tmp/r5b/batch4.log 2>&1 &
#
# Stages:
#   16 — int8 megakernel 14-temp x 1,280 sweep on the committed 60+120
#        flagship checkpoint, at the exact headline config
#        (int8 + row scales + il2 + xyband): quantifies the int8
#        sampler's quality cost at the flagship tier (bf16 best 41.62).
#   17 — interleave ladder (il1/il2/il4 + bf16-logits arm) under xyband:
#        confirms il2 is still the right headline knob post-xyband.
set -u
cd /root/repo
mkdir -p /tmp/r5b
BANK=scripts/bank_evidence.sh
TEMPS_FULL="0.001,0.01,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0,1.1,1.2"

stage() { echo "=== R5B STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

for i in $(seq 1 480); do
  grep -q "ALL R5 BATCH3 STAGES COMPLETE" /tmp/r5b/batch3.log 2>/dev/null && break
  sleep 30
done

stage "16: int8 sweep on 60+120 flagship checkpoint (headline config)"
SD_FUSED_INTERLEAVE=2 timeout 7200 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r5_e60/MNIST/snn-vq-vae \
  --bf16 --sampler_dtype int8 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures "$TEMPS_FULL" \
  --sample_dir ./sample_r5_e60_int8 \
  > /tmp/r5b/mnist_e60_int8.log 2>&1
echo "rc=$?"; tail -3 /tmp/r5b/mnist_e60_int8.log
bash $BANK "r5 evidence: int8 sampler 14-temp sweep on 60+120 flagship (headline config)" \
  sample_r5_e60_int8/MNIST

stage "17: interleave ladder under xyband"
for ARM in "il1:BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=1" \
           "il2:BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=2" \
           "il4:BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=4" \
           "il2-bf16logits:BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=2 SD_INT8_LOGITS=bf16"; do
  NAME="${ARM%%:*}"; ENVS="${ARM#*:}"
  echo "--- ladder $NAME ---"
  env $ENVS timeout 1200 python -u bench.py 2>/tmp/r5b/ladder_$NAME.err
  echo "rc=$?"
done
echo "ladder done"

echo "ALL R5 BATCH4 STAGES COMPLETE ($(date -u +%H:%M:%S))"
