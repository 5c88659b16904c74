#!/bin/bash
# Round-4 TPU batch 5 (stages 16-19) — WAITS for r4_tpu_batch4.sh.
#
#   setsid nohup bash scripts/r4_tpu_batch5.sh >> /tmp/r4/batch5.log 2>&1 &
#
# Stages:
#   16 — roofline ladder: the new ablation rows (nolif/noshift/matmul)
#        quantify the VPU wall behind the 0.54-int8-MFU ceiling, plus a
#        per-cout-scales row isolating the per-row dequant cost
#   17 — int8-row + bf16 LOGITS conv quality (SD_INT8_LOGITS=bf16), same
#        checkpoint/seed as the A/B arms (bf16 174.31 / int8-row 180.86 /
#        int8-cout 210.59): does keeping the sampler-facing conv in bf16
#        close the last ~6 FID?
#   18 — FID seed-noise estimate: the bf16 arm re-run with --seed 43
#        (same checkpoint + frozen ref stats; only the sampling draw and
#        synthetic sets move) — calibrates "within noise" for the
#        int8-headline decision
#   19 — end-to-end bench at the candidate final config
#        (int8 + il2 + bf16 logits) — warms the compile cache too
set -u
cd /root/repo
mkdir -p /tmp/r4

stage() { echo "=== STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

echo "waiting for r4_tpu_batch4.sh to finish..."
while true; do
  grep -q 'ALL R4 BATCH4 STAGES COMPLETE' /tmp/r4/batch4.log 2>/dev/null && break
  pgrep -x bash -a | grep -q r4_tpu_batch4 || { echo "batch4 gone (no COMPLETE marker) — proceeding"; break; }
  sleep 120
done
echo "prior batch done ($(date -u +%H:%M:%S))"

stage "16: roofline ablation ladder"
timeout 3600 python -u scripts/bench_int8_ladder.py \
  > /tmp/r4/ladder_roofline.log 2>&1
echo "rc=$?"; grep -v WARNING /tmp/r4/ladder_roofline.log | tail -18

stage "17: int8-row + bf16-logits quality (same checkpoint/seed)"
SD_INT8_LOGITS=bf16 timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.0 \
  --sampler_dtype int8 --sample_dir ./sample_r4_int8mix \
  > /tmp/r4/int8mix_eval.log 2>&1
echo "rc=$?"; tail -3 /tmp/r4/int8mix_eval.log

stage "18: bf16 quality at --seed 43 (FID noise estimate)"
timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae --seed 43 \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.0 \
  --sample_dir ./sample_r4_bf16_s43 \
  > /tmp/r4/bf16_s43_eval.log 2>&1
echo "rc=$?"; tail -3 /tmp/r4/bf16_s43_eval.log

stage "19: end-to-end bench, candidate final config (int8+il2+bf16 logits)"
BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=2 SD_INT8_LOGITS=bf16 BENCH_EXTRAS=0 \
  timeout 2400 python -u bench.py \
  > /tmp/r4/bench_int8_mix.json 2>/tmp/r4/bench_int8_mix.err
echo "rc=$?"; cat /tmp/r4/bench_int8_mix.json

echo "ALL R4 BATCH5 STAGES COMPLETE ($(date -u +%H:%M:%S))"
