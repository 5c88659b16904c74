#!/bin/bash
# Round-4 follow-up TPU batch (stages 9-11) — launch alongside
# r4_tpu_batch_resume.sh; it WAITS for that batch to finish first
# (serial TPU rule: one client at a time).
#
#   setsid nohup bash scripts/r4_tpu_batch3.sh >> /tmp/r4/batch3.log 2>&1 &
#
# Stages:
#   9  — int8 ladder re-run with the il4 rows (is il2 the knee?)
#   10 — END-TO-END int8 bench with SD_FUSED_INTERLEAVE=2 (the ladder's
#        il2 win is fwd-only; confirm it survives the full sampler)
#   11 — int8 quality with percentile-clip weight scaling
#        (SD_INT8_CLIP_PCT=99.9): can clipping close the 210.6-vs-174.3
#        same-seed FID gap to bf16?
set -u
cd /root/repo
mkdir -p /tmp/r4

stage() { echo "=== STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

echo "waiting for r4_tpu_batch_resume.sh to finish..."
while true; do
  grep -q 'ALL R4 BATCH STAGES COMPLETE' /tmp/r4/batch.log 2>/dev/null && break
  pgrep -x bash -a | grep -q r4_tpu_batch_resume || { echo "batch gone (no COMPLETE marker) — proceeding"; break; }
  sleep 120
done
echo "prior batch done ($(date -u +%H:%M:%S))"

stage "9: int8 ladder incl. il4"
timeout 2400 python -u scripts/bench_int8_ladder.py \
  > /tmp/r4/ladder_il4.log 2>&1
echo "rc=$?"; tail -15 /tmp/r4/ladder_il4.log

stage "10: end-to-end int8 bench at il2"
BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=2 BENCH_EXTRAS=0 \
  timeout 2400 python -u bench.py \
  > /tmp/r4/bench_int8_il2.json 2>/tmp/r4/bench_int8_il2.err
echo "rc=$?"; cat /tmp/r4/bench_int8_il2.json

stage "11: int8 + clip 99.9 quality (same checkpoint/seed as 3a/3b)"
SD_INT8_CLIP_PCT=99.9 timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.0 \
  --sampler_dtype int8 --sample_dir ./sample_r4_int8clip \
  > /tmp/r4/int8clip_eval.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/int8clip_eval.log

echo "ALL R4 BATCH3 STAGES COMPLETE ($(date -u +%H:%M:%S))"
