#!/bin/bash
# Round-4 TPU batch 4 (stages 12-15) — launch alongside r4_tpu_batch3.sh;
# WAITS for that batch's COMPLETE marker first (serial TPU rule).
#
#   setsid nohup bash scripts/r4_tpu_batch4.sh >> /tmp/r4/batch4.log 2>&1 &
#
# Stages:
#   12 — int8 quality with per-kernel-row scales (the new SD_INT8_SCALES=row
#        default; 0.75x the weight-rounding error of per-cout on this
#        checkpoint). Same checkpoint/seed as the banked A/B arms:
#        bf16 174.31 / int8-cout 210.59 @ t=1.0. If this lands within
#        noise of bf16, the bench headline flips to int8.
#   13 — Letters t>1 sweep on the r4 48+96 checkpoint (FID was still
#        monotonically improving at t=1.0 — is the model dist too peaked?)
#   14 — Letters 30+60 reproduction (the r3 recipe that scored 422.4):
#        is the 48+96 regression epochs or luck-of-the-seed?
#   15 — MNIST t>1 sweep on the r4 flagship checkpoint (119.6 @ t=1.0,
#        also still improving with temp)
set -u
cd /root/repo
mkdir -p /tmp/r4

stage() { echo "=== STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

echo "waiting for r4_tpu_batch3.sh to finish..."
while true; do
  grep -q 'ALL R4 BATCH3 STAGES COMPLETE' /tmp/r4/batch3.log 2>/dev/null && break
  pgrep -x bash -a | grep -q r4_tpu_batch3 || { echo "batch3 gone (no COMPLETE marker) — proceeding"; break; }
  sleep 120
done
echo "prior batch done ($(date -u +%H:%M:%S))"

stage "12: int8 + per-row scales quality (same checkpoint/seed as the A/B)"
SD_INT8_SCALES=row timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.0 \
  --sampler_dtype int8 --sample_dir ./sample_r4_int8row \
  > /tmp/r4/int8row_eval.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/int8row_eval.log

stage "13: Letters t>1 sweep on the r4 48+96 checkpoint"
timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name Letters --model snn-vq-vae \
  --checkpoint ./result_r4/Letters/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.1,1.3,1.6,2.0 \
  --sample_dir ./sample_r4_letters_hot \
  > /tmp/r4/letters_hot.log 2>&1
echo "rc=$?"; tail -6 /tmp/r4/letters_hot.log

stage "14: Letters 30+60 reproduction (r3 recipe)"
timeout 14400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name Letters --model snn-vq-vae --epochs 30 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 0.9,1.0,1.2 \
  --result_dir ./result_r4_letters3060 --sample_dir ./sample_r4_letters3060 \
  > /tmp/r4/letters3060.log 2>&1
echo "rc=$?"; tail -5 /tmp/r4/letters3060.log

stage "15: MNIST t>1 sweep on the r4 flagship checkpoint"
timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r4/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.1,1.2,1.4 \
  --sample_dir ./sample_r4_mnist_hot \
  > /tmp/r4/mnist_hot.log 2>&1
echo "rc=$?"; tail -5 /tmp/r4/mnist_hot.log

echo "ALL R4 BATCH4 STAGES COMPLETE ($(date -u +%H:%M:%S))"
