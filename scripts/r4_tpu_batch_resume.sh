#!/bin/bash
# Round-4 TPU evidence batch — RESUME from stage 3b (stages 1,2,3a banked
# in /tmp/r4 by the first run; the runner died mid-3b when its parent
# session ended). Same rules: SERIAL, one TPU client at a time.
set -u
cd /root/repo
mkdir -p /tmp/r4

stage() { echo "=== STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

EVAL_COMMON="--dataset_name MNIST --model snn-vq-vae \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 0.9,1.0"

stage "3b: quality A/B bf16 sampler (same seed)"
timeout 5400 python -u -m spiking_diffusion_tpu.cli $EVAL_COMMON \
  --sampler_dtype bf16 --sample_dir ./sample_r4_bf16 \
  > /tmp/r4/bf16_eval.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/bf16_eval.log

stage "4: int8 conv-mode/block ladder"
timeout 2400 python -u scripts/bench_int8_ladder.py \
  > /tmp/r4/ladder.log 2>&1
echo "rc=$?"; tail -20 /tmp/r4/ladder.log

stage "5: MNIST flagship retrain at the round-2 winning 48+96 recipe"
timeout 14400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae --epochs 48 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --result_dir ./result_r4 --sample_dir ./sample_r4 \
  > /tmp/r4/mnist48.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/mnist48.log

stage "6: Letters flagship retrain (422.4-FID row, VERDICT #3)"
timeout 14400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name Letters --model snn-vq-vae --epochs 48 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --result_dir ./result_r4 --sample_dir ./sample_r4 \
  > /tmp/r4/letters48.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/letters48.log

stage "7a: snn-vae characterization — annealed p, 96 epochs (VERDICT #4)"
timeout 10800 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vae --epochs 96 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --result_dir ./result_r4 --sample_dir ./sample_r4 \
  > /tmp/r4/snnvae.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/snnvae.log

stage "7b: snn-vae A/B — scheduled sampling OFF (reference-as-shipped p=0)"
timeout 10800 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vae --epochs 96 --vae_scheduled_p off \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --result_dir ./result_r4_vaeoff \
  --sample_dir ./sample_r4_vaeoff \
  > /tmp/r4/snnvae_off.log 2>&1
echo "rc=$?"; tail -4 /tmp/r4/snnvae_off.log

stage "8: serving latency with the speculative pipeline (VERDICT #7)"
timeout 2400 python -u examples/serve.py \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --batch 16 --dtype int8 \
  --bench 16 > /tmp/r4/serve_int8.json 2>/tmp/r4/serve_int8.err
echo "rc=$?"; cat /tmp/r4/serve_int8.json

echo "ALL R4 BATCH STAGES COMPLETE ($(date -u +%H:%M:%S))"
