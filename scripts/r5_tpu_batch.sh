#!/bin/bash
# Round-5 TPU batch — the judge's r4 punch list, evidence-first.
# Every stage banks its artifacts into git via bank_evidence.sh as a
# postcondition (VERDICT r4 "Next round" #5): a killed run loses at most
# the in-flight stage.
#
#   setsid nohup bash scripts/r5_tpu_batch.sh >> /tmp/r5/batch1.log 2>&1 &
#
# Stages:
#   1 — Letters temperature sweep on the COMMITTED r3 30+60 checkpoint
#       (VERDICT #2): re-verify the 422.4 row from repo-resident weights
#       and test t>1 (r4 saw FID still improving at t=1.0).
#   2 — MNIST flagship 48+96 retrain + FULL reference eval protocol
#       (VERDICT #1): 12-temp sweep (superset: +1.1,+1.2) x 1280 images,
#       checkpoints + metrics.json + grids committed.
#   3 — Letters 30+60 reproduction (VERDICT #2): is the 48+96 regression
#       epochs or seed-luck? Same eval superset.
#   4 — bf16 seed-43 quality re-run (r4 stage-18, killed by the VM
#       reset): calibrates FID sampling noise for the int8 decision.
#   5 — bench at the candidate headline config (int8 + row scales + il2,
#       int8 logits): warms the compile cache for the driver and banks
#       the number the bench.py default flip claims.
set -u
cd /root/repo
mkdir -p /tmp/r5
BANK=scripts/bank_evidence.sh

stage() { echo "=== R5 STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

TEMPS_FULL="0.001,0.01,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0,1.1,1.2"

stage "1: Letters t-sweep on committed r3 checkpoint"
timeout 7200 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name Letters --model snn-vq-vae \
  --checkpoint ./result_r3/Letters/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 0.9,1.0,1.1,1.3,1.6,2.0 \
  --sample_dir ./sample_r5_letters_r3ck \
  > /tmp/r5/letters_r3ck.log 2>&1
echo "rc=$?"; tail -4 /tmp/r5/letters_r3ck.log
bash $BANK "r5 evidence: Letters t-sweep on committed r3 checkpoint" \
  sample_r5_letters_r3ck

stage "2: MNIST flagship 48+96 retrain + full 12-temp x 1280 protocol"
timeout 18000 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae --epochs 48 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures "$TEMPS_FULL" \
  --result_dir ./result_r5 --sample_dir ./sample_r5 \
  > /tmp/r5/mnist4896.log 2>&1
echo "rc=$?"; tail -6 /tmp/r5/mnist4896.log
bash $BANK "r5 evidence: MNIST flagship 48+96 checkpoints + 14-temp metrics + grids" \
  result_r5/MNIST sample_r5/MNIST

stage "3: Letters 30+60 reproduction (r3 recipe)"
timeout 14400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name Letters --model snn-vq-vae --epochs 30 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures "$TEMPS_FULL" \
  --result_dir ./result_r5 --sample_dir ./sample_r5 \
  > /tmp/r5/letters3060.log 2>&1
echo "rc=$?"; tail -6 /tmp/r5/letters3060.log
bash $BANK "r5 evidence: Letters 30+60 repro checkpoints + 14-temp metrics" \
  result_r5/Letters sample_r5/Letters

stage "4: bf16 seed-43 quality (FID noise calibration, r4 stage-18 redo)"
timeout 5400 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae --seed 43 \
  --checkpoint ./result_r3/MNIST/snn-vq-vae --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures 1.0 \
  --sample_dir ./sample_r5_bf16_s43 \
  > /tmp/r5/bf16_s43.log 2>&1
echo "rc=$?"; tail -3 /tmp/r5/bf16_s43.log
bash $BANK "r5 evidence: bf16 seed-43 FID noise arm" sample_r5_bf16_s43

stage "5: bench at candidate headline config (int8 + row + il2)"
BENCH_DTYPE=int8 SD_FUSED_INTERLEAVE=2 BENCH_EXTRAS=0 \
  timeout 3600 python -u bench.py \
  > /tmp/r5/bench_int8_final.json 2>/tmp/r5/bench_int8_final.err
echo "rc=$?"; cat /tmp/r5/bench_int8_final.json
cp /tmp/r5/bench_int8_final.json BENCH_CANDIDATE_r05.json 2>/dev/null
bash $BANK "r5 evidence: int8+row+il2 candidate bench" BENCH_CANDIDATE_r05.json

echo "ALL R5 BATCH1 STAGES COMPLETE ($(date -u +%H:%M:%S))"
