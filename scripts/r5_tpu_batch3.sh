#!/bin/bash
# Round-5 TPU batch 3 — final quality push with the 60+120 recipe that
# took MNIST 119.64 -> 41.62 (stage 10), plus more Letters best-of-N arms.
#
#   setsid nohup bash scripts/r5_tpu_batch3.sh >> /tmp/r5b/batch3.log 2>&1 &
#
# Stages (chip-serial; each ~15-30 min):
#   11/12 — FMNIST / KMNIST 60+120 retrains (committed r3 bests: 70.58 /
#           66.88 from the 30+60 recipe). Checkpoints bank only on a win.
#   13/14 — Letters 30+60 seeds 46 / 47 (best-of-N; committed best 160.31).
#   15    — MNIST 100+200 stretch (committed best 41.62).
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

# run_arm <stage> <dataset> <epochs> <seed> <tag> <beat>
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

run_arm 11 FMNIST  60 42 r5_f60  70.58
run_arm 12 KMNIST  60 42 r5_k60  66.88
run_arm 13 Letters 30 46 r5_s46 160.31
run_arm 14 Letters 30 47 r5_s47 160.31
run_arm 15 MNIST  100 42 r5_e100 41.62

echo "ALL R5 BATCH3 STAGES COMPLETE ($(date -u +%H:%M:%S))"
