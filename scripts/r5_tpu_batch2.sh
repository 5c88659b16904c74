#!/bin/bash
# Round-5 TPU batch 2 — broaden the repo-resident quality evidence.
# Waits for the xyband A/B (`/tmp/r5b/xyband_ab.log`) to free the chip.
#
#   setsid nohup bash scripts/r5_tpu_batch2.sh >> /tmp/r5b/batch2.log 2>&1 &
#
# Stages:
#   6/7 — FMNIST / KMNIST full 14-temp x 1,280 sweeps on the COMMITTED
#         r3 checkpoints: makes the r3 STATUS-prose numbers (83.3 / 67.3)
#         re-verifiable from repo-resident weights under the current
#         (KID_x1e3) metric conventions.
#   8/9 — Letters 30+60 at seeds 44 / 45: the best-of-N protocol the
#         Letters variance analysis calls for (STATUS.md). Checkpoints
#         bank only if the arm beats the committed 355.36; metrics
#         always bank.
#   10  — MNIST 60+120 stretch retrain (VERDICT #1 stretch: FID <= 80).
#         Checkpoints bank only if it beats the 48+96 flagship's 119.64.
set -u
cd /root/repo
mkdir -p /tmp/r5b
BANK=scripts/bank_evidence.sh
TEMPS_FULL="0.001,0.01,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0,1.1,1.2"

stage() { echo "=== R5B STAGE $1 ($(date -u +%H:%M:%S)) ==="; }

# best_fid <metrics.json> -> prints the min FID across temperatures
best_fid() {
  python - "$1" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(min(r["FID"] for r in d.values() if isinstance(r, dict) and "FID" in r))
EOF
}

# wait for the xyband A/B to finish (it owns the chip)
for i in $(seq 1 120); do
  grep -q "ladder done" /tmp/r5b/xyband_ab.log 2>/dev/null && break
  sleep 30
done

for DS in FMNIST KMNIST; do
  stage "6/7: $DS 14-temp sweep on committed r3 checkpoint"
  timeout 7200 python -u -m spiking_diffusion_tpu.cli \
    --dataset_name "$DS" --model snn-vq-vae \
    --checkpoint "./result_r3/$DS/snn-vq-vae" --bf16 --batch_size 256 \
    --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
    --frozen_metrics on --temperatures "$TEMPS_FULL" \
    --sample_dir ./sample_r5 \
    > "/tmp/r5b/${DS}_r3ck.log" 2>&1
  echo "rc=$?"; tail -4 "/tmp/r5b/${DS}_r3ck.log"
  bash $BANK "r5 evidence: $DS 14-temp sweep on committed r3 checkpoint" \
    "sample_r5/$DS"
done

for SEED in 44 45; do
  stage "8/9: Letters 30+60 seed $SEED (best-of-N arm)"
  timeout 14400 python -u -m spiking_diffusion_tpu.cli \
    --dataset_name Letters --model snn-vq-vae --epochs 30 --seed "$SEED" \
    --bf16 --batch_size 256 \
    --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
    --frozen_metrics on --temperatures "$TEMPS_FULL" \
    --result_dir "./result_r5_s$SEED" --sample_dir "./sample_r5_s$SEED" \
    > "/tmp/r5b/letters_s$SEED.log" 2>&1
  echo "rc=$?"; tail -4 "/tmp/r5b/letters_s$SEED.log"
  M="sample_r5_s$SEED/Letters/snn-vq-vae/metrics.json"
  bash $BANK "r5 evidence: Letters 30+60 seed-$SEED metrics (best-of-N arm)" \
    "sample_r5_s$SEED/Letters"
  if [ -f "$M" ]; then
    FID=$(best_fid "$M")
    echo "seed $SEED best FID: $FID"
    if python -c "import sys; sys.exit(0 if float('$FID') < 355.36 else 1)"; then
      bash $BANK "r5 evidence: Letters seed-$SEED checkpoints (beats 355.36: FID $FID)" \
        "result_r5_s$SEED/Letters"
    fi
  fi
done

stage "10: MNIST 60+120 stretch retrain"
timeout 18000 python -u -m spiking_diffusion_tpu.cli \
  --dataset_name MNIST --model snn-vq-vae --epochs 60 \
  --bf16 --batch_size 256 \
  --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
  --frozen_metrics on --temperatures "$TEMPS_FULL" \
  --result_dir ./result_r5_e60 --sample_dir ./sample_r5_e60 \
  > /tmp/r5b/mnist60120.log 2>&1
echo "rc=$?"; tail -6 /tmp/r5b/mnist60120.log
M=sample_r5_e60/MNIST/snn-vq-vae/metrics.json
bash $BANK "r5 evidence: MNIST 60+120 stretch metrics" sample_r5_e60/MNIST
if [ -f "$M" ]; then
  FID=$(best_fid "$M")
  echo "60+120 best FID: $FID"
  if python -c "import sys; sys.exit(0 if float('$FID') < 119.64 else 1)"; then
    bash $BANK "r5 evidence: MNIST 60+120 checkpoints (beats 48+96: FID $FID)" \
      result_r5_e60/MNIST
  fi
fi

echo "ALL R5 BATCH2 STAGES COMPLETE ($(date -u +%H:%M:%S))"
