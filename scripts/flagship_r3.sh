#!/bin/bash
# Round-3 flagship sweep: the 5-dataset reference table (snn-vq-vae) plus
# the model matrix (snn-vae, vq-vae, color CIFAR10), every run scored in
# the COMMITTED frozen metric space (--frozen_metrics on) at the
# low-variance protocol (8192-image reference set, canonical synthetic
# sizes). Runs sequentially on the one TPU chip; logs to /tmp/r3_<tag>.log.
set -u
cd /root/repo

COMMON="--bf16 --batch_size 256 --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 --frozen_metrics on"

run() {
  tag="$1"; shift
  echo "=== $tag: $* ==="
  start=$(date +%s)
  python -u -m spiking_diffusion_tpu.cli "$@" > "/tmp/r3_${tag}.log" 2>&1
  rc=$?
  echo "=== $tag done rc=$rc in $(( $(date +%s) - start ))s ==="
}

for DS in MNIST KMNIST FMNIST Letters CIFAR10-BW; do
  run "$DS" --dataset_name "$DS" --model snn-vq-vae --epochs 30 $COMMON \
      --result_dir ./result_r3 --sample_dir ./sample_r3
done

# model matrix (VERDICT r3 item 8): snn-vae + ANN vq-vae on MNIST, and
# the color-CIFAR10 snn-vq-vae
run snnvae --dataset_name MNIST --model snn-vae --epochs 30 $COMMON \
    --result_dir ./result_r3 --sample_dir ./sample_r3
run annvq --dataset_name MNIST --model vq-vae --epochs 30 --batch_size 256 \
    --synthetic_train 60000 --synthetic_test 10240 --ref_size 8192 \
    --frozen_metrics on --result_dir ./result_r3 --sample_dir ./sample_r3
run cifar_rgb --dataset_name CIFAR10 --model snn-vq-vae --epochs 30 $COMMON \
    --result_dir ./result_r3 --sample_dir ./sample_r3

echo "ALL RUNS COMPLETE"
