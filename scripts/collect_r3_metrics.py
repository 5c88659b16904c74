"""Collect the round-3 flagship metrics.json files into one STATUS table."""

import glob
import json
import os
import re
import sys


def best_temp(d):
    best = None
    for k, v in d.items():
        if not re.match(r"^[0-9.]+$", k):
            continue
        if best is None or v.get("FID", 1e18) < best[1].get("FID", 1e18):
            best = (k, v)
    return best


def recon_from_log(tag):
    path = f"/tmp/r3_{tag}.log"
    if not os.path.exists(path):
        return "", ""
    mse = ssim = ""
    for line in open(path, errors="ignore"):
        if line.startswith("loss_mse"):
            mse = line.split("=")[-1].strip()
        if line.startswith("loss_ssim"):
            ssim = line.split("=")[-1].strip()
    return mse, ssim


def main(root="sample_r3"):
    rows = []
    for path in sorted(glob.glob(f"{root}/*/*/metrics.json")):
        d = json.load(open(path))
        ds, model = path.split(os.sep)[1:3]
        t, e = best_temp(d)
        fs = d.get("feature_space", {})
        tag = {"snn-vae": "snnvae", "vq-vae": "annvq"}.get(model, ds)
        if ds == "CIFAR10" and model == "snn-vq-vae":
            tag = "cifar_rgb"
        mse, _ = recon_from_log(tag)
        rows.append(
            f"| {ds} | {model} | {mse} | {e.get('FID')} | {e.get('IS')} | "
            f"{e.get('mode_KL')} | {e.get('covered_modes')} | "
            f"{d.get('null_FID')} | {t} | {fs.get('sha256','')[:8]} "
            f"{'ok' if fs.get('stats_verified') else ''} |"
        )
    print("| dataset | model | MSE | FID | IS | mode-KL | modes | "
          "null-FID | best-t | space |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main(*sys.argv[1:])
