"""CPU analysis: int8 weight-quantization error vs scale granularity.

Loads the flagship diffusion checkpoint, BN-folds the denoiser convs
(the exact tensors the int8 megakernel quantizes), and reports the
relative RMS weight error under candidate quantizers:

  per-cout max      — what the kernel ships today (scale = max|w|/127)
  per-cout clip p   — percentile scaling with saturation (SD_INT8_CLIP_PCT)
  per-(row,cout)    — one scale per kernel-row dy (3x finer; the xyrow
                      kernel dequantizes v[dy] separately, so this is
                      implementable with 2 extra VPU multiplies per conv)
  per-(row,cout) clip
  per-tap           — 9 scales per cout ('xy' mode could dequant per tap)

Usage: python scripts/run_cpu.py scripts/analyze_int8_quant.py [ckpt_dir]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

CKPT = os.path.abspath(
    sys.argv[1] if len(sys.argv) > 1 else "./result_r3/MNIST/snn-vq-vae"
)


def load_params(path):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    return tree


def rel_err(w, deq):
    return float(np.linalg.norm(deq - w) / max(np.linalg.norm(w), 1e-30))


def quantize(w, axes, pct=None):
    """w: (9, Cin, Cout). axes: reduction axes for the scale."""
    aw = np.abs(w)
    if pct is None:
        amax = aw.max(axis=axes, keepdims=True)
    else:
        amax = np.percentile(aw, pct, axis=axes, keepdims=True)
    s = np.maximum(amax / 127.0, 1e-12)
    wq = np.clip(np.round(w / s), -127, 127)
    return wq * s


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from spiking_diffusion_tpu.snn.functional import folded_conv_params

    tree = load_params(f"{CKPT}/diff_result/diff_model")
    # TrainState layout: {'params': ..., 'batch_stats': ..., ...}
    variables = {
        "params": tree["params"],
        "batch_stats": tree.get("batch_stats", {}),
    }
    n_blocks = sum(1 for k in tree["params"] if k.startswith("SeqConv")) - 1
    blocks = folded_conv_params(variables, n_blocks)
    print(f"{n_blocks} folded convs from {CKPT}")

    variants = [
        ("per-cout max (ship)", dict(axes=(0, 1))),
        ("per-cout clip 99.9", dict(axes=(0, 1), pct=99.9)),
        ("per-cout clip 99.5", dict(axes=(0, 1), pct=99.5)),
        ("per-cout clip 99.0", dict(axes=(0, 1), pct=99.0)),
        ("per-row max", dict(axes=(1,))),
        ("per-row clip 99.5", dict(axes=(1,), pct=99.5)),
        ("per-tap max", dict(axes=())),
    ]
    tot = {name: [] for name, _ in variants}
    for i, (k, _b) in enumerate(blocks[1:]):  # first conv stays fp32
        w = np.asarray(k, np.float32).reshape(9, k.shape[2], k.shape[3])
        wrow = w.reshape(3, 3 * k.shape[2], k.shape[3])
        row = []
        for name, kw in variants:
            if kw["axes"] == (1,):
                deq = quantize(wrow, (1,), kw.get("pct")).reshape(w.shape)
            elif kw["axes"] == ():
                deq = quantize(w, (1,), kw.get("pct"))
            else:
                deq = quantize(w, kw["axes"], kw.get("pct"))
            e = rel_err(w, deq)
            tot[name].append(e)
            row.append(f"{e:.5f}")
        print(f"conv{i+1} {str(w.shape):>16}: " + "  ".join(row))
    print("\nmean relative RMS weight error:")
    base = np.mean(tot[variants[0][0]])
    for name, _ in variants:
        m = np.mean(tot[name])
        print(f"  {name:22s}: {m:.5f}  ({m/base:5.3f}x of ship)")

    # mixed-precision prediction (SD_INT8_LOGITS=bf16): how much weight
    # error does keeping the LOGITS conv in bf16 remove, per conv?
    import jax.numpy as jnp

    print("\nbf16 rounding vs int8 per-row rounding, per conv:")
    for i, (k, _b) in enumerate(blocks[1:]):
        w = np.asarray(k, np.float32).reshape(9, k.shape[2], k.shape[3])
        wrow = w.reshape(3, 3 * k.shape[2], k.shape[3])
        bf = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
        e_bf = rel_err(w, bf)
        e_i8 = rel_err(w, quantize(wrow, (1,)).reshape(w.shape))
        tag = "LOGITS" if i == len(blocks) - 2 else f"conv{i+1}"
        print(f"  {tag:8s}: bf16 {e_bf:.5f}  int8/row {e_i8:.5f}  "
              f"(bf16 = {e_bf/max(e_i8,1e-12):.3f}x of int8)")


if __name__ == "__main__":
    main()
