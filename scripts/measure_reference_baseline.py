"""Measure the ACTUAL PyTorch reference generation pipeline on this host.

Round-1 weakness (VERDICT.md #3): ``bench.py``'s ``vs_baseline`` was a
ratio against an *estimated* reference throughput. This script replaces the
estimate with a measurement: it imports the reference implementation itself
(``/root/reference/Spiking-Diffusion-release``) plus the extracted
spikingjelly at ``/tmp/sj_pkg`` and times the full generation pipeline —
49-step absorbing-diffusion reverse sampling (``snn_model/vq_diffusion.py:
103-142``) at the reference's own batch of 16, followed by the VQ-SVAE
decode (``main.py:388-399``) — on CPU, single-threaded.

The only modification to reference code is a runtime string patch of the
hardcoded ``device='cuda'`` in ``AbsorbingDiffusion.sample`` to ``'cpu'``
(no CUDA on this host); no reference source is copied into this repo.

Writes ``BASELINE_MEASURED.json`` at the repo root:
  - measured per-reverse-step seconds, decode seconds, images/sec (CPU)
  - a documented CPU->GPU scaling assumption and the derived reference
    GPU images/sec that ``bench.py`` uses for ``vs_baseline``.

Run:  python scripts/measure_reference_baseline.py  (takes ~2-5 min)
"""

import inspect
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SJ = "/tmp/sj_pkg"
REF = "/root/reference/Spiking-Diffusion-release"

sys.path.insert(0, SJ)
sys.path.insert(0, REF)

import torch  # noqa: E402

torch.set_num_threads(1)  # this host has 1 core; make the timing honest
torch.manual_seed(42)

# torchvision is not installed here; the reference imports it at module
# scope but the sampler/decode path never touches it — stub it out.
import types  # noqa: E402

_tv = types.ModuleType("torchvision")
_tv.datasets = types.ModuleType("torchvision.datasets")
_tv.transforms = types.ModuleType("torchvision.transforms")
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.datasets", _tv.datasets)
sys.modules.setdefault("torchvision.transforms", _tv.transforms)

from spikingjelly.activation_based import functional  # noqa: E402

import snn_model.vq_diffusion as vqd  # noqa: E402  (reference module)
from snn_model.vae_model import SNN_VQVAE  # noqa: E402

# --- patch the hardcoded 'cuda' in the reference sampler to 'cpu' --------
import textwrap  # noqa: E402

src = textwrap.dedent(inspect.getsource(vqd.AbsorbingDiffusion.sample))
src = src.replace("'cuda'", "'cpu'")
src = "def _sample_cpu" + src[len("def sample"):]
ns = dict(vqd.__dict__)
exec(compile(src, "<patched-reference-sample>", "exec"), ns)
vqd.AbsorbingDiffusion.sample = ns["_sample_cpu"]

# The CPU->GPU scaling assumption, applied to the measured CPU number to
# estimate what the reference achieves on its own (unspecified, V100-class)
# single GPU. The workload is 49 sequential reverse steps, each a T=16
# python-loop SNN forward (~100 small conv/BN/LIF kernels at 7x7 spatial)
# plus a host sync through torch.distributions.Categorical — i.e. largely
# kernel-launch/sync bound, not FLOP bound, so the GPU speedup over one
# CPU core is far below the raw FLOP ratio (~100x). We grant a generous
# 50x so vs_baseline errs against us.
GPU_SCALE = 50.0


def main():
    batch = 16  # reference n_samples (vq_diffusion.py:51)

    denoiser = vqd.DummyModel(1, 128)
    functional.set_step_mode(denoiser, "m")
    denoiser.eval()
    abdiff = vqd.AbsorbingDiffusion(denoiser, 128)

    # warmup (jit inference kernels trace on first use)
    abdiff.sample(temp=1.0, sample_steps=2)
    functional.reset_net(denoiser)

    def timed_sample(k):
        t0 = time.perf_counter()
        out = abdiff.sample(temp=1.0, sample_steps=k)
        dt = time.perf_counter() - t0
        functional.reset_net(denoiser)
        return out, dt

    sample3, t3 = timed_sample(3)
    sample13, t13 = timed_sample(13)
    per_step = (t13 - t3) / 10.0

    # --- decode path (main.py:388-399) on the sampled code grid ----------
    model = SNN_VQVAE(1, 16, 128, 1.0)
    functional.set_step_mode(model, "m")
    model.eval()
    sample = sample13.reshape(batch, 7, 7)

    def decode_once():
        with torch.inference_mode():
            z = model.vq_layer.quantize(sample)
            z = z.permute(0, 3, 1, 2).contiguous()
            quantized = torch.unsqueeze(z, dim=0).repeat(16, 1, 1, 1, 1)
            quantized = model.vq_layer.poisson(quantized)
            pred = model.decoder(quantized)
            pred = torch.tanh(model.memout(pred))
        functional.reset_net(model)
        return pred

    decode_once()  # warmup
    t0 = time.perf_counter()
    pred = decode_once()
    t_decode = time.perf_counter() - t0
    assert pred.shape[-2:] == (28, 28)

    full_gen = 49 * per_step + t_decode
    cpu_img_s = batch / full_gen

    result = {
        "what": "measured PyTorch reference generation pipeline "
                "(49-step absorbing-diffusion sample + VQ-SVAE decode)",
        "source": "actual reference code imported from "
                  "/root/reference/Spiking-Diffusion-release with "
                  "spikingjelly from /tmp/sj_pkg; sample()'s hardcoded "
                  "device='cuda' string-patched to 'cpu' at runtime",
        "host": "1 CPU core, torch.set_num_threads(1), torch "
                + torch.__version__,
        "batch": batch,
        "reverse_step_seconds": round(per_step, 4),
        "decode_seconds_batch16": round(t_decode, 4),
        "full_generation_seconds_batch16": round(full_gen, 3),
        "cpu_images_per_sec": round(cpu_img_s, 4),
        "gpu_scale_assumption": GPU_SCALE,
        "gpu_scale_rationale": "49 sequential reverse steps of a T=16 "
            "python-loop SNN forward (~100 small kernels at 7x7) + a host "
            "sync per step via torch.distributions.Categorical: launch/"
            "sync-bound, so GPU-vs-1-core speedup is well below the FLOP "
            "ratio; 50x is granted generously (errs against the TPU build)",
        "reference_gpu_images_per_sec_est": round(cpu_img_s * GPU_SCALE, 3),
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
