"""TPU A/B ladder for the int8 megakernel: conv mode x block_n.

One fused denoiser forward at reference scale, scalar-sync timed
(axon rules). Prints ms/fwd + agreement vs the bf16 xyrow/16 baseline.
Usage: python scripts/bench_int8_ladder.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import SpikingDenoiser
from spiking_diffusion_tpu.ops import fused_denoiser

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = 8


def timeit(fn, *args):
    out = np.asarray(fn(*args))
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(red(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = float(red(*args))
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(s)
    return dt, out


def main():
    cfg = DiffusionConfig()
    key = jax.random.PRNGKey(0)
    model = SpikingDenoiser(cfg, backend="auto", dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, 7, 7), jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    variables = jax.jit(lambda k, x, t: model.init(k, x, t, train=True))(
        key, x0, t0
    )
    kx, kt = jax.random.split(key)
    x = jax.random.randint(kx, (BATCH, 7, 7), 0, cfg.mask_id + 1, jnp.int32)
    t = jax.random.randint(kt, (BATCH,), 1, cfg.num_timesteps + 1, jnp.int32)

    ref = None
    for mode, block_n, dtype, inter, scales, ablate in [
        ("xyrow", 16, jnp.bfloat16, 1, "row", ""),   # round-3 bf16 baseline
        ("xyrow", 8, jnp.int8, 1, "row", ""),
        ("xyrow", 16, jnp.int8, 1, "row", ""),
        # per-cout dequant scales (the round-3 quantizer): isolates the
        # perf cost of the per-kernel-row dequant (2 extra VPU muls/conv)
        ("xyrow", 16, jnp.int8, 1, "cout", ""),
        ("xyrow", 24, jnp.int8, 1, "row", ""),
        ("xyrow", 32, jnp.int8, 1, "row", ""),
        ("xy", 16, jnp.int8, 1, "row", ""),
        ("xy", 32, jnp.int8, 1, "row", ""),
        # sub-tile interleave: negative in bf16 (MXU-bound), retest at
        # int8 where MXU time halved and VPU/MXU overlap matters more
        ("xyrow", 16, jnp.int8, 2, "row", ""),
        ("xy", 16, jnp.int8, 2, "row", ""),
        ("xyrow", 16, jnp.int8, 4, "row", ""),
        ("xy", 16, jnp.int8, 4, "row", ""),
        # ROOFLINE ABLATIONS (numerically wrong output, agree skipped):
        # quantify the VPU wall of the VPU-bound int8 kernel by deleting
        # op classes — full-minus-ablated = the cost of that op class
        ("xyrow", 16, jnp.int8, 1, "row", "nolif"),
        ("xyrow", 16, jnp.int8, 1, "row", "noshift"),
        ("xyrow", 16, jnp.int8, 1, "row", "matmul"),
        ("xyrow", 16, jnp.bfloat16, 1, "row", "matmul"),
    ]:
        old = fused_denoiser._CONV_MODE
        old_il = fused_denoiser._INTERLEAVE
        old_sc = fused_denoiser._INT8_SCALES
        old_ab = fused_denoiser._ABLATE
        fused_denoiser._CONV_MODE = mode
        fused_denoiser._INTERLEAVE = inter
        fused_denoiser._INT8_SCALES = scales
        fused_denoiser._ABLATE = ablate
        name = f"{mode}/{block_n}/{np.dtype(dtype).name}" + (
            f"/il{inter}" if inter > 1 else "") + (
            "/scout" if scales == "cout" else "") + (
            f"/AB:{ablate}" if ablate else "")
        try:
            fd = jax.jit(fused_denoiser.make_fused_denoise_fn(
                variables, cfg, dtype=dtype, block_n=block_n
            ))
            dt, out = timeit(fd, x, t)
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        finally:
            fused_denoiser._CONV_MODE = old
            fused_denoiser._INTERLEAVE = old_il
            fused_denoiser._INT8_SCALES = old_sc
            fused_denoiser._ABLATE = old_ab
        if ref is None:
            ref = out
        if ablate:
            print(f"{name:22s}: {dt*1e3:7.2f} ms/fwd "
                  f"({BATCH/dt:9.0f} tok-maps/s)  [ABLATED — wrong output]",
                  flush=True)
            continue
        agree = np.isclose(out, ref, atol=0.05, rtol=0.05).mean()
        print(f"{name:22s}: {dt*1e3:7.2f} ms/fwd "
              f"({BATCH/dt:9.0f} tok-maps/s)  agree(5%)={agree:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
