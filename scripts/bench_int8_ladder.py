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
    for mode, block_n, dtype, inter in [
        ("xyrow", 16, jnp.bfloat16, 1),   # round-3 bf16 baseline
        ("xyrow", 8, jnp.int8, 1),
        ("xyrow", 16, jnp.int8, 1),
        ("xyrow", 24, jnp.int8, 1),
        ("xyrow", 32, jnp.int8, 1),
        ("xy", 16, jnp.int8, 1),
        ("xy", 32, jnp.int8, 1),
        # sub-tile interleave: negative in bf16 (MXU-bound), retest at
        # int8 where MXU time halved and VPU/MXU overlap matters more
        ("xyrow", 16, jnp.int8, 2),
        ("xy", 16, jnp.int8, 2),
        ("xyrow", 16, jnp.int8, 4),
        ("xy", 16, jnp.int8, 4),
    ]:
        old = fused_denoiser._CONV_MODE
        old_il = fused_denoiser._INTERLEAVE
        fused_denoiser._CONV_MODE = mode
        fused_denoiser._INTERLEAVE = inter
        name = f"{mode}/{block_n}/{np.dtype(dtype).name}" + (
            f"/il{inter}" if inter > 1 else "")
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
        if ref is None:
            ref = out
        agree = np.isclose(out, ref, atol=0.05, rtol=0.05).mean()
        print(f"{name:22s}: {dt*1e3:7.2f} ms/fwd "
              f"({BATCH/dt:9.0f} tok-maps/s)  agree(5%)={agree:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
