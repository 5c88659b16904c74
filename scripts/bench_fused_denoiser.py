"""TPU benchmark: whole-denoiser megakernel vs the layerwise eval path.

Times ONE denoiser forward at reference scale (T=16, channels
64-128-256-512-256, K=128 logits, 7x7 latent) at the generation batch,
host-copy synchronized (axon rule). Also reports a loose parity check.
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = 8


def timeit(fn, *args):
    """Time with a scalar device->host sync: the axon tunnel makes full
    host copies slow (~25 MB of logits would dominate), so the timed loop
    syncs on an in-jit reduction; the full output is fetched once for the
    parity check."""
    out = np.asarray(fn(*args))  # compile + warm (full copy, untimed)
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(red(*args))  # compile + warm the reduced variant
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

    ref_fn = jax.jit(lambda v, x, t: model.apply(v, x, t, train=False))
    dt_ref, ref = timeit(ref_fn, variables, x, t)
    print(f"layerwise eval: {dt_ref*1e3:8.2f} ms/fwd  "
          f"({BATCH/dt_ref:9.0f} tok-maps/s)")

    for block_n in (8, 16, 32):
        try:
            fd = fused_denoiser.make_fused_denoise_fn(
                variables, cfg, dtype=jnp.bfloat16, block_n=block_n
            )
            fd_jit = jax.jit(fd)
            dt, out = timeit(fd_jit, x, t)
        except Exception as e:  # noqa: BLE001
            print(f"block_n={block_n:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        agree = np.isclose(out, ref, atol=0.05, rtol=0.05).mean()
        med = float(np.median(np.abs(out - ref)))
        print(f"block_n={block_n:3d}: {dt*1e3:8.2f} ms/fwd  "
              f"({BATCH/dt:9.0f} tok-maps/s)  speedup {dt_ref/dt:5.2f}x  "
              f"agree(5%)={agree:.4f} med|d|={med:.4f}")


if __name__ == "__main__":
    main()
