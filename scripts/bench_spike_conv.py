"""Microbench: ops/spike_conv (Pallas training conv) vs XLA lax.conv at
stage-2 denoiser shapes — fwd and fwd+bwd, per-layer.

Timing: device-side lax.scan loop, ONE scalar sync (CLAUDE.md rules).
Usage: python scripts/bench_spike_conv.py [--iters 50] [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spiking_diffusion_tpu.ops.spike_conv import spike_conv3x3

HW = 7
T = 16


def timed(fn, args, iters):
    x, k, b = args

    @jax.jit
    def run(x, k, b):
        def body(c, _):
            # thread the carry into the input so XLA cannot hoist the
            # loop-invariant conv out of the scan (c*0 is not provably
            # zero for floats)
            xi = x + (c * 0.0).astype(x.dtype)
            out = fn(xi, k, b)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in
                    jax.tree_util.tree_leaves(out))
            return c + s, ()
        return jax.lax.scan(body, jnp.float32(0.0), None,
                            length=iters)[0]

    _ = float(run(x, k, b))
    t0 = time.perf_counter()
    out = float(run(x, k, b))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt * 1e3


def xla_conv(x, k, b):
    # native storage-dtype conv (what flax nn.Conv(dtype=bf16) runs;
    # MXU still accumulates fp32) — keeps fwd/bwd dtypes uniform
    t, n, h, w, cin = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(t * n, h, w, cin), k.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    return y.reshape(t, n, h, w, k.shape[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    n = args.batch

    shapes = [(64, 128), (128, 256), (256, 512), (512, 256), (320, 128)]
    key = jax.random.PRNGKey(0)
    for cin, cout in shapes:
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (T, n, HW, HW, cin), jnp.float32
                              ).astype(dtype)
        k = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.05
        b = jnp.zeros((cout,), jnp.float32)
        flops = 2.0 * T * n * HW * HW * 9 * cin * cout

        def f_pal(x, k, b):
            y, s1, s2 = spike_conv3x3(x, k, b)
            return (y, s1, s2)

        def f_xla(x, k, b):
            y = xla_conv(x, k, b)
            yf = y.astype(jnp.float32)
            return (y, jnp.sum(yf, (0, 1, 2, 3)),
                    jnp.sum(yf * yf, (0, 1, 2, 3)))

        def g_pal(x, k, b):
            return jax.grad(
                lambda x, k, b: sum(
                    jnp.sum(o.astype(jnp.float32))
                    for o in f_pal(x, k, b)),
                argnums=(0, 1, 2))(x, k, b)

        def g_xla(x, k, b):
            return jax.grad(
                lambda x, k, b: sum(
                    jnp.sum(o.astype(jnp.float32))
                    for o in f_xla(x, k, b)),
                argnums=(0, 1, 2))(x, k, b)

        row = {"cin": cin, "cout": cout, "GFLOP_fwd": round(flops / 1e9, 1)}
        for name, fn in (("pal_fwd", f_pal), ("xla_fwd", f_xla),
                         ("pal_bwd", g_pal), ("xla_bwd", g_xla)):
            ms = timed(fn, (x, k, b), args.iters)
            mult = 3.0 if "bwd" in name else 1.0
            row[name] = round(ms, 3)
            row[name + "_mxu"] = round(flops * mult / (ms / 1e3) / 197e12, 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()
