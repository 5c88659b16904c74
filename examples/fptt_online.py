"""Example: FPTT online learning on a temporal task.

Learn to reproduce a target spike pattern from a Linear+LIF cell trained
with Forward Propagation Through Time — parameters update at every
timestep inside one jit (no BPTT over the window).

    python examples/fptt_online.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn.fptt import fptt_online_training
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_step


def cell_apply(params, v, x_t):
    h = x_t @ params["w1"] + params["b1"]
    v, s = lif_step(v, h, NeuronParams())
    return v, s @ params["w2"]


def main():
    rng = np.random.RandomState(0)
    T, N, D_in, D_h, D_out = 32, 16, 8, 32, 4
    params = {
        "w1": jnp.asarray(rng.randn(D_in, D_h).astype(np.float32) * 0.4),
        "b1": jnp.zeros(D_h),
        "w2": jnp.asarray(rng.randn(D_h, D_out).astype(np.float32) * 0.4),
    }
    x_seq = jnp.asarray(rng.rand(T, N, D_in).astype(np.float32) * 2)
    target = jnp.asarray(rng.rand(T, N, D_out).astype(np.float32))
    state0 = jnp.zeros((N, D_h))

    f_loss = lambda y, t: jnp.mean((y - t) ** 2)
    run = jax.jit(lambda p: fptt_online_training(
        cell_apply, p, state0, x_seq, target, f_loss, lr=0.05, alpha=0.5
    ))

    p = params
    for epoch in range(20):
        p, losses = run(p)
        if epoch % 5 == 0 or epoch == 19:
            print(f"epoch {epoch}: mean step loss {float(losses.mean()):.4f}")


if __name__ == "__main__":
    main()
