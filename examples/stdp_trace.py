"""Example: trace-based STDP on a Linear+IF layer, online weight updates.

The analogue of spikingjelly's ``activation_based/examples/stdp_trace.py``
and ``mstdp.py``/``mstdpet.py``: a 4->3 linear synapse driven by random
Poisson-like input spikes, an IF neuron on top, and the local STDP rule
updating the weights ONLINE (weights change every step, which changes the
post-synaptic spikes, which changes the next update) — the whole
trajectory is one ``lax.scan`` jit instead of the reference's per-step
Python loop with optimizer hooks.

Prints the weight trajectory summary and (for the M-variants) shows that
reward flips the sign of the learned update.

    python examples/stdp_trace.py [--T 128]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn import learning
from spiking_diffusion_tpu.snn.neuron import NeuronParams, if_step


def run_online_stdp(key, T=128, batch=2, n_in=4, n_out=3, lr=0.01,
                    w_init=0.4, w_min=-1.0, w_max=1.0):
    """Online loop: forward one step -> STDP update -> clamp; scanned."""
    in_spikes = (
        jax.random.uniform(key, (T, batch, n_in)) > 0.7
    ).astype(jnp.float32)
    p = NeuronParams()
    w0 = jnp.full((n_in, n_out), w_init)

    def body(carry, s_pre):
        w, v, st = carry
        v, s_post = if_step(v, s_pre @ w, p)
        st, dw = learning.stdp_step(st, s_pre, s_post)
        w = jnp.clip(w + lr * dw, w_min, w_max)
        return (w, v, st), (w, s_post)

    init = (w0, jnp.zeros((batch, n_out)), learning.init_state(
        n_in, n_out, batch))
    (w_final, _, _), (w_traj, out_spikes) = jax.lax.scan(
        body, init, in_spikes)
    return w_final, w_traj, in_spikes, out_spikes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    w_final, w_traj, in_spikes, out_spikes = jax.jit(
        lambda k: run_online_stdp(k, T=args.T, lr=args.lr)
    )(key)
    print(f"input rate {float(in_spikes.mean()):.3f}, "
          f"output rate {float(out_spikes.mean()):.3f}")
    print("final weights:\n", np.round(np.asarray(w_final), 4))
    drift = np.abs(np.asarray(w_traj[-1]) - 0.4).mean()
    print(f"mean |w - w_init| after T={args.T}: {drift:.4f}")

    # reward-modulated variants on the same spike trains: a +1 reward
    # stream potentiates where a -1 stream depresses (sign flip)
    k2 = jax.random.split(key)[0]
    s_pre = (jax.random.uniform(k2, (args.T, 2, 4)) > 0.7).astype(
        jnp.float32)
    s_post = (jax.random.uniform(key, (args.T, 2, 3)) > 0.8).astype(
        jnp.float32)
    plus = learning.mstdp_scan(s_pre, s_post, jnp.ones((args.T,)))
    minus = learning.mstdp_scan(s_pre, s_post, -jnp.ones((args.T,)))
    np.testing.assert_allclose(np.asarray(plus), -np.asarray(minus),
                               rtol=1e-6)
    et = learning.mstdpet_scan(s_pre, s_post, jnp.ones((args.T,)))
    print(f"MSTDP total |dw| {float(jnp.abs(plus).sum()):.3f} "
          f"(reward sign flips it exactly); "
          f"MSTDP-ET |dw| {float(jnp.abs(et).sum()):.3f}")


if __name__ == "__main__":
    main()
