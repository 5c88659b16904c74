"""Example: spiking DQN on CartPole.

The analogue of spikingjelly's RL examples
(``activation_based/examples/{DQN,PPO,A2C}_state.py``), self-contained:
a numpy CartPole (classic Barto-Sutton dynamics, no gym dependency), a
spiking Q-network (Gaussian-tuning latency-free rate coding over T steps:
state -> Linear -> LIF -> Linear -> LIF -> rate-decoded Q-values), an
epsilon-greedy policy, a replay buffer, and a target network.

    python examples/rl_cartpole_dqn.py [--episodes 60]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn.encoding import direct_encode
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_step
from spiking_diffusion_tpu.utils.init import torch_bias_init, torch_kernel_init


class CartPole:
    """Classic CartPole-v1 dynamics (termination at |x|>2.4, |theta|>12deg,
    500-step cap)."""

    def __init__(self, seed=0):
        self.rng = np.random.RandomState(seed)
        self.state = None
        self.steps = 0

    def reset(self):
        self.state = self.rng.uniform(-0.05, 0.05, 4)
        self.steps = 0
        return self.state.copy()

    def step(self, action):
        x, x_dot, th, th_dot = self.state
        force = 10.0 if action == 1 else -10.0
        costh, sinth = np.cos(th), np.sin(th)
        temp = (force + 0.05 * th_dot**2 * sinth) / 1.1
        th_acc = (9.8 * sinth - costh * temp) / (
            0.5 * (4.0 / 3.0 - 0.1 * costh**2 / 1.1)
        )
        x_acc = temp - 0.05 * th_acc * costh / 1.1
        tau = 0.02
        self.state = np.array([
            x + tau * x_dot, x_dot + tau * x_acc,
            th + tau * th_dot, th_dot + tau * th_acc,
        ])
        self.steps += 1
        done = (abs(self.state[0]) > 2.4 or abs(self.state[2]) > 0.2094
                or self.steps >= 500)
        return self.state.copy(), 1.0, done


T_STEPS = 8
HIDDEN = 64
# CartPole states are O(0.05-0.2); without a drive gain the LIF layer
# never crosses threshold and the Q-net is silent
STATE_GAIN = 8.0


def q_apply(params, state_batch):
    """Spiking Q-net: (B, 4) -> (B, 2) rate-decoded Q-values."""
    x = (STATE_GAIN * state_batch) @ params["w1"] + params["b1"]  # (B, H)
    x_seq = direct_encode(x, T_STEPS)
    p = NeuronParams()

    def body(v, xt):
        v2, s = lif_step(v, xt, p)
        return v2, s

    v0 = jnp.zeros(x.shape, jnp.float32)
    _, s_seq = jax.lax.scan(body, v0, x_seq)
    rate = jnp.mean(s_seq, axis=0)  # (B, H)
    return rate @ params["w2"] + params["b2"]


def init_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w1": torch_kernel_init(k1, (4, HIDDEN)),
        "b1": torch_bias_init(4)(k2, (HIDDEN,)),
        "w2": torch_kernel_init(k3, (HIDDEN, 2)),
        "b2": torch_bias_init(HIDDEN)(k4, (2,)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=60)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import optax

    key = jax.random.PRNGKey(0)
    params = init_params(key)
    target = jax.tree.map(lambda x: x, params)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def q_values(params, s):
        return q_apply(params, s)

    @jax.jit
    def train_step(params, target, opt_state, s, a, r, s2, done):
        def loss_fn(p):
            q = q_apply(p, s)
            q_sa = jnp.take_along_axis(q, a[:, None], axis=1)[:, 0]
            q_next = jnp.max(q_apply(target, s2), axis=1)
            y = r + args.gamma * q_next * (1.0 - done)
            return jnp.mean((q_sa - jax.lax.stop_gradient(y)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, loss

    env = CartPole(seed=0)
    buf = deque(maxlen=10_000)
    rng = np.random.RandomState(1)
    eps, eps_min, eps_decay = 1.0, 0.05, 0.97
    returns = []

    for ep in range(args.episodes):
        s = env.reset()
        total = 0.0
        done = False
        while not done:
            if rng.rand() < eps:
                a = rng.randint(2)
            else:
                a = int(np.asarray(
                    q_values(params, jnp.asarray(s[None], jnp.float32))
                ).argmax())
            s2, r, done = env.step(a)
            buf.append((s, a, r, s2, float(done)))
            s = s2
            total += r
            if len(buf) >= 128:
                idx = rng.choice(len(buf), 64, replace=False)
                batch = [buf[i] for i in idx]
                sb = jnp.asarray(np.stack([b[0] for b in batch]), jnp.float32)
                ab = jnp.asarray(np.asarray([b[1] for b in batch]), jnp.int32)
                rb = jnp.asarray(np.asarray([b[2] for b in batch]), jnp.float32)
                s2b = jnp.asarray(np.stack([b[3] for b in batch]), jnp.float32)
                db = jnp.asarray(np.asarray([b[4] for b in batch]), jnp.float32)
                params, opt_state, loss = train_step(
                    params, target, opt_state, sb, ab, rb, s2b, db
                )
        returns.append(total)
        eps = max(eps_min, eps * eps_decay)
        if (ep + 1) % 10 == 0:
            target = jax.tree.map(lambda x: x, params)
            print(f"episode {ep + 1}: return {total:.0f} "
                  f"(mean last 10: {np.mean(returns[-10:]):.1f}, eps {eps:.2f})")

    early = np.mean(returns[:10])
    late = np.mean(returns[-10:])
    print(f"mean return: first 10 eps {early:.1f} -> last 10 eps {late:.1f}")


if __name__ == "__main__":
    main()
