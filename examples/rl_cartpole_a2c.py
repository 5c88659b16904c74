"""Example: spiking A2C (synchronous advantage actor-critic) on CartPole.

The analogue of spikingjelly's
``activation_based/examples/Spiking_A2C.py``: actor and critic are each
``Linear -> IF -> Linear -> non-spiking LIF`` run for T steps on a
constant (direct-coded) state; the READOUT is the non-spiking LIF's final
membrane potential (charge-only LIF, tau=2, no fire/reset —
``Spiking_A2C.py:33-85``), so gradients flow through the surrogate spikes
of the hidden layer only. Training is textbook synchronous A2C: N
parallel envs, n-step rollouts, bootstrapped discounted returns,
advantage-weighted log-prob loss + value MSE - entropy bonus
(``Spiking_A2C.py:126-207``).

Self-contained: numpy CartPole dynamics (no gym in this environment),
4 vectorized envs, one jitted update per rollout.

    python examples/rl_cartpole_a2c.py [--updates 300]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from examples.rl_cartpole_dqn import CartPole
from spiking_diffusion_tpu.snn.neuron import NeuronParams, if_step

T_STEPS = 16  # reference T (Spiking_A2C.py:143)
HIDDEN = 128
STATE_GAIN = 8.0  # CartPole states are O(0.1); drive the IF layer


def _spiking_head(params, state, n_out):
    """Linear -> IF (T steps) -> Linear -> non-spiking LIF readout.

    Returns the readout LIF's membrane after T charge steps:
    v <- v + (x - v)/tau with tau=2, never firing (the reference's
    NonSpikingLIFNode keeps neuronal_charge only, Spiking_A2C.py:37-54).
    """
    p = NeuronParams()  # tau=2, v_th=1, hard reset — spikingjelly defaults
    drive = (STATE_GAIN * state) @ params["w1"] + params["b1"]

    def body(carry, _):
        v_hid, v_out = carry
        v_hid, s = if_step(v_hid, drive, p)
        x_out = s @ params["w2"] + params["b2"]
        v_out = v_out + (x_out - v_out) / 2.0  # charge-only LIF, tau=2
        return (v_hid, v_out), None

    init = (jnp.zeros(drive.shape), jnp.zeros(state.shape[:1] + (n_out,)))
    (_, v_out), _ = jax.lax.scan(body, init, None, length=T_STEPS)
    return v_out


def ac_apply(params, state):
    """(B, 4) -> (logits (B, 2), value (B,)). Separate actor/critic nets
    as in the reference ActorCritic (Spiking_A2C.py:57-85)."""
    logits = _spiking_head(params["actor"], state, 2)
    value = _spiking_head(params["critic"], state, 1)[:, 0]
    return logits, value


def init_params(key, hidden=HIDDEN):
    def head(key, n_out):
        k1, k2 = jax.random.split(key)
        return {
            "w1": jax.random.normal(k1, (4, hidden)) / np.sqrt(4),
            "b1": jnp.zeros((hidden,)),
            "w2": jax.random.normal(k2, (hidden, n_out)) / np.sqrt(hidden),
            "b2": jnp.zeros((n_out,)),
        }

    ka, kc = jax.random.split(key)
    return {"actor": head(ka, 2), "critic": head(kc, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=300)
    p.add_argument("--n_envs", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=5)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--entropy_coef", type=float, default=0.001)
    p.add_argument("--value_coef", type=float, default=0.5)
    p.add_argument("--eval_every", type=int, default=50)
    args = p.parse_args()

    import optax

    envs = [CartPole(seed=i) for i in range(args.n_envs)]
    states = np.stack([e.reset() for e in envs])

    key = jax.random.PRNGKey(0)
    params = init_params(key)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def act(params, state, key):
        logits, value = ac_apply(params, state)
        action = jax.random.categorical(key, logits)
        logp = jax.nn.log_softmax(logits)
        return action, logp, value

    @jax.jit
    def update(params, opt_state, states_b, actions_b, returns_b):
        """states_b (S, N, 4); returns are precomputed bootstrapped
        n-step discounted returns (compute_returns, Spiking_A2C.py:126)."""

        def loss_fn(p):
            logits, values = jax.vmap(
                lambda s: ac_apply(p, s)
            )(states_b)  # (S, N, 2), (S, N)
            logp = jax.nn.log_softmax(logits)
            act_logp = jnp.take_along_axis(
                logp, actions_b[..., None], axis=-1
            )[..., 0]
            adv = returns_b - values
            actor_loss = -(act_logp * jax.lax.stop_gradient(adv)).mean()
            critic_loss = (adv ** 2).mean()
            probs = jax.nn.softmax(logits)
            entropy = -(probs * logp).sum(-1).mean()
            return (actor_loss + args.value_coef * critic_loss
                    - args.entropy_coef * entropy), entropy

        (loss, ent), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss, ent

    def eval_episode(params, seed=123):
        env = CartPole(seed=seed)
        s = env.reset()
        total, done = 0.0, False
        while not done:
            logits, _ = ac_apply(params, jnp.asarray(s[None]))
            a = int(jnp.argmax(logits[0]))  # greedy eval
            s, r, done = env.step(a)
            total += r
        return total

    for upd_i in range(args.updates):
        roll_s, roll_a, roll_r, roll_m = [], [], [], []
        for _ in range(args.n_steps):
            key, k = jax.random.split(key)
            actions, _logp, _v = act(params, jnp.asarray(states), k)
            actions = np.asarray(actions)
            roll_s.append(states.copy())
            roll_a.append(actions)
            step_r, step_m = np.zeros(args.n_envs), np.ones(args.n_envs)
            next_states = states.copy()
            for i, env in enumerate(envs):
                s2, r, done = env.step(int(actions[i]))
                step_r[i] = r
                if done:
                    step_m[i] = 0.0
                    s2 = env.reset()
                next_states[i] = s2
            roll_r.append(step_r)
            roll_m.append(step_m)
            states = next_states

        # bootstrapped discounted returns (compute_returns)
        _, next_value = ac_apply(params, jnp.asarray(states))
        R = np.asarray(next_value)
        returns = np.zeros((args.n_steps, args.n_envs))
        for t in reversed(range(args.n_steps)):
            R = roll_r[t] + args.gamma * R * roll_m[t]
            returns[t] = R

        params, opt_state, loss, ent = update(
            params, opt_state,
            jnp.asarray(np.stack(roll_s), jnp.float32),
            jnp.asarray(np.stack(roll_a), jnp.int32),
            jnp.asarray(returns, jnp.float32),
        )
        if (upd_i + 1) % args.eval_every == 0:
            reward = eval_episode(params)
            print(f"update {upd_i + 1}: loss {float(loss):.3f} "
                  f"entropy {float(ent):.3f} eval reward {reward:.0f}")

    print(f"final eval reward: {eval_episode(params):.0f} "
          "(CartPole solves at 500)")


if __name__ == "__main__":
    main()
