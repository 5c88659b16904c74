"""Example: spiking PPO (clipped surrogate objective) on CartPole.

The analogue of spikingjelly's
``activation_based/examples/Spiking_PPO.py``: the actor and critic are
each ``Linear -> IF -> Linear -> non-spiking LIF`` run for T=16 steps on a
direct-coded state, read out from the final membrane potential
(``Spiking_PPO.py:54-105``) — the same spiking head as
``examples/rl_cartpole_a2c.py``. Training is textbook PPO
(arXiv:1707.06347), matching the reference pieces:

* GAE(lambda) advantage estimation (``compute_gae``, ``Spiking_PPO.py:126-134``)
* shuffled minibatch iteration over the rollout buffer
  (``ppo_iter``, ``Spiking_PPO.py:139-144``)
* clipped ratio objective + 0.5*value MSE - 0.001*entropy
  (``ppo_update``, ``Spiking_PPO.py:146-166``)

One deliberate departure: the reference wraps a *continuous* Normal
policy around discrete CartPole and argmaxes its samples
(``Spiking_PPO.py:105,212``) — an upstream quirk, not intent. This port
uses the categorical policy the task calls for (log-prob ratios and
entropy are then exact, not Gaussian stand-ins).

Self-contained: numpy CartPole dynamics (no gym in this environment),
vectorized envs, jitted minibatch updates.

    python examples/rl_cartpole_ppo.py [--rollouts 40]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from examples.rl_cartpole_a2c import ac_apply, init_params
from examples.rl_cartpole_dqn import CartPole


def compute_gae(rewards, masks, values, next_value, gamma=0.99, lam=0.95):
    """Bootstrapped GAE(lambda) returns, reference compute_gae
    (``Spiking_PPO.py:126-134``). All args numpy, shapes (S, N) except
    next_value (N,). Returns (returns, advantages), both (S, N)."""
    S = rewards.shape[0]
    values_ext = np.concatenate([values, next_value[None]], axis=0)
    gae = np.zeros_like(next_value)
    returns = np.zeros_like(rewards)
    for t in reversed(range(S)):
        delta = rewards[t] + gamma * values_ext[t + 1] * masks[t] - values_ext[t]
        gae = delta + gamma * lam * masks[t] * gae
        returns[t] = gae + values_ext[t]
    return returns, returns - values


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rollouts", type=int, default=40)
    p.add_argument("--n_envs", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=64)
    p.add_argument("--ppo_epochs", type=int, default=4)
    p.add_argument("--minibatch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--gae_lambda", type=float, default=0.95)
    p.add_argument("--clip", type=float, default=0.2)
    p.add_argument("--entropy_coef", type=float, default=0.001)
    p.add_argument("--value_coef", type=float, default=0.5)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--hidden", type=int, default=128)
    args = p.parse_args()

    import optax

    envs = [CartPole(seed=i) for i in range(args.n_envs)]
    states = np.stack([e.reset() for e in envs])

    key = jax.random.PRNGKey(0)
    params = init_params(key, hidden=args.hidden)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def act(params, state, key):
        logits, value = ac_apply(params, state)
        action = jax.random.categorical(key, logits)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits), action[:, None], axis=-1
        )[:, 0]
        return action, logp, value

    @jax.jit
    def minibatch_update(params, opt_state, s, a, old_logp, ret, adv):
        """One clipped-PPO gradient step on a minibatch
        (``ppo_update``, Spiking_PPO.py:146-166)."""

        def loss_fn(p):
            logits, values = ac_apply(p, s)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, a[:, None], axis=-1)[:, 0]
            ratio = jnp.exp(logp - old_logp)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1.0 - args.clip, 1.0 + args.clip) * adv
            actor_loss = -jnp.minimum(surr1, surr2).mean()
            critic_loss = ((ret - values) ** 2).mean()
            probs = jax.nn.softmax(logits)
            entropy = -(probs * logp_all).sum(-1).mean()
            return (actor_loss + args.value_coef * critic_loss
                    - args.entropy_coef * entropy), entropy

        (loss, ent), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss, ent

    @jax.jit
    def greedy(params, state):
        logits, _ = ac_apply(params, state)
        return logits.argmax(-1)

    def eval_episode(params, seed=123):
        env = CartPole(seed=seed)
        s = env.reset()
        total, done = 0.0, False
        while not done:
            s, r, done = env.step(int(greedy(params, jnp.asarray(s[None]))[0]))
            total += r
        return total

    rng = np.random.default_rng(0)
    for rollout_i in range(args.rollouts):
        roll = {k: [] for k in ("s", "a", "logp", "v", "r", "m")}
        for _ in range(args.n_steps):
            key, k = jax.random.split(key)
            actions, logp, value = act(params, jnp.asarray(states), k)
            actions = np.asarray(actions)
            roll["s"].append(states.copy())
            roll["a"].append(actions)
            roll["logp"].append(np.asarray(logp))
            roll["v"].append(np.asarray(value))
            step_r = np.zeros(args.n_envs)
            step_m = np.ones(args.n_envs)
            next_states = states.copy()
            for i, env in enumerate(envs):
                s2, r, done = env.step(int(actions[i]))
                step_r[i] = r
                if done:
                    step_m[i] = 0.0
                    s2 = env.reset()
                next_states[i] = s2
            roll["r"].append(step_r)
            roll["m"].append(step_m)
            states = next_states

        _, next_value = jax.jit(ac_apply)(params, jnp.asarray(states))
        returns, adv = compute_gae(
            np.stack(roll["r"]), np.stack(roll["m"]), np.stack(roll["v"]),
            np.asarray(next_value), args.gamma, args.gae_lambda,
        )
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        flat = lambda x: np.stack(x).reshape(-1, *np.asarray(x[0]).shape[1:])
        buf_s = jnp.asarray(flat(roll["s"]), jnp.float32)
        buf_a = jnp.asarray(flat(roll["a"]), jnp.int32)
        buf_lp = jnp.asarray(flat(roll["logp"]), jnp.float32)
        buf_ret = jnp.asarray(returns.reshape(-1), jnp.float32)
        buf_adv = jnp.asarray(adv.reshape(-1), jnp.float32)
        B = buf_s.shape[0]

        for _ in range(args.ppo_epochs):
            ids = rng.permutation(B)
            n_mb = max(1, B // args.minibatch)
            for mb in np.array_split(ids[: n_mb * args.minibatch], n_mb):
                mb = jnp.asarray(mb)
                params, opt_state, loss, ent = minibatch_update(
                    params, opt_state, buf_s[mb], buf_a[mb], buf_lp[mb],
                    buf_ret[mb], buf_adv[mb],
                )

        if (rollout_i + 1) % args.eval_every == 0:
            reward = eval_episode(params)
            print(f"rollout {rollout_i + 1}: loss {float(loss):.3f} "
                  f"entropy {float(ent):.3f} eval reward {reward:.0f}")

    print(f"final eval reward: {eval_episode(params):.0f} "
          "(CartPole solves at 500)")


if __name__ == "__main__":
    main()
