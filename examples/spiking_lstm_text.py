"""Example: character-level text classification with a spiking LSTM.

The analogue of spikingjelly's
``activation_based/examples/spiking_lstm_text.py`` (the classic
name->language tutorial with ``rnn.SpikingLSTM``): names are one-hot
character sequences fed one char per time step; the last step's hidden
spikes are read out to a language logit.

The original downloads ``data/names/*.txt``; this environment has no
network, so names are synthesized with language-specific morphology
(distinct suffix/vowel statistics per class) — pass ``--names_dir`` at a
directory of ``<Language>.txt`` files to use the real data.

    python examples/spiking_lstm_text.py [--iters 2000]
"""

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

ALL_LETTERS = string.ascii_letters + " .,;'-"
N_LETTERS = len(ALL_LETTERS)
MAX_LEN = 12

SYNTH_LANGS = {
    "slavic": (("mir", "slav", "bor", "rad", "vlad"), ("ov", "ev", "ski")),
    "italic": (("gio", "mar", "lu", "pa", "ro"), ("elli", "ini", "etti")),
    "nordic": (("bj", "sig", "thor", "ing", "ragn"), ("sson", "sen", "vik")),
}


def synth_name(rng, lang):
    stems, sufs = SYNTH_LANGS[lang]
    name = rng.choice(stems) + rng.choice(("a", "e", "o", "u"))
    if rng.rand() < 0.5:
        name += rng.choice(("l", "n", "r", "k"))
    return (name + rng.choice(sufs))[:MAX_LEN]


def encode(name):
    """One-hot (MAX_LEN, N_LETTERS), zero-padded at the front (the torch
    tutorial pads nothing; fixed shapes keep the jit static)."""
    x = np.zeros((MAX_LEN, N_LETTERS), np.float32)
    for i, ch in enumerate(name[-MAX_LEN:]):
        x[MAX_LEN - len(name) + i, ALL_LETTERS.index(ch)] = 1.0
    return x


def load_names(names_dir):
    cats, samples = [], []
    for fname in sorted(os.listdir(names_dir)):
        if not fname.endswith(".txt"):
            continue
        lang = os.path.splitext(fname)[0]
        cats.append(lang)
        with open(os.path.join(names_dir, fname), encoding="utf-8") as f:
            for line in f:
                line = "".join(c for c in line.strip() if c in ALL_LETTERS)
                if line:
                    samples.append((line, len(cats) - 1))
    return cats, samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--names_dir", default=None,
                   help="directory of <Language>.txt name lists "
                        "(synthetic morphology otherwise)")
    args = p.parse_args()

    import flax.linen as nn
    import optax

    from spiking_diffusion_tpu.snn.rnn import SpikingRNN

    rng = np.random.RandomState(0)
    if args.names_dir:
        cats, samples = load_names(args.names_dir)
    else:
        cats = sorted(SYNTH_LANGS)
        samples = [(synth_name(rng, lang), i)
                   for i, lang in enumerate(cats) for _ in range(1500)]
    rng.shuffle(samples)
    n_test = max(64, len(samples) // 10)
    test, train = samples[:n_test], samples[n_test:]
    print(f"{len(cats)} languages, {len(train)} train / {len(test)} test")

    class Net(nn.Module):
        @nn.compact
        def __call__(self, chars):  # (T, N, N_LETTERS)
            ys, _ = SpikingRNN(hidden=args.hidden, cell_type="lstm")(chars)
            return nn.Dense(len(cats))(ys[-1])

    model = Net()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((MAX_LEN, 2, N_LETTERS))
    )["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x.transpose(1, 0, 2))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean(), logits

        (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        acc = jnp.mean((logits.argmax(-1) == y).astype(jnp.float32))
        return optax.apply_updates(params, upd), opt_state, loss, acc

    xs = np.stack([encode(n) for n, _ in train])
    ys = np.asarray([c for _, c in train], np.int32)
    for it in range(args.iters):
        idx = rng.randint(0, len(train), args.batch_size)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(xs[idx]), jnp.asarray(ys[idx])
        )
        if (it + 1) % max(args.iters // 5, 1) == 0:
            print(f"iter {it + 1}: loss {float(loss):.4f} "
                  f"batch acc {float(acc):.3f}")

    @jax.jit
    def predict(params, x):
        return model.apply({"params": params}, x.transpose(1, 0, 2)).argmax(-1)

    xt = np.stack([encode(n) for n, _ in test])
    yt = np.asarray([c for _, c in test])
    preds = np.asarray(predict(params, jnp.asarray(xt)))
    print(f"test accuracy: {(preds == yt).mean():.3f} "
          f"(chance {1 / len(cats):.2f})")


if __name__ == "__main__":
    main()
