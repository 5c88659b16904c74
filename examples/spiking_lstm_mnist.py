"""Example: spiking-LSTM sequential-MNIST classification.

The analogue of spikingjelly's
``activation_based/examples/spiking_lstm_sequential_mnist.py``: each
28x28 image is fed ROW BY ROW (28 time steps of 28 features) into a
:class:`spiking_diffusion_tpu.snn.rnn.SpikingRNN` (LSTM cell, spiking
gates), and the last step's hidden spikes are linearly read out to 10
logits. The reference trains MSE against one-hot targets
(``spiking_lstm_sequential_mnist.py:73``) — kept here for parity.

Uses the repo's MNIST loader (synthetic fallback when no IDX files are
present). Defaults are sized for a 1-core CPU smoke run; scale --n_train
/ --hidden / --epochs up on real hardware.

    python examples/spiking_lstm_mnist.py [--epochs 3]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n_train", type=int, default=1024)
    p.add_argument("--n_test", type=int, default=256)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--data_path", default="./data")
    args = p.parse_args()

    import flax.linen as nn
    import optax

    from spiking_diffusion_tpu.data import load_dataset
    from spiking_diffusion_tpu.snn.rnn import SpikingRNN

    ds = load_dataset("MNIST", args.data_path, synthetic_ok=True)
    x_train = ds.train_images[: args.n_train].reshape(-1, 28, 28)
    y_train = ds.train_labels[: args.n_train].astype(np.int32)
    x_test = ds.test_images[: args.n_test].reshape(-1, 28, 28)
    y_test = ds.test_labels[: args.n_test].astype(np.int32)

    class Net(nn.Module):
        """SpikingLSTM(28 -> hidden) + Linear(hidden -> 10) on the last
        step's spikes (reference Net, spiking_lstm_sequential_mnist.py:12-20)."""

        hidden: int

        @nn.compact
        def __call__(self, rows):  # (T=28, N, 28)
            ys, _carry = SpikingRNN(hidden=self.hidden, cell_type="lstm")(
                rows
            )
            return nn.Dense(10)(ys[-1])

    model = Net(hidden=args.hidden)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((28, 2, 28), jnp.float32)
    params = model.init(key, x0)["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x.transpose(1, 0, 2))
            one_hot = jax.nn.one_hot(y, 10)
            # reference trains MSE on the output frequencies
            return jnp.mean((logits - one_hot) ** 2), logits

        (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return optax.apply_updates(params, updates), opt_state, loss, acc

    @jax.jit
    def predict(params, x):
        return model.apply({"params": params}, x.transpose(1, 0, 2)).argmax(-1)

    bsz = args.batch_size
    n = len(x_train)
    for epoch in range(args.epochs):
        order = np.random.RandomState(epoch).permutation(n)
        accs = []
        for i in range(0, n - n % bsz, bsz):
            idx = order[i: i + bsz]
            params, opt_state, loss, acc = train_step(
                params, opt_state,
                jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
            )
            accs.append(float(acc))
        print(f"epoch {epoch}: loss {float(loss):.4f} "
              f"train acc {np.mean(accs):.3f}")

    preds = np.asarray(predict(params, jnp.asarray(x_test)))
    print(f"test accuracy: {(preds == y_test).mean():.3f} (chance 0.10)")


if __name__ == "__main__":
    main()
