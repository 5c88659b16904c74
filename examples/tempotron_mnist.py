"""Example: timing-based (latency-coded) MNIST with a Tempotron layer.

The analogue of spikingjelly's ``timing_based/examples/tempotron_mnist.py``:
each pixel is encoded by ``m`` Gaussian tuning-curve neurons into spike
*times* (strong response = early spike), and a single layer of Tempotron
neurons (Gutig & Sompolinsky 2006) classifies by peak membrane voltage
over the simulation window. Training uses the reference's Tempotron MSE
rule: only wrongly-classified output neurons (fired when they should not
have, or failed to fire when they should) receive a squared
``v_max - v_threshold`` penalty (``timing_based/neuron.py:43-53``), with
SGD (``tempotron_mnist.py:105,121-126``).

CPU-friendly departures from the reference scale (28x28, m=16, T=100):
images are 2x2 mean-pooled to 14x14 and defaults are m=4, T=32 grid
points — the mechanism is identical. Synthetic fallback data is used when
no IDX files are present.

    python examples/tempotron_mnist.py [--epochs 2] [--data_path DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.data import load_dataset
from spiking_diffusion_tpu.snn.tempotron import (
    gaussian_tuning_encode,
    tempotron_classify,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--data_path", default=None)
    p.add_argument("--dataset_name", default="MNIST")
    p.add_argument("-m", type=int, default=4,
                   help="tuning neurons per pixel (reference default 16)")
    p.add_argument("-T", type=int, default=32,
                   help="simulation grid points (reference default 100)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--train_size", type=int, default=4096,
                   help="training subset (single-CPU budget)")
    p.add_argument("--test_size", type=int, default=1024)
    p.add_argument("--v_threshold", type=float, default=1.0)
    args = p.parse_args()

    ds = load_dataset(args.dataset_name, args.data_path)
    print(f"dataset: {ds.name} (synthetic={ds.synthetic})")
    n_classes = ds.num_classes

    def pool14(x):  # (N, 28, 28[, 1]) in [0,1] -> (N, 196)
        x = np.asarray(x, np.float32).reshape(len(x), 28, 28)
        x = x.reshape(len(x), 14, 2, 14, 2).mean(axis=(2, 4))
        return x.reshape(len(x), -1)

    tr_x = pool14(ds.train_images[: args.train_size])
    tr_y = np.asarray(ds.train_labels[: args.train_size], np.int32)
    te_x = pool14(ds.test_images[: args.test_size])
    te_y = np.asarray(ds.test_labels[: args.test_size], np.int32)

    t_max = float(args.T)
    t_grid = jnp.arange(args.T, dtype=jnp.float32)

    @jax.jit
    def encode(x):  # (B, 196) -> spike times (B, 196*m)
        t = gaussian_tuning_encode(x, args.m, t_max, 0.0, 1.0)
        return t.reshape(x.shape[0], -1)

    n_in = tr_x.shape[1] * args.m
    key = jax.random.PRNGKey(0)
    weights = jax.random.normal(key, (n_classes, n_in)) * 0.01

    import optax

    tx = optax.sgd(args.lr)
    opt_state = tx.init(weights)

    @jax.jit
    def train_step(weights, opt_state, x, y):
        t_spikes = encode(x)

        def loss_fn(w):
            v_peak, _ = tempotron_classify(
                w, t_spikes, t_grid, args.v_threshold
            )
            # reference Tempotron.mse_loss (timing_based/neuron.py:43-53):
            # penalize only neurons whose fired/not-fired state disagrees
            # with the one-hot label
            fired = (v_peak >= args.v_threshold).astype(jnp.float32)
            onehot = jax.nn.one_hot(y, n_classes)
            wrong = jax.lax.stop_gradient(
                (fired != onehot).astype(jnp.float32)
            )
            loss = jnp.sum(
                ((v_peak - args.v_threshold) * wrong) ** 2
            ) / y.shape[0]
            acc = (v_peak.argmax(-1) == y).mean()
            return loss, acc

        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(weights)
        upd, opt_state = tx.update(g, opt_state, weights)
        return optax.apply_updates(weights, upd), opt_state, loss, acc

    @jax.jit
    def predict(weights, x):
        _, pred = tempotron_classify(
            weights, encode(x), t_grid, args.v_threshold
        )
        return pred

    bs = args.batch_size
    n_train = len(tr_x) - len(tr_x) % bs
    rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        perm = rng.permutation(len(tr_x))[:n_train]
        accs, losses = [], []
        for i in range(0, n_train, bs):
            idx = perm[i : i + bs]
            weights, opt_state, loss, acc = train_step(
                weights, opt_state, jnp.asarray(tr_x[idx]),
                jnp.asarray(tr_y[idx]),
            )
            losses.append(float(loss))
            accs.append(float(acc))
        preds = []
        n_eval = len(te_x) - len(te_x) % bs
        for i in range(0, n_eval, bs):
            preds.append(np.asarray(predict(weights, te_x[i : i + bs])))
        test_acc = (np.concatenate(preds) == te_y[:n_eval]).mean()
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"train_acc {np.mean(accs):.4f} test_acc {test_acc:.4f}")


if __name__ == "__main__":
    main()
