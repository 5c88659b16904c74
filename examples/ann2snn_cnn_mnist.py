"""Example: ANN -> SNN conversion on MNIST.

The analogue of spikingjelly's converter demo
(``activation_based/ann2snn/examples/cnn_mnist.py``): train a small
Conv/ReLU/Pool CNN as a plain ANN, convert every ReLU into a
scale -> IF -> scale block calibrated on training data
(``models/ann2snn.convert``), then sweep the simulation length T and
report how the rate-coded SNN accuracy approaches the ANN accuracy.

    python examples/ann2snn_cnn_mnist.py [--epochs 2] [--mode max|percentile]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spiking_diffusion_tpu.data import load_dataset
from spiking_diffusion_tpu.models import ann2snn

SPECS = [
    ("conv", {"stride": 1, "padding": 1}),
    ("relu",),
    ("pool", 2),
    ("conv", {"stride": 1, "padding": 1}),
    ("relu",),
    ("pool", 2),
    ("flatten",),
    ("dense", {}),
]


def init_params(key, channels=(16, 32), num_classes=10):
    k1, k2, k3 = jax.random.split(key, 3)
    c1, c2 = channels
    he = jax.nn.initializers.he_normal()
    return [
        {"kernel": he(k1, (3, 3, 1, c1)), "bias": jnp.zeros((c1,))},
        None,
        None,
        {"kernel": he(k2, (3, 3, c1, c2)), "bias": jnp.zeros((c2,))},
        None,
        None,
        None,
        {"kernel": he(k3, (7 * 7 * c2, num_classes)),
         "bias": jnp.zeros((num_classes,))},
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--data_path", default=None)
    p.add_argument("--mode", default="max", choices=["max", "percentile"],
                   help="VoltageHook scale mode (Converter(mode='max'|99.9))")
    p.add_argument("--steps", default="8,16,32,64",
                   help="comma-separated simulation lengths T to sweep")
    p.add_argument("--calib_size", type=int, default=256)
    p.add_argument("--eval_size", type=int, default=2048)
    args = p.parse_args()

    ds = load_dataset("MNIST", args.data_path)
    print(f"dataset: {ds.name} (synthetic={ds.synthetic})")
    x_train = jnp.asarray(ds.train_images, jnp.float32)
    y_train = jnp.asarray(ds.train_labels, jnp.int32)
    x_test = np.asarray(ds.test_images, np.float32)[: args.eval_size]
    y_test = np.asarray(ds.test_labels)[: args.eval_size]

    params = init_params(jax.random.PRNGKey(0), num_classes=ds.num_classes)
    tx = optax.adam(1e-3)
    # optax needs a pytree without None layer slots
    trainable = [i for i, q in enumerate(params) if q is not None]
    opt_state = tx.init([params[i] for i in trainable])

    def loss_fn(train_params, x, y):
        full = list(params)
        for i, q in zip(trainable, train_params):
            full[i] = q
        logits = ann2snn.ann_forward(SPECS, full, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()

    @jax.jit
    def train_step(train_params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(train_params, x, y)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(train_params, updates), opt_state, loss

    train_params = [params[i] for i in trainable]
    n = x_train.shape[0] - x_train.shape[0] % args.batch_size
    rng = np.random.RandomState(0)
    for epoch in range(args.epochs):
        perm = rng.permutation(x_train.shape[0])[:n]
        losses = []
        for s in range(0, n, args.batch_size):
            idx = perm[s : s + args.batch_size]
            train_params, opt_state, loss = train_step(
                train_params, opt_state, x_train[idx], y_train[idx]
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: ANN train loss {np.mean(losses):.4f}")
    for i, q in zip(trainable, train_params):
        params[i] = q

    @jax.jit
    def ann_predict(x):
        return ann2snn.ann_forward(SPECS, params, x).argmax(-1)

    def batched_acc(predict):
        correct = 0
        bs = 256
        for s in range(0, len(x_test), bs):
            pred = np.asarray(predict(jnp.asarray(x_test[s : s + bs])))
            correct += (pred == y_test[s : s + bs]).sum()
        return correct / len(x_test)

    ann_acc = batched_acc(ann_predict)
    print(f"ANN test accuracy: {ann_acc:.4f}")

    mode = "max" if args.mode == "max" else "percentile"
    calib = x_train[: args.calib_size]
    for t in [int(s) for s in args.steps.split(",")]:
        snn_fn, scales = ann2snn.convert(
            SPECS, params, calib, mode=mode, num_steps=t
        )
        snn_predict = jax.jit(lambda x, f=snn_fn: f(x).argmax(-1))
        acc = batched_acc(snn_predict)
        print(f"SNN T={t:3d}: test accuracy {acc:.4f} "
              f"(gap {ann_acc - acc:+.4f})")
    print("scales:", [round(s, 3) for s in scales if s is not None])


if __name__ == "__main__":
    main()
