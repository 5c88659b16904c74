"""Example: event-stream (DVS-style) classification.

The analogue of spikingjelly's DVS128-Gesture / N-MNIST examples, but
self-contained: synthetic event streams (no dataset downloads exist in
this environment) are integrated into frame tensors with the native C++
integrator and classified by a spiking conv net. Each class is a moving
bright dot with a class-specific direction; the temporal structure is the
signal, so rate-only models do poorly and the SNN's time axis matters.

    python examples/dvs_classify.py [--epochs 5]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.data.events import integrate_events_to_frames
from spiking_diffusion_tpu.models import zoo

H = W = 16
T_FRAMES = 8
CLASSES = 4  # four movement directions
DIRS = [(1, 0), (-1, 0), (0, 1), (0, -1)]


def make_event_sample(rng, cls):
    """A dot moving in direction DIRS[cls], ~200 noisy events."""
    n = 200
    dy, dx = DIRS[cls]
    t = np.sort(rng.randint(0, 10_000, n)).astype(np.int64)
    frac = t / 10_000.0
    y0, x0 = rng.randint(4, 12, 2)
    y = np.clip(y0 + (frac * 10 * dy) + rng.randn(n), 0, H - 1)
    x = np.clip(x0 + (frac * 10 * dx) + rng.randn(n), 0, W - 1)
    p = rng.randint(0, 2, n)
    return {
        "t": t,
        "x": x.astype(np.int64),
        "y": y.astype(np.int64),
        "p": p.astype(np.int64),
    }


def make_dataset(n_per_class, seed):
    rng = np.random.RandomState(seed)
    frames, labels = [], []
    for cls in range(CLASSES):
        for _ in range(n_per_class):
            ev = make_event_sample(rng, cls)
            f = integrate_events_to_frames(ev, H, W, T_FRAMES, "time")
            frames.append(np.clip(f, 0, 1))
            labels.append(cls)
    order = rng.permutation(len(frames))
    return (np.stack(frames)[order].astype(np.float32),
            np.asarray(labels, np.int32)[order])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--n_per_class", type=int, default=128)
    args = p.parse_args()

    x_train, y_train = make_dataset(args.n_per_class, seed=0)
    x_test, y_test = make_dataset(32, seed=1)
    print(f"train {x_train.shape} (T,H,W,2 frames per sample)")

    # frames are (N, T, H, W, 2); the model wants (T, N, H, W, C)
    model = zoo.SpikingVGG(cfg=(16, "M", 32, "M"), num_classes=CLASSES,
                           backend="scan")
    import optax

    key = jax.random.PRNGKey(0)
    xt = jnp.asarray(x_train[:2].transpose(1, 0, 2, 3, 4))
    variables = model.init(key, xt, train=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state, x, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bs},
                x.transpose(1, 0, 2, 3, 4), train=True,
                mutable=["batch_stats"],
            )
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean(), mut["batch_stats"]

        (loss, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), bs2, opt_state, loss

    bsz = 64
    n = len(x_train)
    for epoch in range(args.epochs):
        order = np.random.RandomState(epoch).permutation(n)
        for i in range(0, n - n % bsz, bsz):
            idx = order[i : i + bsz]
            params, bs, opt_state, loss = step(
                params, bs, opt_state,
                jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
            )
        print(f"epoch {epoch}: loss {float(loss):.4f}")

    @jax.jit
    def predict(params, bs, x):
        logits = model.apply(
            {"params": params, "batch_stats": bs},
            x.transpose(1, 0, 2, 3, 4), train=False,
        )
        return logits.argmax(-1)

    preds = np.asarray(predict(params, bs, jnp.asarray(x_test)))
    acc = (preds == y_test).mean()
    print(f"test accuracy: {acc:.3f} (chance {1 / CLASSES:.2f})")


if __name__ == "__main__":
    main()
