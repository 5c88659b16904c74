"""Example: event-stream (DVS-style) classification.

The analogue of spikingjelly's DVS128-Gesture / N-MNIST examples. Two
data paths:

* default: self-contained synthetic event streams (a moving bright dot
  per class; the temporal structure is the signal) integrated with the
  native C++ integrator — fast, no files.
* ``--dataset nmnist --root <dir>``: the real on-disk pipeline
  (``data/neuromorphic.py``) — an ``events_np/{train,test}/<class>/*.npz``
  tree (built from downloaded archives via ``NMNIST.create_events_np_files``,
  or synthesized here since this environment cannot download), integrated
  to frames with the reference's fixed-frames-number semantics and cached
  under ``root/frames_number_{T}_split_by_number/``.

    python examples/dvs_classify.py [--epochs 5]
    python examples/dvs_classify.py --dataset nmnist --root /tmp/nmnist
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


def load_folder_dataset(name, root, t_frames):
    """The real file-layout path: events_np tree -> cached frames."""
    from spiking_diffusion_tpu.data import neuromorphic as nm

    cls = {"nmnist": nm.NMNIST, "dvs128": nm.DVS128Gesture}[name]
    if not os.path.isdir(os.path.join(root, "events_np")):
        print(f"no events_np under {root}; synthesizing a tree "
              "(real runs: put the extracted archives there and call "
              f"{cls.__name__}.create_events_np_files)")
        cls.synthesize(root, per_class=24 if name == "nmnist" else 8)
    kw = dict(data_type="frame", frames_number=t_frames,
              split_by="number")
    train = cls(root, train=True, **kw)
    test = cls(root, train=False, **kw)
    x_tr, y_tr = train.as_arrays()
    x_te, y_te = test.as_arrays()
    # count frames -> {0,1} spike-like input, as the spikingjelly
    # examples do via their frame transforms
    return (np.clip(x_tr, 0, 1), y_tr.astype(np.int32),
            np.clip(x_te, 0, 1), y_te.astype(np.int32),
            len(train.classes))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--n_per_class", type=int, default=128)
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "nmnist", "dvs128"])
    p.add_argument("--root", default="/tmp/neuromorphic_root",
                   help="dataset root holding events_np/ (nmnist/dvs128)")
    args = p.parse_args()

    global CLASSES
    if args.dataset == "synthetic":
        x_train, y_train = make_dataset(args.n_per_class, seed=0)
        x_test, y_test = make_dataset(32, seed=1)
    else:
        x_train, y_train, x_test, y_test, CLASSES = load_folder_dataset(
            args.dataset, os.path.join(args.root, args.dataset), T_FRAMES
        )
    print(f"train {x_train.shape} (T,H,W,2 frames per sample), "
          f"{CLASSES} classes")

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
