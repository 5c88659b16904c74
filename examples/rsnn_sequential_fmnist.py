"""Example: recurrent-SNN variants on sequential FashionMNIST.

The analogue of spikingjelly's
``activation_based/examples/rsnn_sequential_fmnist.py``: each 28x28 image
is presented row by row (T=28 steps of 28 features) to three architectures
that differ only in their temporal machinery —

* ``plain``:    Linear -> IF -> Linear -> IF (feedforward memory only)
* ``synapse``:  adds a learnable ``SynapseFilter`` low-pass between the
                layers (stateful synaptic current)
* ``feedback``: wraps the hidden IF in a ``LinearRecurrentContainer``
                (y[t-1] fed back through the linear map)

and trains each with CE on rate-decoded logits, printing a comparison —
the reference's point is that the stateful variants beat plain on
sequential tasks.

    python examples/rsnn_sequential_fmnist.py [--epochs 2]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n_train", type=int, default=1024)
    ap.add_argument("--n_test", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--data_path", default="./data")
    ap.add_argument("--nets", default="plain,synapse,feedback")
    args = ap.parse_args()

    import flax.linen as nn
    import optax

    from spiking_diffusion_tpu.data import load_dataset
    from spiking_diffusion_tpu.models.recurrent import (
        LinearRecurrentContainer,
        SynapseFilter,
        lif_cell,
    )
    from spiking_diffusion_tpu.snn.neuron import NeuronParams, if_scan

    ds = load_dataset("FMNIST", args.data_path, synthetic_ok=True)
    x_train = ds.train_images[: args.n_train].reshape(-1, 28, 28)
    y_train = ds.train_labels[: args.n_train].astype(np.int32)
    x_test = ds.test_images[: args.n_test].reshape(-1, 28, 28)
    y_test = ds.test_labels[: args.n_test].astype(np.int32)
    p_if = NeuronParams(tau=1e9, decay_input=False)  # IF via LIF cell

    class Net(nn.Module):
        """rows (T, N, 28) -> rate-decoded logits (N, 10)."""

        kind: str
        hidden: int

        @nn.compact
        def __call__(self, rows):
            h = nn.Dense(self.hidden)(rows)
            if self.kind == "feedback":
                s = LinearRecurrentContainer(out_features=self.hidden)(
                    h, lif_cell(p_if)
                )
            else:
                s, _v = if_scan(h)
            if self.kind == "synapse":
                s = SynapseFilter(tau=2.0, learnable=True)(s)
            logits = nn.Dense(10)(s)
            s2, _v2 = if_scan(logits)
            return jnp.mean(s2, axis=0)

    def train_one(kind):
        model = Net(kind=kind, hidden=args.hidden)
        key = jax.random.PRNGKey(0)
        params = model.init(key, jnp.zeros((28, 2, 28)))["params"]
        tx = optax.adam(args.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                logits = model.apply({"params": p}, x.transpose(1, 0, 2))
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits * 28.0, y  # rate in [0,1]; scale for CE
                ).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        @jax.jit
        def predict(params, x):
            return model.apply(
                {"params": params}, x.transpose(1, 0, 2)
            ).argmax(-1)

        bsz, n = args.batch_size, len(x_train)
        for epoch in range(args.epochs):
            order = np.random.RandomState(epoch).permutation(n)
            for i in range(0, n - n % bsz, bsz):
                idx = order[i: i + bsz]
                params, opt_state, loss = step(
                    params, opt_state,
                    jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
                )
        preds = np.asarray(predict(params, jnp.asarray(x_test)))
        return (preds == y_test).mean(), float(loss)

    results = {}
    for kind in args.nets.split(","):
        acc, loss = train_one(kind)
        results[kind] = acc
        print(f"{kind:9s}: test acc {acc:.3f} (final loss {loss:.4f})")
    print("(stateful variants should match or beat 'plain' on "
          "sequential input)")


if __name__ == "__main__":
    main()
