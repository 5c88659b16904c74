"""Example: export a spiking classifier to the Lynxi exchange format and
run inference from the exported artifacts alone.

The analogue of spikingjelly's
``activation_based/examples/lynxi_fmnist_inference.py`` (train a conv SNN
on FashionMNIST, convert with ``lynxi_exchange``, run on the chip): here
the SpikingVGG is trained briefly, exported with
:func:`models.deploy.export_lynxi` (Lynxi op vocabulary, T folded into
batch, torch weight layouts), and then executed by
``lynxi_reference_forward`` — which reads ONLY the manifest + npz, exactly
what a Lynxi backend would consume — and compared against the in-framework
model on held-out data.

    python examples/lynxi_infer.py [--epochs 2]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--n_train", type=int, default=512)
    p.add_argument("--n_test", type=int, default=128)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--data_path", default="./data")
    p.add_argument("--out", default="/tmp/lynxi_export/fmnist_vgg")
    args = p.parse_args()

    from spiking_diffusion_tpu.data import load_dataset
    from spiking_diffusion_tpu.models import deploy, zoo

    ds = load_dataset("FMNIST", args.data_path, synthetic_ok=True)
    x_train = ds.train_images[: args.n_train].reshape(-1, 28, 28, 1)
    y_train = ds.train_labels[: args.n_train].astype(np.int32)
    x_test = ds.test_images[: args.n_test].reshape(-1, 28, 28, 1)
    y_test = ds.test_labels[: args.n_test].astype(np.int32)

    cfg = (8, "M", 16, "M")
    model = zoo.SpikingVGG(cfg=cfg, num_classes=10, backend="scan")
    variables, train_acc = zoo.train_classifier(
        model, x_train, y_train, num_steps=args.T,
        epochs=args.epochs, batch_size=64,
    )
    print(f"train accuracy after {args.epochs} epochs: {train_acc:.3f}")

    layers = deploy.lynxi_layers_from_vgg(cfg, num_classes=10)
    json_path, npz_path = deploy.export_lynxi(
        layers, variables, args.out, T=args.T
    )
    print(f"exported {json_path} + {npz_path}")

    # in-framework inference
    x_seq = jnp.broadcast_to(
        jnp.asarray(x_test)[None], (args.T,) + x_test.shape
    )
    logits_fw = np.asarray(model.apply(variables, x_seq, train=False))

    # exchange-format inference: T folded into batch, rate decode host-side
    x_folded = np.asarray(x_seq).reshape((-1,) + x_test.shape[1:])
    logits_lx = deploy.lynxi_reference_forward(json_path, npz_path, x_folded)
    logits_lx = logits_lx.reshape(args.T, len(x_test), 10).mean(axis=0)

    agree = (logits_fw.argmax(-1) == logits_lx.argmax(-1)).mean()
    maxdiff = np.abs(logits_fw - logits_lx).max()
    acc = (logits_lx.argmax(-1) == y_test).mean()
    print(f"framework-vs-export argmax agreement: {agree:.4f} "
          f"(max |logit diff| {maxdiff:.2e})")
    print(f"exported-model test accuracy: {acc:.3f} (chance 0.10)")
    assert agree == 1.0, "export must reproduce the framework's decisions"


if __name__ == "__main__":
    main()
