"""Example: spiking image classification with the SNN runtime.

The analogue of spikingjelly's MNIST classification examples
(``activation_based/examples/lif_fc_mnist.py`` /
``conv_fashion_mnist.py`` via --dataset_name FMNIST): direct-coded
input, a small spiking conv net (PLIF net from the model zoo), AdamW on
rate-decoded logits.

    python examples/classify_mnist.py [--epochs 3] [--data_path DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

from spiking_diffusion_tpu.data import load_dataset
from spiking_diffusion_tpu.models import zoo
from spiking_diffusion_tpu.snn.encoding import direct_encode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--data_path", default=None)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--dataset_name", default="MNIST",
                   help="MNIST | FMNIST | KMNIST | Letters | CIFAR10-BW "
                        "(FMNIST = the conv_fashion_mnist example)")
    args = p.parse_args()

    ds = load_dataset(args.dataset_name, args.data_path)
    print(f"dataset: {ds.name} (synthetic={ds.synthetic})")

    model = zoo.PLIFNet(channels=args.channels, num_classes=ds.num_classes)
    variables, train_acc = zoo.train_classifier(
        model,
        ds.train_images,
        ds.train_labels,
        num_steps=args.num_steps,
        epochs=args.epochs,
        log_fn=print,
    )

    @jax.jit
    def predict(v, x):
        logits = model.apply(v, direct_encode(x, args.num_steps), train=False)
        return logits.argmax(-1)

    preds = []
    bs = min(256, len(ds.test_images))
    n_eval = len(ds.test_images) - len(ds.test_images) % bs
    for i in range(0, n_eval, bs):
        preds.append(np.asarray(predict(
            variables, ds.test_images[i : i + bs]
        )))
    preds = np.concatenate(preds)
    acc = (preds == ds.test_labels[: len(preds)]).mean()
    print(f"test accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
