"""Example: generate images from trained Spiking-Diffusion checkpoints.

    python examples/generate.py --checkpoint result/MNIST/snn-vq-vae \
        --n 64 --temperature 0.65 --out samples.png
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser, diffusion
from spiking_diffusion_tpu.train import create_train_state
from spiking_diffusion_tpu.train.checkpoint import restore_checkpoint
from spiking_diffusion_tpu.utils import save_image_grid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.65)
    p.add_argument("--codebook_size", type=int, default=128)
    p.add_argument("--num_steps", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="samples.png")
    args = p.parse_args()

    vq_cfg = VQVAEConfig(num_steps=args.num_steps,
                         num_embeddings=args.codebook_size)
    d_cfg = DiffusionConfig(num_embeddings=args.codebook_size,
                            mask_id=args.codebook_size,
                            num_steps=args.num_steps)

    key = jax.random.PRNGKey(args.seed)
    model = SNNVQVAE(vq_cfg, backend="auto")
    img0 = jnp.zeros((2, 28, 28, 1))
    state = create_train_state(model, model.init(key, img0, train=True))
    state = restore_checkpoint(state, args.checkpoint, "model")

    denoiser = SpikingDenoiser(d_cfg, backend="auto")
    x0 = jnp.zeros((2, 7, 7), jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    dstate = create_train_state(denoiser, denoiser.init(key, x0, t0, train=True))
    dstate = restore_checkpoint(
        dstate, f"{args.checkpoint}/diff_result", "diff_model"
    )

    @jax.jit
    def generate(rng):
        def denoise(x_t, t):
            return dstate.apply_fn(
                {"params": dstate.params, "batch_stats": dstate.batch_stats},
                x_t, t, train=False,
            )

        codes = diffusion.sample(
            rng, denoise, d_cfg, n_samples=args.n,
            temperature=args.temperature,
        )
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            codes, method="decode_indices",
        )

    images = np.asarray(generate(key))
    rows = int(np.ceil(args.n / 8))
    save_image_grid(images, args.out, rows=rows, cols=8)
    print(f"wrote {args.n} samples to {args.out}")


if __name__ == "__main__":
    main()
