"""Example: export a trained Spiking-Diffusion model for neuromorphic
deployment — both portable formats.

    python examples/deploy_netx.py --checkpoint result/MNIST/snn-vq-vae \
        --out ./deploy

Writes:
  deploy/denoiser.net, deploy/encoder.net — Lava-DL netx HDF5 (loadable
      by ``lava.lib.dl.netx.hdf5.Network`` on a Lava host; CUBA neurons,
      BN folded, the decay_input LIF expressed via the 1/tau weight fold)
  deploy/svae.{json,npz} — the runtime-neutral netlist (topology +
      neuron constants + weights, no JAX needed to read)

Without --checkpoint it exports a freshly initialized model (schema demo).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import (
    SNNVQVAE,
    SpikingDenoiser,
    deploy,
    lava_export,
)
from spiking_diffusion_tpu.train import create_train_state
from spiking_diffusion_tpu.train.checkpoint import restore_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="result dir of a trained run (optional)")
    p.add_argument("--out", default="./deploy")
    p.add_argument("--codebook_size", type=int, default=128)
    p.add_argument("--num_steps", type=int, default=16)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    vq_cfg = VQVAEConfig(num_steps=args.num_steps,
                         num_embeddings=args.codebook_size)
    d_cfg = DiffusionConfig(num_steps=args.num_steps,
                            num_embeddings=args.codebook_size,
                            mask_id=args.codebook_size)
    key = jax.random.PRNGKey(0)

    model = SNNVQVAE(vq_cfg, backend="scan")
    m_vars = jax.jit(lambda k: model.init(
        k, jnp.zeros((2, 28, 28, 1)), train=True))(key)
    den = SpikingDenoiser(d_cfg, backend="scan")
    d_vars = jax.jit(lambda k: den.init(
        k, jnp.zeros((2, 7, 7), jnp.int32), jnp.ones((2,), jnp.int32),
        train=True))(key)

    if args.checkpoint:
        m_state = restore_checkpoint(
            create_train_state(model, m_vars), args.checkpoint, "model")
        m_vars = {"params": m_state.params,
                  "batch_stats": m_state.batch_stats}
        d_state = restore_checkpoint(
            create_train_state(den, d_vars),
            os.path.join(args.checkpoint, "diff_result"), "diff_model")
        d_vars = {"params": d_state.params,
                  "batch_stats": d_state.batch_stats}
        print(f"loaded checkpoints from {args.checkpoint}")

    dn = lava_export.denoiser_to_netx(
        d_vars, d_cfg, os.path.join(args.out, "denoiser.net"))
    en = lava_export.encoder_to_netx(
        m_vars, vq_cfg, os.path.join(args.out, "encoder.net"))
    jp, np_ = deploy.export_netlist(
        m_vars, os.path.join(args.out, "svae"),
        neuron_params=vq_cfg.lif.to_params(),
        meta={"model": "snn-vq-vae", "T": args.num_steps},
    )
    print("wrote:", dn)
    print("wrote:", en)
    print("wrote:", jp, "+", np_)


if __name__ == "__main__":
    main()
