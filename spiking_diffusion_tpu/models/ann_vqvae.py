"""Non-spiking (ANN) VQ-VAE baseline — the reference's ``--model vq-vae``.

Parity target: ``CNN_Encoder``/``CNN_Decoder``/``CNN_VectorQuantizer``/
``VQVAE`` (``snn_model/vae_model.py:548-672``): plain Conv/ReLU VQ-VAE with
the same geometry as the spiking model (28x28 -> 7x7, codebook K, dim D)
and a single analog-domain VQ loss.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models.layers import torch_bias_init, torch_kernel_init


def _conv(features: int, k: int, s: int, p: int, in_ch: int) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(k, k),
        strides=(s, s),
        padding=((p, p), (p, p)),
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(in_ch * k * k),
    )


def _deconv(
    features: int, k: int, s: int, p: int, op: int
) -> nn.ConvTranspose:
    pad = ((k - 1 - p, k - 1 - p + op),) * 2
    return nn.ConvTranspose(
        features,
        kernel_size=(k, k),
        strides=(s, s),
        padding=pad,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(features * k * k),
    )


class ANNVQVAE(nn.Module):
    """Conv/ReLU VQ-VAE on (N, H, W, C) images in [-0.5, 0.5]."""

    cfg: VQVAEConfig

    def setup(self):
        c = self.cfg
        c1, c2 = c.enc_channels
        d1, d2 = c.dec_channels
        self.enc1 = _conv(c1, 3, 2, 1, c.in_channels)
        self.enc2 = _conv(c2, 3, 2, 1, c1)
        self.enc3 = _conv(c.embedding_dim, 1, 1, 0, c2)
        self.dec1 = _deconv(d1, 3, 2, 1, 1)
        self.dec2 = _deconv(d2, 3, 2, 1, 1)
        self.dec3 = _deconv(c.in_channels, 3, 1, 1, 0)
        self.embeddings = self.param(
            "embeddings",
            nn.initializers.normal(stddev=1.0),
            (c.num_embeddings, c.embedding_dim),
        )

    def encode(self, x: jax.Array) -> jax.Array:
        h = nn.relu(self.enc1(x))
        h = nn.relu(self.enc2(h))
        return self.enc3(h)

    def decode(self, z: jax.Array) -> jax.Array:
        h = nn.relu(self.dec1(z))
        h = nn.relu(self.dec2(h))
        return self.dec3(h)

    def get_code_indices(self, flat_x: jax.Array) -> jax.Array:
        e = self.embeddings
        d = (
            jnp.sum(flat_x**2, axis=1, keepdims=True)
            + jnp.sum(e**2, axis=1)
            - 2.0 * jnp.dot(flat_x, e.T, preferred_element_type=jnp.float32)
        )
        return jnp.argmin(d, axis=1)

    def quantize(self, indices: jax.Array) -> jax.Array:
        return jnp.take(self.embeddings, indices, axis=0)

    def __call__(
        self, image: jax.Array, train: bool = True, data_variance: float = 1.0
    ) -> Dict[str, jax.Array]:
        c = self.cfg
        z = self.encode(image)  # (N, h, w, D) — already channels-last
        flat = z.reshape(-1, c.embedding_dim)
        indices = self.get_code_indices(flat)
        quantized = self.quantize(indices).reshape(z.shape)

        if not train:
            recon = self.decode(quantized)
            return {"recon": recon, "indices": indices}

        sg = jax.lax.stop_gradient
        q_latent = jnp.mean((quantized - sg(z)) ** 2)
        e_latent = jnp.mean((z - sg(quantized)) ** 2)
        vq_loss = q_latent + c.commitment_cost * e_latent
        quantized = z + sg(quantized - z)
        recon = self.decode(quantized)
        real_recon_loss = jnp.mean((recon - image) ** 2)
        return {
            "vq_loss": vq_loss,
            "recon_loss": real_recon_loss / data_variance,
            "real_recon_loss": real_recon_loss,
            "recon": recon,
        }

    def encode_indices(self, image: jax.Array) -> jax.Array:
        z = self.encode(image)
        flat = z.reshape(-1, self.cfg.embedding_dim)
        idx = self.get_code_indices(flat)
        n = image.shape[0]
        return idx.reshape(n, self.cfg.latent_size, self.cfg.latent_size)

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        q = self.quantize(indices)
        return self.decode(q)
