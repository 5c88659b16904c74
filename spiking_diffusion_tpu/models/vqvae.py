"""Spiking VQ-VAE (VQ-SVAE): LIF conv encoder, spiking vector quantizer,
LIF deconv decoder with leaky membrane readout.

Parity target: ``Spiking-Diffusion-release/snn_model/vae_model.py:22-196``.
Layout here is (T, N, H, W, C) channels-last (TPU-native); the flat code
index ordering is (N, H, W) row-major, identical to the reference's
``permute(0,2,3,1).reshape(-1, D)`` (``vae_model.py:44-46``), so stage-2
consumes indices with the same semantics (``vq_diffusion.py:34``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models.layers import (
    LIF,
    SeqBatchNorm,
    SeqConv,
    SeqConvTranspose,
)
from spiking_diffusion_tpu.ops.bn_lif import bn_lif
from spiking_diffusion_tpu.profiling import syops as _syops
from spiking_diffusion_tpu.snn.encoding import direct_encode
from spiking_diffusion_tpu.snn.neuron import NeuronParams
from spiking_diffusion_tpu.snn.temporal import membrane_output, psp


def _neuron_params(cfg: VQVAEConfig) -> NeuronParams:
    return cfg.lif.to_params()


class Encoder(nn.Module):
    """3x {Conv, BN, LIF} spiking encoder: 28x28xC -> 7x7xD spike train.

    Parity: ``vae_model.py:101-129`` (convs 1->32->64->D, strides 2,2,1).
    """

    cfg: VQVAEConfig
    backend: str = "auto"
    dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 for inference

    @nn.compact
    def __call__(
        self,
        x_seq: jax.Array,
        train: bool = True,
        first_replicated: bool = False,
    ) -> jax.Array:
        """``first_replicated=True`` promises the T axis of ``x_seq`` is a
        pure repeat (direct coding, ``main.py:133``): the first Conv+BN is
        then computed ONCE on a length-1 time axis and broadcast before the
        LIF — mathematically identical (BN statistics over T*N of repeated
        values equal those over N) at 1/T of the first layer's work. The
        syops counters report the ops actually executed."""
        p = _neuron_params(self.cfg)
        c1, c2 = self.cfg.enc_channels
        if self.dtype is not None:
            x_seq = x_seq.astype(self.dtype)
        t_steps = x_seq.shape[0]
        fused = self.backend == "bnlif"
        for i, (feats, k, s, pad) in enumerate((
            (c1, 3, 2, 1),
            (c2, 3, 2, 1),
            (self.cfg.embedding_dim, 1, 1, 0),
        )):
            h = x_seq[:1] if (i == 0 and first_replicated) else x_seq
            h = SeqConv(feats, kernel_size=k, strides=s, padding=pad,
                        dtype=self.dtype)(h)
            if fused:
                # fused BN-apply + LIF Pallas kernel (ops/bn_lif.py): BN
                # stats stay in SeqBatchNorm; the normalize + T-step
                # recurrence run in one VMEM-resident kernel, with the
                # first block's length-1 time axis broadcast inside it.
                # MEASURED NEGATIVE for stage-1 training on v5e (30.6 ms
                # vs 23.7 'auto' at batch 256 bf16): these layers' C=16..
                # 64 fills only C/128 of the TPU lanes, so the kernel
                # pays a 128/C padding factor on VMEM tiles and VPU ops
                # that outweighs the saved HBM traffic (19.8 -> 12.4 GB).
                # Kept parity-locked (tests/test_vqvae_bnlif.py) as a
                # characterized variant; 'auto' stays the stage-1 default.
                sc, sh = SeqBatchNorm(
                    use_running_average=not train, dtype=self.dtype
                )(h, return_affine=True)
                x_seq = bn_lif(
                    h, sc, sh, p,
                    t_out=t_steps if (i == 0 and first_replicated) else None,
                )
                self.sow("syops", "counters",
                         _syops.neuron_entry(x_seq, x_seq))
            else:
                h = SeqBatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(h)
                if i == 0 and first_replicated:
                    h = jnp.broadcast_to(h, (t_steps,) + h.shape[1:])
                x_seq = LIF(params=p, backend=self.backend)(h, train=train)
        return x_seq


class Decoder(nn.Module):
    """3x deconv spiking decoder: 7x7xD spike train -> 28x28xC membrane drive.

    Parity: ``vae_model.py:131-159`` (deconvs D->64->32->C; the last deconv
    is bare — no BN/LIF — its analog output feeds the membrane readout).
    """

    cfg: VQVAEConfig
    backend: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_seq: jax.Array, train: bool = True) -> jax.Array:
        p = _neuron_params(self.cfg)
        d1, d2 = self.cfg.dec_channels
        if self.dtype is not None:
            x_seq = x_seq.astype(self.dtype)
        fused = self.backend == "bnlif"
        for feats in (d1, d2):
            x_seq = SeqConvTranspose(
                feats, kernel_size=3, strides=2, padding=1, output_padding=1,
                dtype=self.dtype,
            )(x_seq)
            if fused:
                sc, sh = SeqBatchNorm(
                    use_running_average=not train, dtype=self.dtype
                )(x_seq, return_affine=True)
                x_seq = bn_lif(x_seq, sc, sh, p)
                self.sow("syops", "counters",
                         _syops.neuron_entry(x_seq, x_seq))
            else:
                x_seq = SeqBatchNorm(use_running_average=not train,
                                     dtype=self.dtype)(x_seq)
                x_seq = LIF(params=p, backend=self.backend)(x_seq, train=train)
        x_seq = SeqConvTranspose(
            self.cfg.in_channels, kernel_size=3, strides=1, padding=1,
            dtype=self.dtype,
        )(x_seq)
        return x_seq.astype(jnp.float32)


class VectorQuantizer(nn.Module):
    """Spiking vector quantizer (SQ): hybrid time-collapse readout, L2
    nearest-codebook lookup, straight-through estimator, and an adaptive
    spike generator ("poisson": Conv1x1+BN+LIF) that re-expands quantized
    embeddings into a T-step spike train.

    Parity: ``vae_model.py:22-99``. The commitment losses are computed both
    in the analog domain (loss_1) and, after re-spiking, in the PSP
    spike-train domain (loss_2).
    """

    cfg: VQVAEConfig
    backend: str = "auto"

    def setup(self):
        c = self.cfg
        # torch nn.Embedding default init: N(0, 1)
        self.embeddings = self.param(
            "embeddings",
            nn.initializers.normal(stddev=1.0),
            (c.num_embeddings, c.embedding_dim),
        )
        # learnable readout blend, init 0.5 (``vae_model.py:31``)
        self.alpha = self.param(
            "alpha", nn.initializers.constant(0.5), ()
        )
        self.asg_conv = SeqConv(
            c.embedding_dim, kernel_size=1, strides=1, padding=0,
            name="poisson_conv",
        )
        self.asg_bn = SeqBatchNorm(name="poisson_bn")
        # 'bnlif' is a block-level Conv+BN+LIF fusion used by Encoder/
        # Decoder; the ASG's bare LIF falls back to the plain backends
        asg_backend = "auto" if self.backend == "bnlif" else self.backend
        self.asg_lif = LIF(params=_neuron_params(c), backend=asg_backend)

    def readout(self, z_seq: jax.Array) -> jax.Array:
        """Hybrid time collapse: (1-a)*memout(z) + a*mean_t(z).

        Parity: ``vae_model.py:42`` (sum/num_step == mean over T).
        """
        rate = jnp.sum(z_seq, axis=0) / self.cfg.num_steps
        return (1.0 - self.alpha) * membrane_output(
            z_seq, self.cfg.memout_decay
        ) + self.alpha * rate

    def get_code_indices(self, flat_x: jax.Array) -> jax.Array:
        """L2-nearest codebook entry per row of (M, D).

        The -2*x@e^T term is an (M, D)x(D, K) matmul — MXU work; parity
        with ``vae_model.py:87-95`` including first-min tie-breaking.
        """
        e = self.embeddings
        distances = (
            jnp.sum(flat_x**2, axis=1, keepdims=True)
            + jnp.sum(e**2, axis=1)
            - 2.0 * jnp.dot(flat_x, e.T, preferred_element_type=jnp.float32)
        )
        return jnp.argmin(distances, axis=1)

    def quantize(self, indices: jax.Array) -> jax.Array:
        """indices (...,) -> codebook vectors (..., D)."""
        return jnp.take(self.embeddings, indices, axis=0)

    def respike(self, q_nhwc: jax.Array, train: bool) -> jax.Array:
        """Adaptive spike generator: analog (N,H,W,D) -> (T,N,H,W,D) spikes.

        Parity: the ``poisson`` block, ``vae_model.py:34-38,77-79``. The
        input is direct-coded (identical across T), so Conv+BN run once on
        a length-1 time axis and broadcast into the LIF (see Encoder)."""
        q_seq = direct_encode(q_nhwc, 1)
        q_seq = self.asg_conv(q_seq)
        if self.backend == "bnlif":
            sc, sh = self.asg_bn(
                q_seq, use_running_average=not train, return_affine=True
            )
            s_seq = bn_lif(
                q_seq, sc, sh, _neuron_params(self.cfg),
                t_out=self.cfg.num_steps,
            )
            self.sow("syops", "counters",
                     _syops.neuron_entry(s_seq, s_seq))
            return s_seq
        q_seq = self.asg_bn(q_seq, use_running_average=not train)
        q_seq = jnp.broadcast_to(
            q_seq, (self.cfg.num_steps,) + q_seq.shape[1:]
        )
        return self.asg_lif(q_seq, train=train)

    def __call__(
        self, z_seq: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, Any]:
        """z_seq: (T, N, H, W, D) encoder spike train.

        train=True  -> (quantized_spike_train, vq_loss)
        train=False -> (quantized_spike_train, indices (N*H*W,))
        """
        c = self.cfg
        x_bar = self.readout(z_seq)  # (N, H, W, D)
        flat = x_bar.reshape(-1, c.embedding_dim)
        indices = self.get_code_indices(flat)
        quantized = self.quantize(indices).reshape(x_bar.shape)

        if not train:
            spikes = self.respike(quantized, train=False)
            return spikes, indices

        # analog-domain codebook + commitment loss (``vae_model.py:62-67``)
        sg = jax.lax.stop_gradient
        q_latent = jnp.mean((quantized - sg(x_bar)) ** 2)
        e_latent = jnp.mean((x_bar - sg(quantized)) ** 2)
        loss_1 = q_latent + c.commitment_cost * e_latent

        if c.usage_loss_weight > 0.0:
            # codebook-usage uniformity: KL(soft usage || uniform) over the
            # batch's soft assignments — the working version of the
            # reference's 'uni' experiment (its FID_loss is a constant 0)
            d = (
                jnp.sum(flat**2, axis=1, keepdims=True)
                + jnp.sum(self.embeddings**2, axis=1)
                - 2.0 * flat @ self.embeddings.T
            )
            soft = jax.nn.softmax(-d, axis=1)  # (M, K)
            usage = jnp.mean(soft, axis=0)  # (K,)
            kl_uniform = jnp.sum(
                usage * (jnp.log(usage + 1e-12) + jnp.log(float(c.num_embeddings)))
            )
            loss_1 = loss_1 + c.usage_loss_weight * kl_uniform

        # straight-through estimator (``vae_model.py:72``)
        quantized = x_bar + sg(quantized - x_bar)

        spikes = self.respike(quantized, train=True)

        # PSP spike-train-domain loss (``vae_model.py:81-83``), restructured:
        # PSP is a LINEAR filter, so
        #   mean((psp(q) - sg(psp(z)))^2) == mean(psp(q - sg(z))^2)
        # and the commitment pair q_latent_2 + beta*e_latent_2 shares one
        # forward value v = mean(psp(q - z)^2) with gradient coefficient 1
        # toward the spikes and beta toward z. Scaling z's *gradient* by
        # beta inside the difference reproduces both terms from a single
        # PSP pass over the difference train — instead of materializing
        # and filtering two full (T, N, h, w, D) PSP trains.
        # (Value+grad equality vs the naive form: tests/test_vq.py.)
        beta = c.commitment_cost
        d_seq = spikes - (beta * z_seq + (1.0 - beta) * sg(z_seq))
        v = jnp.mean(psp(d_seq, c.psp_tau_s) ** 2)
        loss_2 = v + sg(beta * v)

        return spikes, loss_1 + loss_2


class SNNVQVAE(nn.Module):
    """Full VQ-SVAE: encoder -> SQ -> decoder -> tanh(membrane readout).

    Parity: ``vae_model.py:161-196``. ``__call__`` takes the analog image
    (N, H, W, C) in [-0.5, 0.5]; direct coding repeats it T times
    (``main.py:133``).
    """

    cfg: VQVAEConfig
    backend: str = "auto"
    dtype: Optional[jnp.dtype] = None  # bfloat16 halves HBM traffic

    def setup(self):
        self.encoder = Encoder(self.cfg, backend=self.backend, dtype=self.dtype)
        self.vq_layer = VectorQuantizer(self.cfg, backend=self.backend)
        self.decoder = Decoder(self.cfg, backend=self.backend, dtype=self.dtype)

    def __call__(
        self, image: jax.Array, train: bool = True, data_variance: float = 1.0
    ) -> Dict[str, jax.Array]:
        x_seq = direct_encode(image, self.cfg.num_steps)
        z_seq = self.encoder(x_seq, train=train, first_replicated=True)

        if not train:
            e_seq, indices = self.vq_layer(z_seq, train=False)
            recon = self._decode_spikes(e_seq, train=False)
            return {"recon": recon, "indices": indices, "spikes": e_seq}

        e_seq, vq_loss = self.vq_layer(z_seq, train=True)
        recon = self._decode_spikes(e_seq, train=True)
        real_recon_loss = jnp.mean((recon - image) ** 2)
        return {
            "vq_loss": vq_loss,
            "recon_loss": real_recon_loss / data_variance,
            "real_recon_loss": real_recon_loss,
            "recon": recon,
        }

    def _decode_spikes(self, e_seq: jax.Array, train: bool) -> jax.Array:
        x_seq = self.decoder(e_seq, train=train)
        return jnp.tanh(membrane_output(x_seq, self.cfg.memout_decay))

    def encode_indices(self, image: jax.Array) -> jax.Array:
        """Analog image -> (N, h, w) code-index grid for stage-2 training.

        Parity: ``vq_diffusion.py:23-36`` (eval forward, reshape(B,7,7)).
        """
        x_seq = direct_encode(image, self.cfg.num_steps)
        z_seq = self.encoder(x_seq, train=False, first_replicated=True)
        x_bar = self.vq_layer.readout(z_seq)
        flat = x_bar.reshape(-1, self.cfg.embedding_dim)
        indices = self.vq_layer.get_code_indices(flat)
        n = image.shape[0]
        return indices.reshape(n, self.cfg.latent_size, self.cfg.latent_size)

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        """(N, h, w) code indices -> reconstructed images (N, H, W, C).

        Parity: the sampling decode path ``main.py:388-399`` (quantize ->
        re-spike -> decoder -> tanh(memout)).
        """
        q = self.vq_layer.quantize(indices)  # (N, h, w, D)
        spikes = self.vq_layer.respike(q, train=False)
        return self._decode_spikes(spikes, train=False)
