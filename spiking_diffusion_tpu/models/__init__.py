"""Model layer: spiking VQ-VAE, SNN-VAE, ANN VQ-VAE, diffusion denoiser.

Rebuilds the reference model family (``Spiking-Diffusion-release/snn_model/``)
as flax.linen modules over a (T, N, H, W, C) layout — channels-last, time
leading — which is the TPU-native data layout (the reference is NCHW torch).
"""

from spiking_diffusion_tpu.models.layers import (
    LIF,
    SeqBatchNorm,
    SeqConv,
    SeqConvTranspose,
    SeqLinear,
    torch_bias_init,
    torch_kernel_init,
)
from spiking_diffusion_tpu.models.vqvae import (
    Decoder,
    Encoder,
    SNNVQVAE,
    VectorQuantizer,
)
from spiking_diffusion_tpu.models.denoiser import SpikingDenoiser
from spiking_diffusion_tpu.models.ann_vqvae import ANNVQVAE
from spiking_diffusion_tpu.models.snn_vae import SNNVAE
from spiking_diffusion_tpu.models import (
    ann2snn,
    attention,
    deploy,
    lava_export,
    diffusion,
    dropconnect,
    recurrent,
    zoo,
)

__all__ = [
    "ann2snn",
    "attention",
    "deploy",
    "lava_export",
    "diffusion",
    "dropconnect",
    "recurrent",
    "zoo",
    "LIF",
    "SeqBatchNorm",
    "SeqConv",
    "SeqConvTranspose",
    "SeqLinear",
    "torch_bias_init",
    "torch_kernel_init",
    "Decoder",
    "Encoder",
    "SNNVQVAE",
    "VectorQuantizer",
    "SpikingDenoiser",
    "ANNVQVAE",
    "SNNVAE",
]
