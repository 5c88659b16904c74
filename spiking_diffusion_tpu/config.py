"""Central configuration for the framework.

The reference scatters hyperparameters across ``main.py`` (batch size 32,
embedding_dim 16, codebook 128, AdamW lr 1e-3 / wd 1e-3, see
``Spiking-Diffusion-release/main.py:67-70,113-116``) and module constructors
(T=16 in ``snn_model/snn_layers.py:31``; 49 diffusion steps in
``snn_model/vq_diffusion.py:48``). Here everything lives in frozen
dataclasses so a whole experiment is one hashable, jit-static object.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class LIFConfig:
    """Leaky-integrate-and-fire neuron constants.

    Parity target: spikingjelly ``LIFNode`` defaults exercised by the app
    (tau=2.0, v_threshold=1.0, v_reset=0.0, decay_input=True, hard reset,
    detach_reset=False, ATan surrogate with alpha=2).
    """

    tau: float = 2.0
    v_threshold: float = 1.0
    v_reset: float = 0.0
    decay_input: bool = True
    hard_reset: bool = True
    detach_reset: bool = False
    surrogate: str = "atan"
    surrogate_alpha: float = 2.0

    def to_params(self):
        """Build the runtime :class:`~spiking_diffusion_tpu.snn.NeuronParams`."""
        from spiking_diffusion_tpu.snn.neuron import NeuronParams
        from spiking_diffusion_tpu.snn.surrogate import get_surrogate

        return NeuronParams(
            tau=self.tau,
            v_threshold=self.v_threshold,
            v_reset=self.v_reset,
            decay_input=self.decay_input,
            hard_reset=self.hard_reset,
            detach_reset=self.detach_reset,
            surrogate=get_surrogate(self.surrogate, self.surrogate_alpha),
        )


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    """Stage-1 spiking VQ-VAE (reference ``snn_model/vae_model.py:161-196``)."""

    in_channels: int = 1
    image_size: int = 28
    latent_size: int = 7
    embedding_dim: int = 16
    num_embeddings: int = 128
    commitment_cost: float = 0.25
    # > 0 enables the codebook-usage-uniformity regularizer — the INTENT
    # of the reference's broken 'snn-vq-vae-uni' variant
    # (``vae_model.py:674-879``: its FID_loss is returned as constant 0
    # and the model class is clobbered dead code, SURVEY.md §2a)
    usage_loss_weight: float = 0.0
    num_steps: int = 16  # T, the SNN time window
    enc_channels: Tuple[int, ...] = (32, 64)
    dec_channels: Tuple[int, ...] = (64, 32)
    memout_decay: float = 0.8  # MembraneOutputLayer coefficient base
    psp_tau_s: float = 2.0
    lif: LIFConfig = dataclasses.field(default_factory=LIFConfig)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Stage-2 absorbing discrete diffusion (``snn_model/vq_diffusion.py:43-147``)."""

    num_timesteps: int = 49
    latent_size: int = 7
    num_embeddings: int = 128
    mask_id: int = 128  # default: == num_embeddings ("codebook_size" mode)
    loss_type: str = "reweighted_elbo"  # or "elbo"
    num_steps: int = 16  # SNN time window of the denoiser
    denoiser_channels: Tuple[int, ...] = (64, 128, 256, 512, 256)
    lif: LIFConfig = dataclasses.field(default_factory=LIFConfig)


@dataclasses.dataclass(frozen=True)
class SNNVAEConfig:
    """FSVAE-style autoregressive-Bernoulli SNN-VAE baseline
    (``snn_model/vae_model.py:198-545``)."""

    latent_dim: int = 56  # 28*2
    k: int = 20
    num_steps: int = 16
    scheduled_start: float = 0.1
    scheduled_end: float = 0.3
    lif: LIFConfig = dataclasses.field(default_factory=LIFConfig)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    learning_rate: float = 1e-3
    weight_decay: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    epochs: int = 100
    seed: int = 42
    # compute dtype for conv/matmul activations; membranes always fp32
    compute_dtype: str = "float32"
    # 'auto' = pallas on TPU, scan elsewhere
    lif_backend: str = "auto"
    # data-parallel device count; 1 = single chip
    data_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    dataset: str = "MNIST"
    model: str = "snn-vq-vae"  # snn-vq-vae | snn-vae | vq-vae
    data_path: Optional[str] = None
    vqvae: VQVAEConfig = dataclasses.field(default_factory=VQVAEConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    snn_vae: SNNVAEConfig = dataclasses.field(default_factory=SNNVAEConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    result_dir: str = "./result"
    sample_dir: str = "./sample"
