"""spiking_diffusion_tpu — a TPU-native spiking-neural-network generative framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Arktis2022/Spiking-Diffusion (arXiv:2308.10187): a fully spiking two-stage
generative model (spiking VQ-VAE + absorbing-state discrete diffusion prior),
plus the surrounding SNN runtime (LIF neurons with surrogate gradients,
step-aware layers, spike encoders), evaluation suite (MSE/SSIM/FID/IS/KID,
mode-coverage), and a syops-style spike/energy profiler.

Design stance (TPU-first, not a port):
  * membrane state lives in ``lax.scan`` carries — there are no stateful
    modules and no ``reset_net`` (reference: spikingjelly ``MemoryModule``);
  * the surrogate spike function is a ``jax.custom_vjp``;
  * the fused LIF forward/backward-through-time kernels are Pallas TPU
    kernels (reference: CuPy/NVRTC CUDA codegen in
    ``spikingjelly/activation_based/auto_cuda``);
  * samplers run entirely on-device (``lax.scan`` + ``jax.random``), no
    per-step host round-trips (reference pays one per denoise step via
    ``torch.distributions.Categorical``).
"""

__version__ = "0.1.0"

from spiking_diffusion_tpu import config as config

__all__ = ["config", "__version__"]
