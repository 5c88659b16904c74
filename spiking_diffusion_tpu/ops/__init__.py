"""Native TPU kernel layer (Pallas).

Replaces the reference's CUDA layer — the CuPy/NVRTC codegen framework
(``spikingjelly/activation_based/auto_cuda/``), the hand-written
``neuron_kernel.py`` CUDA strings, and the cuDNN ``spike_op`` binding —
with Pallas TPU kernels compiled through Mosaic/XLA. The kernel-launch
infrastructure (block calculation, pointer marshalling, compile cache) is
XLA's job here: ``pl.pallas_call`` grid/BlockSpec plays the role of
``cal_blocks``/``wrap_args_to_raw_kernel``.
"""

from spiking_diffusion_tpu.ops.pallas_lif import lif_fused
from spiking_diffusion_tpu.ops.unrolled_lif import lif_unrolled

__all__ = ["lif_fused", "lif_unrolled"]
