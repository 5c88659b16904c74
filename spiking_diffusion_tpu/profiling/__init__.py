"""Profiling layer: spike-aware op/energy accounting + timing harness.

Replaces the reference's ``syops/`` forward-hook counter and the CUDA
timing utilities (``cuda_utils.cal_fun_t``, ``GPUMonitor``) with a sown
variable collection (free unless requested) and a
``jax.block_until_ready``-based benchmark harness.
"""

from spiking_diffusion_tpu.profiling import syops
from spiking_diffusion_tpu.profiling import monitor
from spiking_diffusion_tpu.profiling.timing import benchmark, trace

__all__ = ["syops", "monitor", "benchmark", "trace"]
