"""Core SNN runtime: surrogate gradients, neuron dynamics, temporal layers.

TPU-native replacement for spikingjelly's ``activation_based`` runtime
(``base.py``/``neuron.py``/``surrogate.py``/``functional.py``): everything is
a pure function; membrane state is a ``lax.scan`` carry, not module memory.
"""

from spiking_diffusion_tpu.snn.surrogate import (
    SurrogateFn,
    atan,
    erf,
    get_surrogate,
    heaviside,
    leaky_k_relu,
    piecewise_quadratic,
    sigmoid,
    soft_sign,
    spike_fn,
)
from spiking_diffusion_tpu.snn.neuron import (
    NeuronParams,
    eif_scan,
    if_step,
    izhikevich_scan,
    lif_multi_step,
    lif_scan,
    lif_step,
    if_scan,
    plif_scan,
    qif_scan,
)
from spiking_diffusion_tpu.snn import functional, quantize
from spiking_diffusion_tpu.snn.temporal import (
    membrane_output,
    membrane_output_coef,
    psp,
    seq_apply,
)
from spiking_diffusion_tpu.snn.encoding import (
    direct_encode,
    latency_encode,
    periodic_encode,
    poisson_encode,
    weighted_phase_encode,
)
from spiking_diffusion_tpu.snn import learning, rnn, tempotron

__all__ = [
    "SurrogateFn",
    "atan",
    "erf",
    "get_surrogate",
    "heaviside",
    "leaky_k_relu",
    "piecewise_quadratic",
    "sigmoid",
    "soft_sign",
    "spike_fn",
    "NeuronParams",
    "eif_scan",
    "functional",
    "if_step",
    "izhikevich_scan",
    "lif_multi_step",
    "lif_scan",
    "lif_step",
    "if_scan",
    "plif_scan",
    "qif_scan",
    "quantize",
    "membrane_output",
    "membrane_output_coef",
    "psp",
    "seq_apply",
    "direct_encode",
    "latency_encode",
    "learning",
    "periodic_encode",
    "poisson_encode",
    "rnn",
    "tempotron",
    "weighted_phase_encode",
]
