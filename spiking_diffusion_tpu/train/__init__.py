"""Training layer: jitted train steps, optimizer wiring, checkpointing.

Replaces the reference's monolithic driver loops (``main.py:124-286``) with
functional, jit-compiled train steps (optax AdamW, flax TrainState-style
pytrees) and orbax checkpoints that include optimizer state and step
counters (the reference saves bare ``state_dict`` only, ``main.py:199,286``).
"""

from spiking_diffusion_tpu.train.state import TrainState, create_train_state
from spiking_diffusion_tpu.train.stage1 import (
    eval_step_vqvae,
    extract_code_indices,
    make_train_step_vqvae,
    train_vqvae,
)
from spiking_diffusion_tpu.train.stage2 import (
    make_train_step_diffusion,
    train_diffusion,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "eval_step_vqvae",
    "extract_code_indices",
    "make_train_step_vqvae",
    "train_vqvae",
    "make_train_step_diffusion",
    "train_diffusion",
]
