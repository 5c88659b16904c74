"""Parallelism layer: device mesh, batch sharding, replication.

The reference has **no** distributed training of any kind (single CUDA
device, SURVEY.md §2d). The TPU-native scale-out for this model family is
batch-axis data parallelism over ICI: a 1-D ``jax.sharding.Mesh``, batch
sharded on the 'data' axis, parameters replicated. Under ``jit`` XLA
inserts the gradient all-reduce (psum over ICI) automatically from the
sharding annotations — there is no hand-written collective in the training
path (the "How to Scale Your Model" recipe).
"""

from spiking_diffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_map_compat,
)
from spiking_diffusion_tpu.parallel.tp import (
    make_mesh_2d,
    shard_batch_2d,
    shard_state_tp,
    shard_variables_tp,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "shard_map_compat",
    "shard_batch_2d",
    "shard_state_tp",
    "shard_variables_tp",
]
