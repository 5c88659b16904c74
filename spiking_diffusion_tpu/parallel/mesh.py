"""Mesh construction and sharding helpers for data-parallel training."""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D device mesh over the first n devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # fall back to the host CPU backend: with
            # --xla_force_host_platform_device_count=N it exposes N virtual
            # devices even when another platform is the default — this is
            # how multi-chip sharding is validated without N real chips.
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devices = cpu
            else:
                raise ValueError(
                    f"need {n_devices} devices, have {len(devices)} "
                    f"{[d.platform for d in devices[:4]]} and "
                    f"{len(cpu)} cpu"
                )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh; replicate the rest."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: jax.Array, mesh: Mesh, axis_name: str = "data") -> jax.Array:
    """Place a host batch onto the mesh, sharded on the leading axis."""
    return jax.device_put(batch, batch_sharding(mesh, batch.ndim, axis_name))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every array leaf of a pytree across the mesh."""
    sh = replicated_sharding(mesh)

    def place(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(place, tree)


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """``jax.shard_map`` across jax API generations.

    jax >= 0.8 renamed ``check_rep`` to ``check_vma`` and promoted
    shard_map out of experimental; TypeError covers versions where
    ``jax.shard_map`` exists but still takes the old flag. Replication
    checking is disabled either way: bodies here contain Pallas custom
    calls (opaque to the rep checker) and explicit collectives.
    """
    try:
        from jax import shard_map

        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except (ImportError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
