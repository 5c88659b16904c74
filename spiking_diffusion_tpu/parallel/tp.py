"""2-D (data x model) mesh: batch DP + channel-wise tensor parallelism.

The reference has no distributed path at all (SURVEY.md §2d); round 1
built 1-D batch DP. This module adds the natural second mesh axis for
this model family: **output-channel sharding** of the conv/dense weights
over a 'model' axis, composed with batch sharding over 'data'.

How it works (the "How to Scale Your Model" recipe — annotate, let XLA
insert collectives):

- every conv kernel (kh, kw, cin, cout) is sharded P(..., 'model') on
  cout; its bias and the following BatchNorm scale/bias/mean/var shard
  the same way (all are per-output-channel vectors);
- the VQ codebook (K, D) shards K over 'model' — the L2-argmin becomes a
  sharded matmul + global argmin, for which XLA inserts the cross-device
  reduction;
- activations flow with the channel axis sharded between layers where
  XLA chooses to keep them that way; LIF/elementwise ops are trivially
  partitionable; BN statistics reduce over batch+spatial only, so no
  cross-'model' collective is needed for the stats;
- gradients all-reduce over 'data' and stay sharded over 'model'.

At the reference's own scale (channels 32..512) TP is about capability,
not speed — channel dims this small underfill even one chip's MXU. It
exists so the framework's scale-out story covers model sharding when a
bigger SNN needs it, and it is validated numerically (== single device)
on virtual meshes (tests/test_tensor_parallel.py) and by the driver's
``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    dp: int, tp: int, axis_names: Tuple[str, str] = ("data", "model")
) -> Mesh:
    """(dp x tp) device mesh; falls back to the virtual CPU devices the
    same way :func:`parallel.mesh.make_mesh` does."""
    n = dp * tp
    devices = jax.devices()
    if len(devices) < n:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devices = cpu
        else:
            raise ValueError(
                f"need {n} devices, have {len(devices)} and {len(cpu)} cpu"
            )
    arr = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names)


def _param_spec(path: Tuple[str, ...], leaf: jax.Array, axis: str) -> P:
    """Output-channel sharding rule for a variables-tree leaf."""
    name = str(path[-1]) if path else ""
    if name == "kernel":
        if leaf.ndim >= 2:
            # conv (kh, kw, cin, cout) or dense (in, out): shard the last
            return P(*([None] * (leaf.ndim - 1) + [axis]))
        return P()
    if name == "embeddings" and leaf.ndim == 2:
        return P(axis, None)  # codebook rows over 'model'
    if leaf.ndim == 1:
        # bias / BN scale / BN bias / BN mean / BN var: per-channel
        return P(axis)
    return P()


def shard_variables_tp(
    tree: Any, mesh: Mesh, axis: str = "model", min_size: int = 2
) -> Any:
    """Place a params/batch_stats tree with output-channel sharding.

    Leaves whose sharded dimension does not divide the axis size (or are
    smaller than ``min_size`` per shard) are replicated instead — XLA
    requires even sharding, and tiny vectors gain nothing.
    """
    n_shards = mesh.shape[axis]

    def place(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        spec = _param_spec(tuple(getattr(p, "key", str(p)) for p in path),
                           leaf, axis)
        # check divisibility of every sharded dim
        for dim, part in enumerate(spec):
            if part == axis and (
                leaf.shape[dim] % n_shards or leaf.shape[dim] < min_size * n_shards
            ):
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_state_tp(state, mesh: Mesh, axis: str = "model"):
    """Shard a TrainState: params/batch_stats channel-sharded; optimizer
    moments (whose sub-trees mirror the params structure, e.g. Adam's
    mu/nu) shard exactly like their parameters; scalars replicated."""
    new_params = shard_variables_tp(state.params, mesh, axis)
    new_bs = shard_variables_tp(state.batch_stats, mesh, axis)
    params_treedef = jax.tree_util.tree_structure(new_params)
    repl = NamedSharding(mesh, P())

    def like_params(subtree):
        return jax.tree_util.tree_map(
            lambda p, x: jax.device_put(x, p.sharding), new_params, subtree
        )

    def place(part):
        if jax.tree_util.tree_structure(part) == params_treedef:
            return like_params(part)
        if hasattr(part, "_fields"):  # NamedTuple optax state
            return type(part)(
                *[place(getattr(part, f)) for f in part._fields]
            )
        if isinstance(part, (tuple, list)):
            return type(part)(place(p) for p in part)
        if hasattr(part, "ndim"):
            return jax.device_put(part, repl)
        return part

    return state.replace(
        params=new_params,
        batch_stats=new_bs,
        opt_state=place(state.opt_state),
        step=jax.device_put(state.step, repl),
    )


def shard_batch_2d(batch: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Batch axis over 'data'; everything else replicated (incl. 'model')."""
    spec = P(axis, *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))
