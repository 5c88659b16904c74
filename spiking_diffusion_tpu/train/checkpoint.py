"""Checkpointing: orbax-backed save/restore of full train states.

The reference saves bare ``state_dict`` (``torch.save``, ``main.py:199,286``)
with no optimizer state or step counter — resume restarts from epoch 0.
Here a checkpoint is the complete TrainState pytree (params, batch_stats,
optimizer state, step), so training resumes exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from spiking_diffusion_tpu.train.state import TrainState


def _state_tree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(state: TrainState, ckpt_dir: str, name: str = "model") -> str:
    """Write the train state under ``ckpt_dir/name``; returns the path."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    tree = jax.device_get(_state_tree(state))
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(state: TrainState, ckpt_dir: str, name: str = "model") -> TrainState:
    """Restore into the (template) ``state``; shapes/dtypes must match."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    template = jax.device_get(_state_tree(state))
    tree = ckptr.restore(path, template)
    return state.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )


def checkpoint_exists(ckpt_dir: str, name: str = "model") -> bool:
    return os.path.isdir(os.path.join(ckpt_dir, name))


def load_variables(ckpt_dir: str, name: str = "model"):
    """Template-free restore of just (params, batch_stats) as host numpy
    trees — for consumers that don't need a TrainState (e.g. the torch
    parity bridge, ``models/torch_bridge.py``)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    tree = ocp.StandardCheckpointer().restore(path)
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
    return to_np(tree["params"]), to_np(tree["batch_stats"])
