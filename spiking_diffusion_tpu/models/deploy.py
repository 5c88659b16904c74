"""Deployment export — the spikingjelly ``lava_exchange``/``lynxi_exchange``
row, re-targeted.

The reference converts spikingjelly models to Lava-DL (Loihi) or Lynxi
formats. Neither runtime exists on TPU hosts; the capability that matters
— *get a trained SNN out of the framework in a portable, runtime-neutral
form* — is provided here: ``export_netlist`` walks a trained model's
variables into a flat JSON+npz "netlist" (layer topology, neuron
constants, weights, BN stats), and ``import_netlist`` reloads it. A Lava
or Lynxi backend can be written against this format without importing JAX.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

from spiking_diffusion_tpu.snn.neuron import NeuronParams

FORMAT_VERSION = 1


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export_netlist(
    variables: Dict[str, Any],
    path: str,
    neuron_params: NeuronParams = NeuronParams(),
    meta: Dict[str, Any] | None = None,
    collections: Tuple[str, ...] = ("params", "batch_stats"),
) -> Tuple[str, str]:
    """Write <path>.json (topology + neuron constants) and <path>.npz
    (arrays). Returns the two file paths.

    Only persistent collections are exported (transient sown collections
    like 'syops'/'intermediates' are profiling byproducts, not weights).
    """
    arrays = {}
    for coll, tree in variables.items():
        if coll in collections:
            arrays.update(_flatten(tree, f"{coll}/"))
    npz_path = path + ".npz"
    json_path = path + ".json"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(npz_path, **arrays)
    manifest = {
        "format_version": FORMAT_VERSION,
        "neuron": {
            "model": "LIF",
            "tau": neuron_params.tau,
            "v_threshold": neuron_params.v_threshold,
            "v_reset": neuron_params.v_reset,
            "decay_input": neuron_params.decay_input,
            "hard_reset": neuron_params.hard_reset,
            "surrogate": neuron_params.surrogate.name,
            "surrogate_alpha": neuron_params.surrogate.alpha,
        },
        "tensors": {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in arrays.items()
        },
        "meta": meta or {},
    }
    with open(json_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return json_path, npz_path


def import_netlist(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read back (variables, manifest) from an exported netlist."""
    with open(path + ".json") as f:
        manifest = json.load(f)
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError("netlist from a newer format version")
    data = np.load(path + ".npz")
    flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    import jax.numpy as jnp

    variables = jax.tree.map(jnp.asarray, tree)
    return variables, manifest
