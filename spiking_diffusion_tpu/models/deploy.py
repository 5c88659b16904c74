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


# ---------------------------------------------------------------------------
# Lynxi exchange (spikingjelly ``activation_based/lynxi_exchange.py:1-226``)
# ---------------------------------------------------------------------------
#
# The reference rewrites spikingjelly modules into "Lynxi-supported" plain
# torch modules (``to_lynxi_supported_modules``) and compiles them with the
# proprietary ``lyngor`` toolchain, under two chip constraints: tensors are
# at most 4-D, and multi-step networks fold T into the batch axis
# (``BaseNode.forward`` with ``step_mode='m'`` reshapes ``(T*N, ...)`` ->
# ``(T, N, -1)`` internally, ``lynxi_exchange.py:60-91``). ``lyngor`` does
# not exist off-Lynxi hosts, so the export here produces what that flow
# consumes: a JSON manifest in the Lynxi op vocabulary (Conv2d /
# BatchNorm2d / pools / Flatten / Linear / IFNode / LIFNode with the
# T-folded batch convention) plus an npz of weights in torch layout
# (conv OIHW, linear (out, in)). ``lynxi_reference_forward`` executes the
# manifest directly — the parity test proving the export is complete and
# self-describing (tests/test_deploy_lynxi.py).

LYNXI_SUPPORTED = {
    "Conv2d", "BatchNorm2d", "MaxPool2d", "AvgPool2d",
    "AdaptiveAvgPool2d", "Flatten", "Linear", "IFNode", "LIFNode",
}
LYNXI_FORMAT_VERSION = 1


def lynxi_layers_from_vgg(
    cfg: Tuple, num_classes: int,
    neuron_params: NeuronParams = NeuronParams(),
) -> list:
    """Layer list for a trained :class:`models.zoo.SpikingVGG` in the
    Lynxi vocabulary, with ``params`` refs into the flax variable tree.
    The conv trunk maps 1:1; the rate decode (mean over T) happens
    host-side after inference and is declared in the manifest."""
    if not (neuron_params.hard_reset and neuron_params.v_reset == 0.0):
        raise ValueError(
            "lynxi BaseNode supports hard reset to v_reset only "
            "(lynxi_exchange.py:38-45)"
        )
    layers = []
    conv_i = 0
    for v in cfg:
        if v == "M":
            layers.append({"type": "MaxPool2d",
                           "attrs": {"kernel_size": 2, "stride": 2}})
        else:
            layers.append({
                "type": "Conv2d",
                "attrs": {"out_channels": int(v), "kernel_size": 3,
                          "stride": 1, "padding": 1, "bias": True},
                "params": f"SeqConv_{conv_i}/Conv_0",
            })
            layers.append({
                "type": "BatchNorm2d",
                "attrs": {"num_features": int(v), "eps": 1e-5},
                "params": f"SeqBatchNorm_{conv_i}/BatchNorm_0",
            })
            layers.append({
                "type": "LIFNode",
                "attrs": {
                    "tau": neuron_params.tau,
                    "v_threshold": neuron_params.v_threshold,
                    "v_reset": neuron_params.v_reset,
                    "decay_input": neuron_params.decay_input,
                },
            })
            conv_i += 1
    layers.append({"type": "Flatten", "attrs": {}})
    layers.append({
        "type": "Linear",
        "attrs": {"out_features": int(num_classes), "bias": True},
        "params": "SeqLinear_0/Dense_0",
    })
    return layers


def _get_path(tree: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def export_lynxi(
    layers: list,
    variables: Dict[str, Any],
    path: str,
    T: int,
    meta: Dict[str, Any] | None = None,
) -> Tuple[str, str]:
    """Write ``<path>.lynxi.json`` + ``<path>.lynxi.npz``.

    Weight layouts follow torch (what ``lyngor`` loads): conv kernels
    OIHW (transposed from flax HWIO), linear weights ``(out, in)``.
    Activations stay NHWC with HWC flatten order — declared in the
    manifest so a consumer can insert the layout permutes its compiler
    needs. Validates every layer type against the Lynxi-supported set and
    that no exported tensor exceeds 4-D (chip constraint,
    ``lynxi_exchange.py:17``).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    arrays: Dict[str, np.ndarray] = {}
    out_layers = []
    for i, layer in enumerate(layers):
        kind = layer["type"]
        if kind not in LYNXI_SUPPORTED:
            raise ValueError(
                f"layer {i}: {kind!r} is not Lynxi-supported "
                f"(supported: {sorted(LYNXI_SUPPORTED)})"
            )
        entry = {"type": kind, "attrs": dict(layer["attrs"]), "tensors": {}}

        def put(name: str, value: np.ndarray) -> None:
            value = np.asarray(value)
            if value.ndim > 4:
                raise ValueError(
                    f"layer {i} tensor {name}: {value.ndim}-D exceeds the "
                    "Lynxi 4-D limit"
                )
            key = f"layer{i}_{name}"
            arrays[key] = value
            entry["tensors"][name] = key

        if kind == "Conv2d":
            p = _get_path(params, layer["params"])
            put("weight", np.transpose(p["kernel"], (3, 2, 0, 1)))  # OIHW
            if "bias" in p:
                put("bias", p["bias"])
        elif kind == "Linear":
            p = _get_path(params, layer["params"])
            put("weight", np.transpose(p["kernel"], (1, 0)))  # (out, in)
            if "bias" in p:
                put("bias", p["bias"])
        elif kind == "BatchNorm2d":
            p = _get_path(params, layer["params"])
            s = _get_path(stats, layer["params"])
            put("weight", p["scale"])
            put("bias", p["bias"])
            put("running_mean", s["mean"])
            put("running_var", s["var"])
        out_layers.append(entry)

    json_path = path + ".lynxi.json"
    npz_path = path + ".lynxi.npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(npz_path, **arrays)
    manifest = {
        "format": "lynxi",
        "format_version": LYNXI_FORMAT_VERSION,
        "T": int(T),
        "step_mode": "m",
        "input_convention": "(T*N, H, W, C) — T folded into batch "
                            "(lynxi BaseNode step_mode='m')",
        "activation_layout": "NHWC",
        "flatten_order": "HWC",
        "readout": "rate (mean over the T axis, host-side)",
        "layers": out_layers,
        "meta": meta or {},
    }
    with open(json_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return json_path, npz_path


def lynxi_reference_forward(
    json_path: str, npz_path: str, x: np.ndarray
) -> np.ndarray:
    """Execute an exported Lynxi manifest on ``(T*N, H, W, C)`` input,
    replicating the lynxi module semantics (``BaseNode.multi_step_forward``
    charge -> fire -> hard reset per step, T folded into batch) — the
    ground truth a Lynxi backend must reproduce, and the parity check that
    the export is self-contained. Returns ``(T*N, num_classes)`` logits
    (rate decode is the consumer's job, as on the chip)."""
    import jax.numpy as jnp
    from jax import lax

    with open(json_path) as f:
        manifest = json.load(f)
    data = np.load(npz_path)
    T = manifest["T"]
    h = jnp.asarray(x, jnp.float32)

    def tensor(entry, name):
        return jnp.asarray(data[entry["tensors"][name]])

    for entry in manifest["layers"]:
        kind, attrs = entry["type"], entry["attrs"]
        if kind == "Conv2d":
            w = tensor(entry, "weight")  # OIHW
            w = jnp.transpose(w, (2, 3, 1, 0))  # -> HWIO for NHWC conv
            pad = attrs["padding"]
            h = lax.conv_general_dilated(
                h, w, (attrs["stride"],) * 2,
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if "bias" in entry["tensors"]:
                h = h + tensor(entry, "bias")
        elif kind == "BatchNorm2d":
            mean = tensor(entry, "running_mean")
            var = tensor(entry, "running_var")
            h = (h - mean) / jnp.sqrt(var + attrs["eps"])
            h = h * tensor(entry, "weight") + tensor(entry, "bias")
        elif kind in ("IFNode", "LIFNode"):
            th = attrs.get("v_threshold", 1.0)
            v_reset = attrs.get("v_reset", 0.0)
            tn = h.shape[0]
            seq = h.reshape(T, tn // T, -1)

            def step(v, xt, kind=kind, attrs=attrs, th=th, vr=v_reset):
                if kind == "LIFNode":
                    decay = 1.0 / attrs["tau"]
                    v = (1.0 - decay) * (v - vr)
                    v = v + (xt * decay if attrs["decay_input"] else xt)
                else:
                    v = v + xt
                s = (v >= th).astype(xt.dtype)
                return (1.0 - s) * v + s * vr, s

            _, spikes = lax.scan(step, jnp.zeros_like(seq[0]), seq)
            h = spikes.reshape(h.shape)
        elif kind == "MaxPool2d":
            k, s = attrs["kernel_size"], attrs["stride"]
            h = lax.reduce_window(
                h, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
            )
        elif kind == "AvgPool2d":
            k, s = attrs["kernel_size"], attrs["stride"]
            h = lax.reduce_window(
                h, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1), "VALID"
            ) / (k * k)
        elif kind == "Flatten":
            h = h.reshape(h.shape[0], -1)
        elif kind == "Linear":
            h = h @ tensor(entry, "weight").T
            if "bias" in entry["tensors"]:
                h = h + tensor(entry, "bias")
        else:
            raise ValueError(f"unhandled layer type {kind!r}")
    return np.asarray(h)
