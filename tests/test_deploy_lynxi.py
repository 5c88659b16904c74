"""Lynxi exchange: export a trained SpikingVGG and prove the manifest is
self-contained by re-executing it with the lynxi module semantics
(``spikingjelly.zip!activation_based/lynxi_exchange.py``) and matching the
flax model's inference output exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.models import deploy, zoo
from spiking_diffusion_tpu.snn.neuron import NeuronParams

CFG = (4, "M", 8)
T, N, HW, C = 3, 2, 8, 1


@pytest.fixture(scope="module")
def trained_vgg():
    model = zoo.SpikingVGG(cfg=CFG, num_classes=5, backend="scan")
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (T, N, HW, HW, C))
    variables = model.init(key, x, train=True)
    # one train-mode pass so batch_stats move off their init values
    _, mut = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mut["batch_stats"]}
    return model, variables, x


def test_lynxi_export_and_reference_forward(tmp_path, trained_vgg):
    model, variables, x = trained_vgg
    layers = deploy.lynxi_layers_from_vgg(CFG, num_classes=5)
    json_path, npz_path = deploy.export_lynxi(
        layers, variables, os.path.join(tmp_path, "vgg"), T=T
    )
    assert os.path.exists(json_path) and os.path.exists(npz_path)

    # lynxi convention: T folded into batch, NHWC activations
    x_folded = np.asarray(x).reshape(T * N, HW, HW, C)
    logits_folded = deploy.lynxi_reference_forward(
        json_path, npz_path, x_folded
    )
    assert logits_folded.shape == (T * N, 5)
    # rate decode host-side (manifest['readout'])
    got = logits_folded.reshape(T, N, 5).mean(axis=0)

    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_lynxi_weight_layouts(tmp_path, trained_vgg):
    _model, variables, _x = trained_vgg
    layers = deploy.lynxi_layers_from_vgg(CFG, num_classes=5)
    json_path, npz_path = deploy.export_lynxi(
        layers, variables, os.path.join(tmp_path, "vgg"), T=T
    )
    import json

    with open(json_path) as f:
        manifest = json.load(f)
    data = np.load(npz_path)
    convs = [e for e in manifest["layers"] if e["type"] == "Conv2d"]
    # torch OIHW: first conv is (4, 1, 3, 3)
    assert data[convs[0]["tensors"]["weight"]].shape == (4, 1, 3, 3)
    lin = [e for e in manifest["layers"] if e["type"] == "Linear"][0]
    assert data[lin["tensors"]["weight"]].shape[0] == 5  # (out, in)
    bn = [e for e in manifest["layers"] if e["type"] == "BatchNorm2d"][0]
    assert set(bn["tensors"]) == {
        "weight", "bias", "running_mean", "running_var"
    }
    assert manifest["T"] == T and manifest["step_mode"] == "m"


def test_lynxi_rejects_unsupported():
    with pytest.raises(ValueError, match="not Lynxi-supported"):
        deploy.export_lynxi(
            [{"type": "Dropout", "attrs": {}}], {"params": {}}, "/tmp/x", T=2
        )
    # soft reset is outside the lynxi BaseNode semantics
    with pytest.raises(ValueError, match="hard reset"):
        deploy.lynxi_layers_from_vgg(
            (4,), 2, NeuronParams(hard_reset=False)
        )
