"""Lava-DL netx HDF5 export: schema, CUBA mapping, 1/tau weight fold."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser
from spiking_diffusion_tpu.models import lava_export
from spiking_diffusion_tpu.snn.functional import fuse_model_conv_bn
from spiking_diffusion_tpu.snn.neuron import NeuronParams


def test_cuba_device_params():
    p = NeuronParams()  # tau=2, v_th=1, hard reset, v_reset=0
    d = lava_export.cuba_device_params(p)
    assert d["type"] == "CUBA"
    assert d["iDecay"] == 4096  # current_decay = 1
    assert d["vDecay"] == 2048  # voltage_decay = 1/tau = 0.5
    assert d["vThMant"] == 64  # v_th * (1<<6)
    with pytest.raises(ValueError):
        lava_export.cuba_device_params(NeuronParams(v_reset=0.5))
    with pytest.raises(ValueError):
        lava_export.cuba_device_params(NeuronParams(hard_reset=False))
    # decay_input handled by weight fold, not a rejection (unlike the
    # reference's lava_exchange.py:580-581)
    assert lava_export.input_weight_scale(NeuronParams()) == 0.5
    assert lava_export.input_weight_scale(
        NeuronParams(decay_input=False)
    ) == 1.0


CFG = DiffusionConfig(
    num_timesteps=4, latent_size=7, num_embeddings=6, mask_id=6,
    num_steps=3, denoiser_channels=(4, 8, 4, 4, 4),
)


def _denoiser_vars():
    model = SpikingDenoiser(CFG, backend="scan")
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 7, 7), jnp.int32)
    t0 = jnp.ones((2,), jnp.int32)
    return jax.jit(lambda k: model.init(k, x0, t0, train=True))(key)


def test_denoiser_netx_roundtrip(tmp_path):
    variables = _denoiser_vars()
    path = str(tmp_path / "denoiser.net")
    lava_export.denoiser_to_netx(variables, CFG, path)

    fused = fuse_model_conv_bn(variables)
    with h5py.File(path, "r") as f:
        layers = f["layer"]
        n = len(CFG.denoiser_channels)
        assert sorted(layers.keys(), key=int) == [str(i) for i in range(n + 2)]
        assert bytes(layers["0/type"][()]) == b"input"

        # block 1: conv weight == folded flax kernel, transposed to
        # (out,in,kh,kw), scaled by 1/tau (decay_input fold)
        k0 = np.asarray(fused["params"]["SeqConv_0"]["Conv_0"]["kernel"])
        w1 = layers["1/weight"][()]
        np.testing.assert_allclose(
            w1, np.transpose(k0, (3, 2, 0, 1)) * 0.5, rtol=1e-6
        )
        ng = layers["1/neuron"]
        assert bytes(ng["type"][()]) == b"CUBA"
        assert int(ng["vDecay"][()]) == 2048
        assert list(layers["1/stride"][()]) == [1, 1]
        assert list(layers["1/padding"][()]) == [1, 1]

        # final logits conv: no neuron group, weights NOT 1/tau-scaled
        last = layers[str(n + 1)]
        assert "neuron" not in last
        kf = np.asarray(
            fused["params"][f"SeqConv_{n}"]["Conv_0"]["kernel"]
        )
        np.testing.assert_allclose(
            last["weight"][()], np.transpose(kf, (3, 2, 0, 1)), rtol=1e-6
        )
        assert last["weight"].shape[0] == CFG.num_embeddings
        assert list(layers.attrs["skip"]) == [n, 1]


def test_encoder_netx(tmp_path):
    cfg = VQVAEConfig(num_steps=3, embedding_dim=4, num_embeddings=8,
                      enc_channels=(4, 8), dec_channels=(8, 4))
    model = SNNVQVAE(cfg, backend="scan")
    key = jax.random.PRNGKey(1)
    img = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, img, train=True))(key)
    path = str(tmp_path / "encoder.net")
    lava_export.encoder_to_netx(variables, cfg, path)
    with h5py.File(path, "r") as f:
        layers = f["layer"]
        assert bytes(layers["0/type"][()]) == b"input"
        assert list(layers["0/shape"][()]) == [28, 28, 1]
        # strides 2,2,1 and the 1x1 third conv (vae_model.py:101-129)
        assert list(layers["1/stride"][()]) == [2, 2]
        assert list(layers["2/stride"][()]) == [2, 2]
        assert list(layers["3/stride"][()]) == [1, 1]
        assert layers["3/weight"].shape[2:] == (1, 1)
        assert list(layers["3/shape"][()]) == [7, 7, 4]
        for i in ("1", "2", "3"):
            assert bytes(layers[i]["neuron/type"][()]) == b"CUBA"
