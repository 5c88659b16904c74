"""InceptionV3 port shape/consistency tests + spike bitpack roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spiking_diffusion_tpu.ops.bitpack import pack_spikes, unpack_spikes


def test_bitpack_roundtrip():
    rng = np.random.RandomState(0)
    s = (rng.rand(3, 5, 7) < 0.3).astype(np.float32)
    packed, shape = pack_spikes(jnp.asarray(s))
    assert packed.dtype == jnp.uint8
    assert packed.size == -(-s.size // 8)
    out = unpack_spikes(packed, shape)
    np.testing.assert_array_equal(np.asarray(out), s)


def test_bitpack_exact_byte_boundary():
    s = np.ones((2, 8), np.float32)
    packed, shape = pack_spikes(jnp.asarray(s))
    assert packed.size == 2
    np.testing.assert_array_equal(np.asarray(packed), [255, 255])
    np.testing.assert_array_equal(np.asarray(unpack_spikes(packed, shape)), s)


def test_bitpack_memory_saving():
    s = jnp.zeros((16, 32, 7, 7, 16))
    packed, _ = pack_spikes(s)
    assert packed.size * 8 >= s.size
    assert packed.size <= s.size // 8 + 1


@pytest.fixture(scope="module")
def inception():
    from spiking_diffusion_tpu.metrics.inception import InceptionV3

    model = InceptionV3(num_classes=1000)
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_inception_shapes(inception):
    model, variables = inception
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 299, 299, 3))
    feats, logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, x)
    assert feats.shape == (2, 2048)  # Mixed_7c pooled, FID feature dim
    assert logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(feats)).all()


def test_inception_param_count(inception):
    # torchvision inception_v3 (no aux logits): ~24-27M params
    _, variables = inception
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 23e6 < n < 28e6, n


def test_resize_for_inception():
    from spiking_diffusion_tpu.metrics.inception import resize_for_inception

    x = np.random.RandomState(0).rand(2, 28, 28, 1).astype(np.float32)
    y = resize_for_inception(x)
    assert y.shape == (2, 299, 299, 3)
    # channel-repeated
    np.testing.assert_allclose(
        np.asarray(y[..., 0]), np.asarray(y[..., 1]), rtol=1e-6
    )


def test_resize_antialias_mode():
    from spiking_diffusion_tpu.metrics.inception import resize_for_inception

    x = np.random.RandomState(1).rand(1, 28, 28, 1).astype(np.float32)
    y = resize_for_inception(x, antialias=True)
    assert y.shape == (1, 299, 299, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_weight_converter_naming():
    from spiking_diffusion_tpu.metrics.inception import (
        convert_torchvision_state_dict,
    )

    fake_sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3)),
        "Conv2d_1a_3x3.bn.weight": np.zeros(32),
        "Conv2d_1a_3x3.bn.bias": np.zeros(32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros(32),
        "Conv2d_1a_3x3.bn.running_var": np.ones(32),
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros(()),
        "fc.weight": np.zeros((1000, 2048)),
        "fc.bias": np.zeros(1000),
        "AuxLogits.conv0.conv.weight": np.zeros((128, 768, 1, 1)),
    }
    out = convert_torchvision_state_dict(fake_sd)
    assert out["Conv2d_1a_3x3/conv/kernel"].shape == (3, 3, 3, 32)
    assert out["fc/kernel"].shape == (2048, 1000)
    assert "Conv2d_1a_3x3/bn/mean" in out
    assert not any("num_batches" in k for k in out)
    assert not any("AuxLogits" in k for k in out)
