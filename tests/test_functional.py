"""functional utilities (conv-BN fusion, TET, delay), quantize ops, and
the extra neuron families (QIF/EIF/Izhikevich)."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn import (
    eif_scan,
    functional as F,
    izhikevich_scan,
    qif_scan,
    quantize as Q,
)


def test_fuse_conv_bn_math():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    scale = jnp.asarray(rng.rand(4).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    mean = jnp.asarray(rng.randn(4).astype(np.float32))
    var = jnp.asarray(rng.rand(4).astype(np.float32) + 0.1)

    kf, bf = F.fuse_conv_bn(k, b, scale, bias, mean, var)

    x = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))

    def conv(x, kern, bn):
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bn
        return y

    y_ref = conv(x, k, b)
    y_ref = (y_ref - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    y_fused = conv(x, kf, bf)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )


def test_fuse_model_conv_bn_inference_equivalence():
    from spiking_diffusion_tpu.config import VQVAEConfig
    from spiking_diffusion_tpu.models import SNNVQVAE

    cfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                      enc_channels=(4, 8), dec_channels=(8, 4))
    model = SNNVQVAE(cfg, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(1), img, train=True)
    # make batch_stats non-trivial: run a few train steps
    for i in range(3):
        _, mut = model.apply(variables, img, train=True, mutable=["batch_stats"])
        variables = {**variables, "batch_stats": mut["batch_stats"]}

    fused = F.fuse_model_conv_bn(variables)
    out_ref = model.apply(variables, img, train=False)
    out_fused = model.apply(fused, img, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fused["recon"]), np.asarray(out_ref["recon"]),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused["indices"]), np.asarray(out_ref["indices"])
    )


def test_tet_loss():
    logits_seq = jnp.zeros((4, 2, 3))
    labels = jnp.array([0, 1])
    loss = F.temporal_efficient_loss(logits_seq, labels)
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)


def test_delay():
    x = jnp.arange(12.0).reshape(4, 3)
    d = F.delay(x, 2)
    np.testing.assert_array_equal(np.asarray(d[:2]), 0.0)
    np.testing.assert_array_equal(np.asarray(d[2:]), np.asarray(x[:2]))
    np.testing.assert_array_equal(np.asarray(F.delay(x, 0)), np.asarray(x))


def test_quantize_ste():
    x = jnp.linspace(0, 1, 11)
    q = Q.k_bit_quantize(x, 2)
    assert set(np.round(np.unique(np.asarray(q)) * 3).astype(int)) <= {0, 1, 2, 3}
    # STE gradient is identity
    g = jax.grad(lambda v: Q.k_bit_quantize(v, 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)
    # clamp gradient masks outside the window
    gc = jax.grad(lambda v: Q.clamp_ste(v, 0.2, 0.8).sum())(x)
    assert float(gc[0]) == 0.0 and float(gc[5]) == 1.0 and float(gc[-1]) == 0.0


def test_round_ceil_floor_ste():
    x = jnp.array([0.4, 0.6, 1.2])
    np.testing.assert_array_equal(np.asarray(Q.round_ste(x)), [0, 1, 1])
    np.testing.assert_array_equal(np.asarray(Q.ceil_ste(x)), [1, 1, 2])
    np.testing.assert_array_equal(np.asarray(Q.floor_ste(x)), [0, 0, 1])
    for f in (Q.round_ste, Q.ceil_ste, Q.floor_ste):
        g = jax.grad(lambda v: f(v).sum())(x)
        np.testing.assert_allclose(np.asarray(g), 1.0)


def test_qif_eif_izhikevich_scan():
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 2, (6, 3, 4)).astype(np.float32)
    )
    s_q, v_q = qif_scan(x)
    s_e, v_e = eif_scan(x)
    s_i, v_i, w_i = izhikevich_scan(x)
    for s in (s_q, s_e, s_i):
        assert s.shape == x.shape
        assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}
    for v in (v_q, v_e, v_i, w_i):
        assert np.isfinite(np.asarray(v)).all()
    # the three families produce different spike patterns
    assert (np.asarray(s_q) != np.asarray(s_e)).any()
    # gradients flow through all of them
    for fn in (lambda x: qif_scan(x)[0], lambda x: eif_scan(x)[0],
               lambda x: izhikevich_scan(x)[0]):
        g = jax.grad(lambda x: jnp.sum(fn(x) * jnp.arange(1.0, 7.0)[:, None, None]))(x)
        assert np.isfinite(np.asarray(g)).all()


def test_fuse_denoiser_conv_bn_equivalence():
    from spiking_diffusion_tpu.config import DiffusionConfig
    from spiking_diffusion_tpu.models import SpikingDenoiser

    cfg = DiffusionConfig(num_embeddings=8, mask_id=8, num_steps=2,
                          denoiser_channels=(4, 6, 8, 6, 4))
    den = SpikingDenoiser(cfg, backend="scan")
    x = jnp.zeros((2, 7, 7), jnp.int32)
    t = jnp.ones((2,), jnp.int32)
    variables = den.init(jax.random.PRNGKey(0), x, t, train=True)
    for _ in range(3):  # non-trivial running stats
        _, mut = den.apply(variables, x, t, train=True,
                           mutable=["batch_stats"])
        variables = {**variables, "batch_stats": mut["batch_stats"]}

    fused = F.fuse_model_conv_bn(variables)
    ref = den.apply(variables, x, t, train=False)
    out = den.apply(fused, x, t, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)
