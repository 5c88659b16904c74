"""Step-aware layer tests: shapes, BN-over-(T*N) semantics, torch geometry.

Parity targets: spikingjelly ``layer.py`` multi-step wrappers and the
encoder/decoder geometry of ``snn_model/vae_model.py`` (28->14->7->7 and
back).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.models.layers import (
    LIF,
    SeqBatchNorm,
    SeqConv,
    SeqConvTranspose,
)


def _init_apply(mod, x, **kw):
    variables = mod.init(jax.random.PRNGKey(0), x, **kw)
    return variables, mod.apply(variables, x, **kw)


def test_seqconv_stride2_shape():
    x = jnp.zeros((2, 3, 28, 28, 1))
    _, y = _init_apply(SeqConv(32, kernel_size=3, strides=2, padding=1), x)
    assert y.shape == (2, 3, 14, 14, 32)


def test_seqconv_chain_matches_reference_geometry():
    # encoder geometry: 28 -(k3,s2,p1)-> 14 -(k3,s2,p1)-> 7 -(k1,s1)-> 7
    x = jnp.zeros((1, 2, 28, 28, 1))
    _, y1 = _init_apply(SeqConv(8, 3, 2, 1), x)
    _, y2 = _init_apply(SeqConv(8, 3, 2, 1), y1)
    _, y3 = _init_apply(SeqConv(4, 1, 1, 0), y2)
    assert y1.shape[2:4] == (14, 14)
    assert y2.shape[2:4] == (7, 7)
    assert y3.shape == (1, 2, 7, 7, 4)


def test_seqconvtranspose_matches_torch_output_size():
    # torch: (H-1)*s - 2p + k + op
    x = jnp.zeros((1, 2, 7, 7, 4))
    _, y = _init_apply(
        SeqConvTranspose(8, kernel_size=3, strides=2, padding=1, output_padding=1), x
    )
    assert y.shape == (1, 2, 14, 14, 8)
    _, y2 = _init_apply(
        SeqConvTranspose(8, kernel_size=3, strides=2, padding=1, output_padding=1), y
    )
    assert y2.shape == (1, 2, 28, 28, 8)
    _, y3 = _init_apply(
        SeqConvTranspose(1, kernel_size=3, strides=1, padding=1), y2
    )
    assert y3.shape == (1, 2, 28, 28, 1)


def test_batchnorm_stats_over_time_and_batch_jointly():
    # The reference's BN in 'm' mode computes statistics over T*N jointly
    # (``layer.py:459-466``). Craft data where per-(t) stats differ from
    # joint stats to detect the difference.
    rng = np.random.RandomState(0)
    x = rng.rand(4, 3, 2, 2, 5).astype(np.float32)
    x[0] += 10.0  # time step 0 has a very different mean
    xj = jnp.asarray(x)
    bn = SeqBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), xj)
    y, _ = bn.apply(variables, xj, mutable=["batch_stats"])
    y = np.asarray(y)
    # normalized over T*N*H*W per channel: global mean ~0, var ~1
    flat = y.reshape(-1, 5)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=1e-2)
    # but per-timestep means differ (stats were NOT per-step)
    assert abs(y[0].mean() - y[1].mean()) > 0.5


def test_batchnorm_running_average_update():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 4, 2, 2, 3).astype(np.float32))
    bn = SeqBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), x)
    _, mutated = bn.apply(variables, x, mutable=["batch_stats"])
    new_mean = np.asarray(jax.tree.leaves(mutated["batch_stats"])[0])
    assert not np.allclose(new_mean, 0.0)  # moved toward batch mean


def test_lif_module_binary_output():
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 3, (4, 2, 3, 3, 2)).astype(np.float32))
    lif = LIF(backend="scan")
    variables = lif.init(jax.random.PRNGKey(0), x)
    y = lif.apply(variables, x)
    vals = set(np.unique(np.asarray(y)))
    assert vals <= {0.0, 1.0}
    assert y.shape == x.shape


def test_batchnorm_standin_bitexact_vs_flax():
    """models.layers.BatchNorm (the affine-capable stand-in) must be
    bit-identical to flax.linen.BatchNorm — outputs AND updated running
    stats, fp32 and bf16, train and eval — so swapping it under
    SeqBatchNorm changes nothing for existing checkpoints."""
    import flax.linen as fnn

    from spiking_diffusion_tpu.models.layers import BatchNorm

    k = jax.random.PRNGKey(0)
    x32 = jax.random.normal(k, (24, 5, 5, 7), jnp.float32) * 3.0 + 0.5
    for dtype, x in ((None, x32), (jnp.bfloat16, x32.astype(jnp.bfloat16))):
        mine = BatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-5, dtype=dtype)
        ref = fnn.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=dtype)
        vm = mine.init(k, x)
        vr = ref.init(k, x)
        # same variable layout
        assert jax.tree_util.tree_structure(vm) == \
            jax.tree_util.tree_structure(vr)
        # nudge params off their init so scale/bias actually matter
        vm = jax.tree_util.tree_map(lambda a: a + 0.25, vm)
        vr = jax.tree_util.tree_map(lambda a: a + 0.25, vr)
        ym, sm = mine.apply(vm, x, mutable=["batch_stats"])
        yr, sr = ref.apply(vr, x, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(ym), np.asarray(yr))
        for key in ("mean", "var"):
            np.testing.assert_array_equal(
                np.asarray(sm["batch_stats"][key]),
                np.asarray(sr["batch_stats"][key]),
            )
        # eval mode: running stats path
        mine_e = BatchNorm(use_running_average=True, epsilon=1e-5,
                           dtype=dtype)
        ref_e = fnn.BatchNorm(use_running_average=True, epsilon=1e-5,
                              dtype=dtype)
        ym_e = mine_e.apply(
            {"params": vm["params"], "batch_stats": sm["batch_stats"]}, x
        )
        yr_e = ref_e.apply(
            {"params": vr["params"], "batch_stats": sr["batch_stats"]}, x
        )
        np.testing.assert_array_equal(np.asarray(ym_e), np.asarray(yr_e))


def test_seq_batchnorm_return_affine_consistent():
    """The folded (scale, shift) pair reproduces the normalized output:
    x*scale + shift == SeqBatchNorm(x) (fp32, same stats)."""
    from spiking_diffusion_tpu.models.layers import SeqBatchNorm

    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (4, 6, 3, 3, 5), jnp.float32) * 2.0
    bn = SeqBatchNorm(use_running_average=False)
    v = bn.init(k, x)
    v = jax.tree_util.tree_map(lambda a: a + 0.3, v)
    y, s1 = bn.apply(v, x, mutable=["batch_stats", "syops"])
    (sc, sh), s2 = bn.apply(
        v, x, return_affine=True, mutable=["batch_stats", "syops"]
    )
    np.testing.assert_allclose(
        np.asarray(x * sc + sh), np.asarray(y), rtol=1e-5, atol=1e-6
    )
    # identical running-stat updates either way
    for key in ("mean", "var"):
        np.testing.assert_array_equal(
            np.asarray(s1["batch_stats"]["BatchNorm_0"][key]),
            np.asarray(s2["batch_stats"]["BatchNorm_0"][key]),
        )
