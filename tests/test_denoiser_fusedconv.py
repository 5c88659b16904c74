"""SpikingDenoiser backend='bnlifconv' (Pallas training conv + fused
BN-apply+LIF) parity.

The fully fused path — every 3x3 conv through ops/spike_conv with
in-kernel BN moments, normalization+LIF through ops/bn_lif — must
reproduce the layerwise denoiser: same logits, same running-stat
updates, same parameter gradients, and a checkpoint tree byte-identical
to the unfused backends (the conv params live under the same ``Conv_0``
scope via models.layers._ConvParams).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import SpikingDenoiser
from spiking_diffusion_tpu.ops import bn_lif, spike_conv

bn_lif._INTERPRET = True  # CPU
spike_conv._INTERPRET = True

CFG = DiffusionConfig(
    num_timesteps=8, denoiser_channels=(6, 10), num_embeddings=12,
    mask_id=12, num_steps=4,
)


def _setup():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (4, 7, 7), 0, CFG.num_embeddings, jnp.int32)
    t = jnp.asarray([1, 3, 5, 7], jnp.int32)
    ref = SpikingDenoiser(CFG, backend="scan")
    variables = jax.jit(
        lambda k, x, t: ref.init(k, x, t, train=True)
    )(key, x, t)
    variables = jax.device_get(variables)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, variables["params"]
    )
    variables = {**variables, "params": params}
    return x, t, variables


def test_checkpoint_tree_identical():
    x, t, _ = _setup()
    key = jax.random.PRNGKey(7)
    ref = SpikingDenoiser(CFG, backend="scan")
    fus = SpikingDenoiser(CFG, backend="bnlifconv")
    vr = jax.jit(lambda k: ref.init(k, x, t, train=True))(key)
    vf = jax.jit(lambda k: fus.init(k, x, t, train=True))(key)
    # the checkpoint tree is params + batch_stats (the sown 'syops'
    # counters are transient diagnostics and differ by fusion boundary)
    vr = {c: vr[c] for c in ("params", "batch_stats")}
    vf = {c: vf[c] for c in ("params", "batch_stats")}
    pr = jax.tree_util.tree_leaves_with_path(vr)
    pf = {tuple(str(k) for k in p): v
          for p, v in jax.tree_util.tree_leaves_with_path(vf)}
    assert len(pr) == len(pf)
    for path, a in pr:
        b = pf[tuple(str(k) for k in path)]
        assert a.shape == b.shape and a.dtype == b.dtype, path
        # identical RNG consumption order -> identical init values
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_forward_matches_layerwise_train():
    x, t, variables = _setup()
    ref = SpikingDenoiser(CFG, backend="scan")
    fus = SpikingDenoiser(CFG, backend="bnlifconv")
    yr, sr = jax.jit(
        lambda v, x, t: ref.apply(v, x, t, train=True,
                                  mutable=["batch_stats"])
    )(variables, x, t)
    yf, sf = jax.jit(
        lambda v, x, t: fus.apply(v, x, t, train=True,
                                  mutable=["batch_stats"])
    )(variables, x, t)
    np.testing.assert_allclose(
        np.asarray(yf), np.asarray(yr), rtol=1e-4, atol=1e-4
    )
    # running-stat updates: stats now come from in-kernel sums (different
    # reduction order than jnp.mean) — tight float32 tolerance
    ra, rb = jax.tree_util.tree_leaves(sr), jax.tree_util.tree_leaves(sf)
    for a, b in zip(ra, rb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_forward_matches_layerwise_eval():
    x, t, variables = _setup()
    ref = SpikingDenoiser(CFG, backend="scan")
    fus = SpikingDenoiser(CFG, backend="bnlifconv")
    yr = jax.jit(
        lambda v, x, t: ref.apply(v, x, t, train=False)
    )(variables, x, t)
    yf = jax.jit(
        lambda v, x, t: fus.apply(v, x, t, train=False)
    )(variables, x, t)
    np.testing.assert_allclose(
        np.asarray(yf), np.asarray(yr), rtol=1e-4, atol=1e-4
    )


def test_grads_match_layerwise():
    x, t, variables = _setup()
    ref = SpikingDenoiser(CFG, backend="scan")
    fus = SpikingDenoiser(CFG, backend="bnlifconv")

    def loss(model):
        def f(params):
            y, _ = model.apply(
                {**variables, "params": params}, x, t, train=True,
                mutable=["batch_stats"],
            )
            w = jnp.sin(jnp.arange(y.size, dtype=jnp.float32))
            return jnp.sum(y.reshape(-1) * w) / y.size
        return f

    gr = jax.jit(jax.grad(loss(ref)))(variables["params"])
    gf = jax.jit(jax.grad(loss(fus)))(variables["params"])
    flat_r = jax.tree_util.tree_leaves_with_path(gr)
    flat_f = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_leaves_with_path(gf)}
    assert len(flat_r) == len(flat_f)
    for path, a in flat_r:
        b = flat_f[tuple(str(k) for k in path)]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=str(path),
        )


def test_bf16_runs_and_tracks_fp32():
    x, t, variables = _setup()
    fus16 = SpikingDenoiser(CFG, backend="bnlifconv", dtype=jnp.bfloat16)
    fus32 = SpikingDenoiser(CFG, backend="bnlifconv")
    y16, _ = jax.jit(
        lambda v, x, t: fus16.apply(v, x, t, train=True,
                                    mutable=["batch_stats"])
    )(variables, x, t)
    y32, _ = jax.jit(
        lambda v, x, t: fus32.apply(v, x, t, train=True,
                                    mutable=["batch_stats"])
    )(variables, x, t)
    assert y16.dtype == jnp.float32
    assert np.isfinite(np.asarray(y16)).all()
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32), rtol=0.1, atol=0.15
    )
