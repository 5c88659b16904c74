"""TemporalWiseAttention / MultiDimensionalAttention + netlist export."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.models.attention import (
    MultiDimensionalAttention,
    TemporalWiseAttention,
)
from spiking_diffusion_tpu.models.deploy import export_netlist, import_netlist


def test_temporal_attention_shapes_and_gating():
    m = TemporalWiseAttention(reduction=4)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 2, 4, 4, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    # gates in (0,1): |y| <= |x|
    assert np.all(np.asarray(jnp.abs(y)) <= np.asarray(jnp.abs(x)) + 1e-6)
    # also works on (T, N, F) inputs
    x2 = jnp.asarray(np.random.RandomState(1).rand(8, 2, 5).astype(np.float32))
    m2 = TemporalWiseAttention(reduction=4)
    v2 = m2.init(jax.random.PRNGKey(0), x2)
    assert m2.apply(v2, x2).shape == x2.shape


def test_multidim_attention():
    m = MultiDimensionalAttention(reduction_t=4, reduction_c=2)
    x = jnp.asarray(np.random.RandomState(2).rand(8, 2, 6, 6, 4).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert np.all(np.asarray(jnp.abs(y)) <= np.asarray(jnp.abs(x)) + 1e-6)


def test_netlist_roundtrip(tmp_path):
    from spiking_diffusion_tpu.config import VQVAEConfig
    from spiking_diffusion_tpu.models import SNNVQVAE

    cfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                      enc_channels=(4, 8), dec_channels=(8, 4))
    model = SNNVQVAE(cfg, backend="scan")
    img = jnp.zeros((1, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), img, train=True)

    base = str(tmp_path / "net")
    jp, npzp = export_netlist(dict(variables), base, meta={"model": "snn-vq-vae"})
    import json, os

    assert os.path.exists(jp) and os.path.exists(npzp)
    manifest = json.load(open(jp))
    assert manifest["neuron"]["model"] == "LIF"
    assert manifest["neuron"]["tau"] == 2.0
    assert manifest["meta"]["model"] == "snn-vq-vae"

    restored, manifest2 = import_netlist(base)
    # params/batch_stats leaves roundtrip exactly (transient collections
    # like 'syops' are intentionally not exported)
    persistent = {k: variables[k] for k in ("params", "batch_stats")}
    for a, b in zip(
        jax.tree.leaves(persistent), jax.tree.leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored variables run the model
    out = model.apply(restored, img, train=False)
    assert out["recon"].shape == (1, 28, 28, 1)
