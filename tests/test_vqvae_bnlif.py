"""SNNVQVAE backend='bnlif' (fused BN-apply+LIF in Encoder/Decoder/ASG)
parity against the scan backend — same outputs, same running-stat updates,
same gradients (stage-1 version of tests/test_denoiser_bnlif.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.ops import bn_lif

bn_lif._INTERPRET = True  # CPU

CFG = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                  enc_channels=(4, 8), dec_channels=(8, 4))


def _setup():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (4, 28, 28, 1)) - 0.5
    ref = SNNVQVAE(CFG, backend="scan")
    variables = jax.jit(lambda k, x: ref.init(k, x, train=True))(key, img)
    # nudge BN params off identity so the affine fold matters
    variables = jax.device_get(variables)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, variables["params"]
    )
    return img, {**variables, "params": params}


def test_vqvae_bnlif_forward_matches_scan_train():
    img, variables = _setup()
    ref = SNNVQVAE(CFG, backend="scan")
    fus = SNNVQVAE(CFG, backend="bnlif")
    outr, sr = jax.jit(
        lambda v, x: ref.apply(v, x, train=True, data_variance=0.1,
                               mutable=["batch_stats"])
    )(variables, img)
    outf, sf = jax.jit(
        lambda v, x: fus.apply(v, x, train=True, data_variance=0.1,
                               mutable=["batch_stats"])
    )(variables, img)
    for k in ("vq_loss", "recon_loss", "real_recon_loss"):
        np.testing.assert_allclose(
            float(outr[k]), float(outf[k]), rtol=1e-4, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(outf["recon"]), np.asarray(outr["recon"]),
        rtol=1e-4, atol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(sr), jax.tree.leaves(sf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_vqvae_bnlif_eval_and_decode_match():
    img, variables = _setup()
    ref = SNNVQVAE(CFG, backend="scan")
    fus = SNNVQVAE(CFG, backend="bnlif")
    outr = jax.jit(lambda v, x: ref.apply(v, x, train=False))(variables, img)
    outf = jax.jit(lambda v, x: fus.apply(v, x, train=False))(variables, img)
    np.testing.assert_array_equal(
        np.asarray(outr["indices"]), np.asarray(outf["indices"])
    )
    np.testing.assert_allclose(
        np.asarray(outf["recon"]), np.asarray(outr["recon"]),
        rtol=1e-4, atol=1e-4,
    )
    idx = jnp.asarray(outr["indices"]).reshape(4, 7, 7)
    dr = jax.jit(
        lambda v, i: ref.apply(v, i, method="decode_indices")
    )(variables, idx)
    df = jax.jit(
        lambda v, i: fus.apply(v, i, method="decode_indices")
    )(variables, idx)
    np.testing.assert_allclose(
        np.asarray(df), np.asarray(dr), rtol=1e-4, atol=1e-4
    )


def test_vqvae_bnlif_grads_match_scan():
    img, variables = _setup()
    ref = SNNVQVAE(CFG, backend="scan")
    fus = SNNVQVAE(CFG, backend="bnlif")

    def loss_fn(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                img, train=True, data_variance=0.1,
                mutable=["batch_stats"],
            )
            return out["vq_loss"] + out["recon_loss"]

        return f

    gr = jax.jit(jax.grad(loss_fn(ref)))(variables["params"])
    gf = jax.jit(jax.grad(loss_fn(fus)))(variables["params"])
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
