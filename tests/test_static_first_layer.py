"""The static-first-layer optimization must be a pure no-op numerically:
direct-coded inputs repeat across T, so Conv+BN on a length-1 time axis
broadcast to T equals Conv+BN on the full repeated train — including the
BN batch statistics (mean/var over T*N of repeats == over N)."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models.layers import SeqBatchNorm, SeqConv
from spiking_diffusion_tpu.models.vqvae import Encoder

T, N = 6, 4


def test_conv_bn_on_length1_axis_equals_full_repeat():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 10, 10, 3))
    x_rep = jnp.broadcast_to(x[None], (T,) + x.shape)

    class Block(SeqConv):
        pass

    conv = SeqConv(8, kernel_size=3, strides=1, padding=1)
    bn = SeqBatchNorm(use_running_average=False)
    cv = conv.init(jax.random.PRNGKey(1), x_rep)

    y_full = conv.apply(cv, x_rep)
    y_one = conv.apply(cv, x_rep[:1])
    bv = bn.init(jax.random.PRNGKey(2), y_full)

    out_full, mut_full = bn.apply(bv, y_full, mutable=["batch_stats"])
    out_one, mut_one = bn.apply(bv, y_one, mutable=["batch_stats"])
    out_bcast = jnp.broadcast_to(out_one, (T,) + out_one.shape[1:])

    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_bcast), rtol=1e-5, atol=1e-6
    )
    # running-statistics update must agree too
    for leaf_f, leaf_o in zip(
        jax.tree.leaves(mut_full["batch_stats"]),
        jax.tree.leaves(mut_one["batch_stats"]),
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_o), rtol=1e-5, atol=1e-6
        )


def test_encoder_first_replicated_flag_is_noop():
    cfg = VQVAEConfig(num_steps=T, embedding_dim=4, num_embeddings=8,
                      enc_channels=(8, 16))
    enc = Encoder(cfg, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(3), (N, 28, 28, 1)) - 0.5
    x_rep = jnp.broadcast_to(img[None], (T,) + img.shape)
    variables = enc.init(jax.random.PRNGKey(4), x_rep, train=True)

    out_slow, mut_slow = enc.apply(
        variables, x_rep, train=True, first_replicated=False,
        mutable=["batch_stats"],
    )
    out_fast, mut_fast = enc.apply(
        variables, x_rep, train=True, first_replicated=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_slow), np.asarray(out_fast), atol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(mut_slow["batch_stats"]),
        jax.tree.leaves(mut_fast["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # eval path too
    e_slow = enc.apply(variables, x_rep, train=False)
    e_fast = enc.apply(variables, x_rep, train=False, first_replicated=True)
    np.testing.assert_array_equal(np.asarray(e_slow), np.asarray(e_fast))
