"""bf16 compute path: spikes stay exact, outputs finite and fp32."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser


def test_vqvae_bf16_inference():
    cfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                      enc_channels=(4, 8), dec_channels=(8, 4))
    m32 = SNNVQVAE(cfg, backend="scan")
    m16 = SNNVQVAE(cfg, backend="scan", dtype=jnp.bfloat16)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 28, 28, 1)) - 0.5
    variables = jax.jit(lambda k, x: m32.init(k, x, train=True))(
        jax.random.PRNGKey(1), img
    )
    out32 = jax.jit(lambda v, x: m32.apply(v, x, train=False))(variables, img)
    out16 = jax.jit(lambda v, x: m16.apply(v, x, train=False))(variables, img)
    # same params work under both dtypes; outputs fp32, close, finite
    assert out16["recon"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out16["recon"])).all()
    # spikes are exact 0/1 in both
    assert set(np.unique(np.asarray(out16["spikes"]))) <= {0.0, 1.0}
    # recon agreement loose (bf16 conv accumulation differs)
    diff = np.abs(np.asarray(out16["recon"]) - np.asarray(out32["recon"])).mean()
    assert diff < 0.1, diff


def test_denoiser_bf16_logits_fp32():
    cfg = DiffusionConfig(num_embeddings=8, mask_id=8, num_steps=2,
                          denoiser_channels=(4, 4, 4, 4, 4))
    d = SpikingDenoiser(cfg, backend="scan", dtype=jnp.bfloat16)
    x = jnp.zeros((2, 7, 7), jnp.int32)
    t = jnp.ones((2,), jnp.int32)
    variables = jax.jit(lambda k: d.init(k, x, t, train=True))(
        jax.random.PRNGKey(0)
    )
    logits = jax.jit(lambda v: d.apply(v, x, t, train=False))(variables)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_bf16_finite_and_close_to_fp32():
    """bf16 activations train: loss finite and near the fp32 loss; spike
    stacks stay bf16 end-to-end (the unrolled-LIF primal is NOT upcast)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spiking_diffusion_tpu.config import VQVAEConfig
    from spiking_diffusion_tpu.models import SNNVQVAE
    from spiking_diffusion_tpu.train import (
        create_train_state,
        make_train_step_vqvae,
    )

    cfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                      enc_channels=(4, 8), dec_channels=(8, 4))
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (8, 28, 28, 1), jnp.float32) - 0.5
    losses = {}
    for name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        model = SNNVQVAE(cfg, backend="unroll", dtype=dtype)
        variables = model.init(key, images[:2], train=True)
        state = create_train_state(model, variables)
        step = make_train_step_vqvae(data_variance=0.1, donate=False)
        _, metrics = jax.jit(step)(state, images)
        losses[name] = float(metrics["loss"])
    assert np.isfinite(losses["bf16"])
    assert abs(losses["bf16"] - losses["fp32"]) < 0.05 * abs(losses["fp32"])


def test_cli_accepts_bf16_flag():
    from spiking_diffusion_tpu import cli

    args = cli.parse_args(["--bf16"])
    assert args.bf16 is True
    assert cli.parse_args([]).bf16 is False
