"""Vector-quantizer unit tests: argmin lookup, STE, readout blend.

Parity targets: ``snn_model/vae_model.py:22-99``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models.vqvae import VectorQuantizer

CFG = VQVAEConfig(num_steps=4, embedding_dim=4, num_embeddings=8, latent_size=3)


def _make_vq():
    vq = VectorQuantizer(CFG, backend="scan")
    z = jnp.zeros((CFG.num_steps, 2, 3, 3, CFG.embedding_dim))
    variables = vq.init(jax.random.PRNGKey(0), z, train=True)
    return vq, variables


def test_code_indices_nearest_neighbor():
    vq, variables = _make_vq()
    emb = np.asarray(variables["params"]["embeddings"])
    rng = np.random.RandomState(0)
    flat = rng.randn(10, CFG.embedding_dim).astype(np.float32)
    idx = vq.apply(variables, jnp.asarray(flat), method="get_code_indices")
    # brute-force nearest
    d = ((flat[:, None, :] - emb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))


def test_quantize_lookup():
    vq, variables = _make_vq()
    emb = np.asarray(variables["params"]["embeddings"])
    idx = jnp.asarray([0, 3, 7])
    q = np.asarray(vq.apply(variables, idx, method="quantize"))
    np.testing.assert_allclose(q, emb[[0, 3, 7]])


def test_readout_blend_alpha():
    vq, variables = _make_vq()
    # with spikes all ones: memout = sum(0.8^(T-1-t)) , rate = 1
    z = jnp.ones((CFG.num_steps, 1, 1, 1, CFG.embedding_dim))
    out = vq.apply(variables, z, method="readout")
    alpha = float(variables["params"]["alpha"])
    memout = sum(0.8 ** (CFG.num_steps - 1 - t) for t in range(CFG.num_steps))
    expected = (1 - alpha) * memout + alpha * 1.0
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
    assert alpha == 0.5  # init parity (``vae_model.py:31``)


def test_train_call_returns_spikes_and_loss():
    vq, variables = _make_vq()
    z = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (CFG.num_steps, 2, 3, 3, CFG.embedding_dim)
    ).astype(jnp.float32)
    (spikes, loss), _ = vq.apply(
        variables, z, train=True, mutable=["batch_stats"]
    )
    assert spikes.shape == z.shape
    assert set(np.unique(np.asarray(spikes))) <= {0.0, 1.0}
    assert np.isfinite(float(loss))


def test_eval_call_returns_indices():
    vq, variables = _make_vq()
    z = jnp.zeros((CFG.num_steps, 2, 3, 3, CFG.embedding_dim))
    spikes, idx = vq.apply(variables, z, train=False)
    assert idx.shape == (2 * 3 * 3,)
    assert spikes.shape == z.shape


def test_straight_through_gradient():
    # gradient w.r.t. encoder output must pass through the quantization
    vq, variables = _make_vq()

    def loss_fn(z):
        (spikes, vq_loss), _ = vq.apply(
            variables, z, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(spikes) + vq_loss

    z = jax.random.uniform(
        jax.random.PRNGKey(2), (CFG.num_steps, 1, 3, 3, CFG.embedding_dim)
    )
    g = jax.grad(loss_fn)(z)
    assert np.abs(np.asarray(g)).sum() > 0  # grads flow to the encoder side


def test_codebook_receives_gradient_via_q_latent_loss():
    vq, variables = _make_vq()
    z = jax.random.uniform(
        jax.random.PRNGKey(3), (CFG.num_steps, 1, 3, 3, CFG.embedding_dim)
    )

    def loss_fn(params):
        (spikes, vq_loss), _ = vq.apply(
            {**variables, "params": params}, z, train=True,
            mutable=["batch_stats"],
        )
        return vq_loss

    g = jax.grad(loss_fn)(variables["params"])
    assert np.abs(np.asarray(g["embeddings"])).sum() > 0


def test_psp_loss_restructuring_matches_naive_form():
    """The single-pass PSP commitment loss must equal the reference's
    two-PSP-train formulation (``vae_model.py:81-83``) in value AND in
    gradients toward both the spike train and the encoder output."""
    from spiking_diffusion_tpu.snn.temporal import psp

    sg = jax.lax.stop_gradient
    beta = CFG.commitment_cost
    tau = CFG.psp_tau_s
    rng = np.random.RandomState(7)
    spikes = jnp.asarray(
        (rng.rand(CFG.num_steps, 2, 3, 3, CFG.embedding_dim) < 0.4)
        .astype(np.float32))
    z = jnp.asarray(
        (rng.rand(CFG.num_steps, 2, 3, 3, CFG.embedding_dim) < 0.3)
        .astype(np.float32))

    def naive(spikes, z):
        pq, pz = psp(spikes, tau), psp(z, tau)
        return jnp.mean((pq - sg(pz)) ** 2) + beta * jnp.mean(
            (sg(pq) - pz) ** 2)

    def restructured(spikes, z):
        d = spikes - (beta * z + (1.0 - beta) * sg(z))
        v = jnp.mean(psp(d, tau) ** 2)
        return v + sg(beta * v)

    v1, (gs1, gz1) = jax.value_and_grad(naive, argnums=(0, 1))(spikes, z)
    v2, (gs2, gz2) = jax.value_and_grad(restructured, argnums=(0, 1))(spikes, z)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz2), atol=1e-7)


def test_usage_uniformity_loss():
    # the working version of the reference's 'snn-vq-vae-uni' intent:
    # enabling the regularizer increases the loss when codebook usage is
    # collapsed and its gradient pushes toward uniform usage
    import jax

    cfg_uni = VQVAEConfig(num_steps=4, embedding_dim=4, num_embeddings=8,
                          latent_size=3, usage_loss_weight=1.0)
    vq_uni = VectorQuantizer(cfg_uni, backend="scan")
    z = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.3, (4, 2, 3, 3, 4)
    ).astype(jnp.float32)
    variables = vq_uni.init(jax.random.PRNGKey(0), z, train=True)
    (_, loss_uni), _ = vq_uni.apply(variables, z, train=True,
                                    mutable=["batch_stats"])

    vq_plain = VectorQuantizer(CFG, backend="scan")
    # same params apply (identical structure)
    (_, loss_plain), _ = vq_plain.apply(variables, z, train=True,
                                        mutable=["batch_stats"])
    assert float(loss_uni) > float(loss_plain)
    # gradient reaches the codebook through the usage term
    def f(params):
        (_, l), _ = vq_uni.apply({**variables, "params": params}, z,
                                 train=True, mutable=["batch_stats"])
        return l
    g = jax.grad(f)(variables["params"])
    assert float(jnp.abs(g["embeddings"]).sum()) > 0
