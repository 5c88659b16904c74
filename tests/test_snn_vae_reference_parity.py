"""SNN-VAE cross-check against the ACTUAL reference torch modules
(VERDICT #9).

Round 1 redesigned the reference's O(T^2) prefix re-forwarding — which
carries LIF membrane state across prefix calls (``vae_model.py:486-512``,
no reset_net between the no-grad loop and the final full forward) — into a
single causal scan. These tests put that claim on evidence:

1. ``test_prior_eval_path_parity``: the reference prior's eval path
   (``_forward``: ONE full-sequence multi-step forward from fresh state,
   ``vae_model.py:343-362``) is semantically unambiguous — the causal scan
   must match it bit-for-bit on identical weights. It does.
2. ``test_posterior_mlp_clean_parity``: the posterior's 3-layer MLP run
   from fresh state over the full (T, B, 2C) input — the clean semantics
   the scan implements — matches the torch stack on identical weights.
3. ``test_reference_membrane_carryover_is_real``: the documented deviation
   is REAL in the reference: running its posterior's final full forward
   with membranes polluted by the prefix loop (what ``forward`` actually
   does) produces different q_z than from a fresh state. The scan
   implements the fresh-state math (the intended factorization); this
   test records the ablation the deviation note rests on.
"""

import os
import sys
import types

import numpy as np
import pytest

for cand in (os.environ.get("SPIKINGJELLY_PATH"), "/tmp/sj_pkg"):
    if cand and os.path.isdir(cand):
        sys.path.insert(0, cand)

torch = pytest.importorskip("torch")
pytest.importorskip("spikingjelly.activation_based.neuron")

REF = "/root/reference/Spiking-Diffusion-release"
if not os.path.isdir(REF):
    pytest.skip("reference not available", allow_module_level=True)
sys.path.insert(0, REF)

# the reference imports torchvision at module scope; only data loading
# uses it — stub if absent
try:
    import torchvision  # noqa: F401
except ImportError:
    _tv = types.ModuleType("torchvision")
    _tv.datasets = types.ModuleType("torchvision.datasets")
    _tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.datasets"] = _tv.datasets
    sys.modules["torchvision.transforms"] = _tv.transforms

from spikingjelly.activation_based import functional as sj_functional  # noqa: E402

import snn_model.vae_model as ref_vm  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spiking_diffusion_tpu.config import SNNVAEConfig  # noqa: E402
from spiking_diffusion_tpu.models.snn_vae import (  # noqa: E402
    PriorBernoulli,
    _CausalMLP,
)
from spiking_diffusion_tpu.snn.neuron import NeuronParams  # noqa: E402

C, K, T, B = 56, 20, 16, 2  # the reference's fixed constants (c=28*2)


def _copy_linear_weights(torch_seq, jax_params):
    """torch Sequential(Linear,LIF)x3 -> _CausalMLP dense_i params."""
    out = dict(jax_params)
    linears = [m for m in torch_seq if isinstance(m, torch.nn.Linear)]
    mlp = dict(out["mlp"])
    for i, lin in enumerate(linears):
        mlp[f"dense_{i}"] = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }
    out["mlp"] = mlp
    return out


@pytest.fixture(scope="module")
def ref_prior():
    torch.manual_seed(0)
    m = ref_vm.PriorBernoulliSTBP(k=K)
    sj_functional.set_step_mode(m, "m")
    m.eval()
    return m


def test_prior_eval_path_parity(ref_prior):
    """Reference prior eval path (one full-sequence forward from fresh
    state) == our causal scan, bit-for-bit on the same weights."""
    rng = np.random.RandomState(3)
    z = (rng.rand(T, B, C) < 0.3).astype(np.float32)

    sj_functional.reset_net(ref_prior)
    with torch.no_grad():
        p_z_ref = ref_prior(torch.tensor(z), scheduled=False)
    sj_functional.reset_net(ref_prior)

    cfg = SNNVAEConfig()  # latent_dim=56, k=20, num_steps=16
    prior_j = PriorBernoulli(cfg)
    variables = prior_j.init(
        jax.random.PRNGKey(0), jnp.asarray(z), scheduled=False
    )
    params = _copy_linear_weights(ref_prior.layers, variables["params"])
    p_z_j = prior_j.apply({"params": params}, jnp.asarray(z), scheduled=False)

    np.testing.assert_allclose(
        np.asarray(p_z_j), p_z_ref.numpy(), atol=1e-5
    )
    # spike trains: differences would be exactly 1.0 — require exactness
    np.testing.assert_array_equal(np.asarray(p_z_j), p_z_ref.numpy())


@pytest.fixture(scope="module")
def ref_posterior():
    torch.manual_seed(1)
    m = ref_vm.PosteriorBernoulliSTBP(k=K)
    sj_functional.set_step_mode(m, "m")
    m.eval()
    return m


def _run_causal_mlp(torch_seq, inputs_np):
    """Drive our _CausalMLP per-step on (T, B, F) inputs with the torch
    stack's weights; returns the (T, B, C*K) spike outputs."""
    feats = tuple(
        m.out_features for m in torch_seq if isinstance(m, torch.nn.Linear)
    )
    in_feats = tuple(
        m.in_features for m in torch_seq if isinstance(m, torch.nn.Linear)
    )
    mlp = _CausalMLP(features=feats, in_features=in_feats,
                     params_lif=NeuronParams())
    carry0 = tuple(jnp.zeros((B, f), jnp.float32) for f in feats)
    variables = mlp.init(
        jax.random.PRNGKey(0), carry0, jnp.asarray(inputs_np[0])
    )
    params = {"params": _copy_linear_weights(
        torch_seq, {"mlp": variables["params"]})["mlp"]}
    carry = carry0
    outs = []
    step = jax.jit(lambda c, x: mlp.apply(params, c, x))
    for t in range(inputs_np.shape[0]):
        carry, s = step(carry, jnp.asarray(inputs_np[t]))
        outs.append(np.asarray(s))
    return np.stack(outs)


def test_posterior_mlp_clean_parity(ref_posterior):
    """The posterior MLP from FRESH state over the full sequence (the
    semantics the causal scan implements) matches torch exactly."""
    rng = np.random.RandomState(5)
    x = (rng.rand(T, B, C) < 0.4).astype(np.float32)
    z_hist = (rng.rand(T, B, C) < 0.3).astype(np.float32)
    inputs = np.concatenate([x, z_hist], axis=-1)  # (T, B, 2C)

    sj_functional.reset_net(ref_posterior)
    with torch.no_grad():
        q_z_ref = ref_posterior.layers(torch.tensor(inputs))
    sj_functional.reset_net(ref_posterior)

    q_z_j = _run_causal_mlp(ref_posterior.layers, inputs)
    np.testing.assert_array_equal(q_z_j, q_z_ref.numpy())


def test_membrane_carryover_ablation(ref_posterior):
    """Ablation behind the redesign note: the reference's forward leaves
    LIF membranes polluted by the no-grad prefix loop when it runs the
    final full-sequence forward (no reset_net in between,
    ``vae_model.py:486-521``). Measured at realistic (default-init)
    weights the pollution is SUB-THRESHOLD: the polluted q_z equals the
    fresh-state q_z exactly — i.e. the causal scan's fresh-state math
    reproduces the reference's *actual* behavior, not just its intended
    factorization. (Membranes demonstrably persist — mean |v| ~0.1 after
    a call — the leak (tau=2) plus sparse spiking just keeps the carried
    state below every firing decision.)"""
    rng = np.random.RandomState(7)
    x = (rng.rand(T, B, C) < 0.4).astype(np.float32)
    xt = torch.tensor(x)

    torch.manual_seed(11)
    sj_functional.reset_net(ref_posterior)
    with torch.no_grad():
        q_z_polluted = ref_posterior(xt)[1]  # full forward incl. prefix loop

    # membranes really do persist after the forward (the pollution is real,
    # merely sub-threshold)
    from spikingjelly.activation_based import neuron as sj_neuron

    lifs = [m for m in ref_posterior.layers
            if isinstance(m, sj_neuron.LIFNode)]
    assert any(
        torch.is_tensor(l.v) and float(torch.abs(l.v).mean()) > 1e-3
        for l in lifs
    )
    sj_functional.reset_net(ref_posterior)

    # fresh-state recompute of the SAME final full-sequence forward:
    # rebuild z_t_minus exactly as the forward did (same torch seed ->
    # same randint draws), then run layers from reset state
    torch.manual_seed(11)
    with torch.no_grad():
        z_t_minus = ref_posterior.initial_input.repeat(1, B, 1)
        for t in range(T - 1):
            inputs = torch.cat([xt[: t + 1].detach(), z_t_minus.detach()],
                               dim=-1)
            outputs = ref_posterior.layers(inputs)
            q_z_t = outputs[-1]
            ridx = torch.randint(0, K, (B * C,)) + torch.arange(0, B * C * K, K)
            z_t = q_z_t.reshape(B * C * K)[ridx].view(1, B, C)
            z_t_minus = torch.cat([z_t_minus, z_t], dim=0)
        sj_functional.reset_net(ref_posterior)  # <-- the one-line difference
        q_z_clean = ref_posterior.layers(
            torch.cat([xt, z_t_minus], dim=-1)
        ).view(T, B, C, K)
    sj_functional.reset_net(ref_posterior)

    diff = (q_z_polluted != q_z_clean).float().mean().item()
    assert diff == 0.0, (
        "carryover flipped spikes at default init; the redesign note in "
        f"models/snn_vae.py needs updating (disagreement {diff})"
    )


def test_posterior_end_to_end_parity_with_injected_indices(ref_posterior):
    """Full posterior semantics vs the reference's ACTUAL forward: same
    weights, same k-choice indices -> identical sampled z and q_z.

    The reference's per-step prefix forwards (polluted or not — see the
    ablation above, they coincide at this init) feed sampled z_t back; we
    replay its recorded randint draws through the causal-scan semantics
    (one _CausalMLP step per t, z_prev carried) and require exact
    agreement with the torch outputs.
    """
    rng = np.random.RandomState(9)
    x = (rng.rand(T, B, C) < 0.4).astype(np.float32)
    xt = torch.tensor(x)

    # record the reference's index draws by replaying its RNG stream
    torch.manual_seed(23)
    sj_functional.reset_net(ref_posterior)
    with torch.no_grad():
        z_ref, q_z_ref = ref_posterior(xt)
    sj_functional.reset_net(ref_posterior)
    torch.manual_seed(23)
    choices = []
    for _ in range(T):
        ridx = torch.randint(0, K, (B * C,))
        choices.append(ridx.view(B, C).numpy())
    choices = np.stack(choices)  # (T, B, C)

    # causal-scan replay with the same weights and choices
    feats = tuple(m.out_features for m in ref_posterior.layers
                  if isinstance(m, torch.nn.Linear))
    in_feats = tuple(m.in_features for m in ref_posterior.layers
                     if isinstance(m, torch.nn.Linear))
    mlp = _CausalMLP(features=feats, in_features=in_feats,
                     params_lif=NeuronParams())
    carry = tuple(jnp.zeros((B, f), jnp.float32) for f in feats)
    variables = mlp.init(jax.random.PRNGKey(0), carry,
                         jnp.zeros((B, 2 * C), jnp.float32))
    params = {"params": _copy_linear_weights(
        ref_posterior.layers, {"mlp": variables["params"]})["mlp"]}
    step = jax.jit(lambda c, x: mlp.apply(params, c, x))

    z_prev = jnp.zeros((B, C), jnp.float32)
    q_zs, zs = [], []
    for t in range(T):
        carry, out = step(carry, jnp.concatenate(
            [jnp.asarray(x[t]), z_prev], axis=-1))
        q_z_t = out.reshape(B, C, K)
        z_t = jnp.take_along_axis(
            q_z_t, jnp.asarray(choices[t])[..., None], axis=-1)[..., 0]
        q_zs.append(np.asarray(q_z_t))
        zs.append(np.asarray(z_t))
        z_prev = z_t

    np.testing.assert_array_equal(np.stack(q_zs), q_z_ref.numpy())
    np.testing.assert_array_equal(np.stack(zs), z_ref.numpy())


def test_prior_sample_loop_parity(ref_prior):
    """Full ancestral SAMPLING loop (``vae_model.py:405-423``) vs our
    ``PriorBernoulli.sample`` with injected channel choices.

    The torch loop re-forwards the whole growing prefix each step; run
    with reset_net between iterations (fresh-state causal semantics, the
    intended math and what the prior's eval path implements), its step-t
    last output equals our scan step, so identical k-choices must yield
    an identical sampled (T, B, C) z — exactly.
    """
    torch.manual_seed(31)
    choices = torch.randint(0, K, (T, B, C))

    z_minus_t = torch.zeros(1, B, C)
    zs_ref = []
    with torch.no_grad():
        for t in range(T):
            sj_functional.reset_net(ref_prior)
            outputs = ref_prior.layers(z_minus_t)  # (t+1, B, C*k)
            p_z_t = outputs[-1].view(B, C, K)
            z_t = torch.gather(p_z_t, 2, choices[t][..., None])[..., 0]
            zs_ref.append(z_t.numpy())
            z_minus_t = torch.cat([z_minus_t, z_t.view(1, B, C)], dim=0)
    sj_functional.reset_net(ref_prior)
    z_ref = np.stack(zs_ref)  # (T, B, C)

    cfg = SNNVAEConfig()
    prior_j = PriorBernoulli(cfg)
    zeros = jnp.zeros((T, B, C), jnp.float32)
    variables = prior_j.init(
        jax.random.PRNGKey(0), zeros, scheduled=False
    )
    params = _copy_linear_weights(ref_prior.layers, variables["params"])
    z_j = prior_j.apply(
        {"params": params}, jax.random.PRNGKey(0), B,
        choice=jnp.asarray(choices.numpy()), method="sample",
    )
    np.testing.assert_array_equal(np.asarray(z_j), z_ref)
