"""Cross-framework oracle: run the actual spikingjelly (torch, CPU) next
to this framework and assert numerical parity of the core dynamics.

This is the strongest form of the reference's own backend-parity checks
(``neuron_kernel.check_multi_step_neuron_output_and_grad``): the torch
library IS the oracle. The tests skip cleanly when spikingjelly is not
importable (it is not vendored here — set SPIKINGJELLY_PATH to a
directory containing the ``spikingjelly`` package to enable; on the build
box the reference's zip is extracted at /tmp/sj and symlinked into
/tmp/sj_pkg).
"""

import os
import sys

import numpy as np
import pytest

for cand in (os.environ.get("SPIKINGJELLY_PATH"), "/tmp/sj_pkg"):
    if cand and os.path.isdir(cand):
        sys.path.insert(0, cand)

torch = pytest.importorskip("torch")
sj_neuron = pytest.importorskip("spikingjelly.activation_based.neuron")
sj_surrogate = pytest.importorskip("spikingjelly.activation_based.surrogate")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spiking_diffusion_tpu.snn import (  # noqa: E402
    NeuronParams,
    lif_scan,
    membrane_output,
    psp,
)
from spiking_diffusion_tpu.snn.surrogate import atan_grad  # noqa: E402


def _sj_lif_forward(x_np, tau=2.0, detach_reset=False):
    lif = sj_neuron.LIFNode(
        tau=tau, surrogate_function=sj_surrogate.ATan(),
        detach_reset=detach_reset,
    )
    xt = torch.tensor(x_np, requires_grad=True)
    spikes = []
    for t in range(x_np.shape[0]):
        spikes.append(lif(xt[t]))
    return lif, xt, torch.stack(spikes)


def test_lif_forward_matches_spikingjelly():
    x = np.random.RandomState(0).uniform(-1, 3, (16, 4, 7)).astype(np.float32)
    _, _, s_torch = _sj_lif_forward(x)
    s_jax, _ = lif_scan(jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(s_jax), s_torch.detach().numpy()
    )


def test_lif_backward_matches_spikingjelly():
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 3, (8, 3, 5)).astype(np.float32)
    w = rng.randn(8, 3, 5).astype(np.float32)

    _, xt, s_torch = _sj_lif_forward(x)
    (s_torch * torch.tensor(w)).sum().backward()
    g_torch = xt.grad.numpy()

    def loss(xj):
        s, _ = lif_scan(xj)
        return jnp.sum(s * jnp.asarray(w))

    g_jax = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    np.testing.assert_allclose(g_jax, g_torch, rtol=1e-5, atol=1e-6)


def test_lif_backward_detach_reset_matches():
    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 3, (6, 2, 4)).astype(np.float32)
    w = rng.randn(6, 2, 4).astype(np.float32)
    _, xt, s_torch = _sj_lif_forward(x, detach_reset=True)
    (s_torch * torch.tensor(w)).sum().backward()
    g_torch = xt.grad.numpy()

    p = NeuronParams(detach_reset=True)

    def loss(xj):
        s, _ = lif_scan(xj, params=p)
        return jnp.sum(s * jnp.asarray(w))

    g_jax = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    np.testing.assert_allclose(g_jax, g_torch, rtol=1e-5, atol=1e-6)


def test_atan_surrogate_grad_matches():
    xs = np.linspace(-3, 3, 41).astype(np.float32)
    fn = sj_surrogate.ATan()
    xt = torch.tensor(xs, requires_grad=True)
    fn(xt).sum().backward()
    ours = np.asarray(atan_grad(jnp.asarray(xs), 2.0))
    np.testing.assert_allclose(ours, xt.grad.numpy(), rtol=1e-5)


def test_psp_and_memout_match_reference_modules():
    # PSP and MembraneOutputLayer live in the app, not spikingjelly —
    # replicate their math in torch here as the oracle
    rng = np.random.RandomState(3)
    x = rng.rand(16, 4, 3).astype(np.float32)

    syn = torch.zeros(4, 3)
    xt = torch.tensor(x)
    torch_psp = []
    for t in range(16):
        syn = syn + (xt[t] - syn) / 2.0
        torch_psp.append(syn.clone())
    torch_psp = torch.stack(torch_psp).numpy()
    np.testing.assert_allclose(np.asarray(psp(jnp.asarray(x))), torch_psp,
                               rtol=1e-5, atol=1e-6)

    coef = torch.pow(torch.tensor(0.8), torch.arange(15, -1, -1).float())
    torch_memout = (xt * coef[:, None, None]).sum(0).numpy()
    np.testing.assert_allclose(
        np.asarray(membrane_output(jnp.asarray(x), 0.8)), torch_memout,
        rtol=1e-5, atol=1e-5,
    )


def test_seq_layer_batchnorm_matches_torch_semantics():
    # BN over T*N jointly: torch BatchNorm2d on (T*N, C, H, W) vs
    # SeqBatchNorm on (T, N, H, W, C)
    rng = np.random.RandomState(4)
    x = rng.randn(4, 3, 5, 5, 2).astype(np.float32)
    bn_t = torch.nn.BatchNorm2d(2)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3).reshape(12, 2, 5, 5)
    y_torch = bn_t(xt).detach().reshape(4, 3, 2, 5, 5).permute(0, 1, 3, 4, 2)

    from spiking_diffusion_tpu.models.layers import SeqBatchNorm

    bn_j = SeqBatchNorm(use_running_average=False)
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_jax, _ = bn_j.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_jax), y_torch.numpy(), rtol=1e-3, atol=1e-4
    )
