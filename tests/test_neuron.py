"""LIF/IF dynamics golden-value tests against hand-computed traces.

Parity target: spikingjelly ``LIFNode`` default dynamics
(``neuron.py:726-762,131-141``): tau=2, v_th=1, v_reset=0, decay_input,
hard reset.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.snn import (
    NeuronParams,
    if_scan,
    lif_scan,
    lif_step,
    plif_scan,
)


def ref_lif_trace(x_seq, tau=2.0, v_th=1.0, v_reset=0.0):
    """Straight-line numpy re-derivation of the LIF recurrence."""
    v = np.zeros_like(x_seq[0])
    spikes, vs = [], []
    for x in x_seq:
        h = v + (x - (v - v_reset)) / tau
        s = (h >= v_th).astype(x.dtype)
        v = (1 - s) * h + s * v_reset
        spikes.append(s)
        vs.append(v.copy())
    return np.stack(spikes), np.stack(vs)


def test_lif_constant_input_golden():
    # constant drive x=1.5, tau=2: h1=0.75 (no spike), v1=0.75;
    # h2=0.75+(1.5-0.75)/2=1.125 -> spike, v2=0; h3=0.75 again...
    x = jnp.full((6, 1), 1.5)
    s_seq, v_last = lif_scan(x)
    expected_s = np.array([0, 1, 0, 1, 0, 1], np.float32)[:, None]
    np.testing.assert_array_equal(np.asarray(s_seq), expected_s)


def test_lif_matches_numpy_reference():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 3, size=(16, 4, 5)).astype(np.float32)
    s_seq, v_last = lif_scan(jnp.asarray(x))
    s_ref, v_ref = ref_lif_trace(x)
    np.testing.assert_allclose(np.asarray(s_seq), s_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_last), v_ref[-1], atol=1e-6)


def test_lif_v_seq_output():
    x = jnp.ones((4, 3)) * 2.0
    s_seq, v_seq, v_last = lif_scan(x, return_v_seq=True)
    np.testing.assert_allclose(np.asarray(v_seq[-1]), np.asarray(v_last))
    # x=2: h1 = 0 + (2-0)/2 = 1 -> spike at t=0
    assert float(s_seq[0, 0]) == 1.0


def test_lif_no_decay_input():
    p = NeuronParams(decay_input=False)
    x = jnp.full((2, 1), 0.4)
    s_seq, v_last = lif_scan(x, params=p)
    # h1 = 0 - 0/2 + 0.4 = 0.4; v1 = 0.4; h2 = 0.4 - 0.4/2 + 0.4 = 0.6
    assert float(s_seq.sum()) == 0.0
    assert float(v_last[0]) == np.float32(0.6)


def test_lif_soft_reset():
    p = NeuronParams(hard_reset=False)
    x = jnp.full((2, 1), 3.0)
    s_seq, v_last = lif_scan(x, params=p)
    # h1 = 1.5 -> spike, soft reset v1 = 0.5; h2 = 0.5 + (3-0.5)/2 = 1.75
    # -> spike, v2 = 0.75
    np.testing.assert_allclose(np.asarray(v_last[0]), 0.75, atol=1e-6)
    assert float(s_seq.sum()) == 2.0


def test_if_scan_golden():
    x = jnp.full((4, 1), 0.5)
    s_seq, v_last = if_scan(x)
    # v accumulates 0.5 per step; spikes at t=1 (1.0 >= th), resets, t=3 ...
    expected = np.array([0, 1, 0, 1], np.float32)[:, None]
    np.testing.assert_array_equal(np.asarray(s_seq), expected)


def test_plif_matches_lif_at_equivalent_tau():
    # sigmoid(w) = 1/tau = 0.5 -> w = 0
    x = jnp.asarray(np.random.RandomState(1).uniform(0, 2, (8, 7)).astype(np.float32))
    s_plif, _ = plif_scan(x, jnp.array(0.0))
    s_lif, _ = lif_scan(x)
    np.testing.assert_array_equal(np.asarray(s_plif), np.asarray(s_lif))


def test_lif_step_gradient_flows_through_reset():
    # detach_reset=False (reference default): the reset term carries
    # surrogate gradient — easy to get subtly wrong (SURVEY.md §7 risk).
    p = NeuronParams(detach_reset=False)

    def f(x):
        v, s = lif_step(jnp.array(0.9), x, p)
        return v  # gradient of the *membrane* wrt input

    g_attached = jax.grad(f)(jnp.array(0.3))

    p_detached = NeuronParams(detach_reset=True)

    def f2(x):
        v, s = lif_step(jnp.array(0.9), x, p_detached)
        return v

    g_detached = jax.grad(f2)(jnp.array(0.3))
    # with h near threshold the surrogate term is large -> gradients differ
    assert not np.isclose(float(g_attached), float(g_detached))


def ref_lif_bptt(x, gs_seq, gv_direct, tau=2.0, v_th=1.0, v_reset=0.0, alpha=2.0):
    """Hand-written numpy reverse-mode of the surrogate-gradient LIF
    recurrence — the oracle the fused kernels are judged against (the same
    role as spikingjelly's torch-vs-cupy parity checker,
    ``neuron_kernel.py:1264-1311``).

    gs_seq: dL/dS[t] upstream; gv_direct: dL/dV[t] direct contributions.
    Returns dL/dX.
    """
    T = x.shape[0]
    v = np.zeros_like(x[0])
    hs, ss = [], []
    for t in range(T):
        h = v + (x[t] - (v - v_reset)) / tau
        s = (h >= v_th).astype(x.dtype)
        v = (1 - s) * h + s * v_reset
        hs.append(h)
        ss.append(s)
    gx = np.zeros_like(x)
    gh_next = np.zeros_like(x[0])
    for t in reversed(range(T)):
        h, s = hs[t], ss[t]
        sg = (alpha / 2) / (1 + (np.pi / 2 * alpha * (h - v_th)) ** 2)
        gv = gv_direct[t] + gh_next * (1 - 1 / tau)
        # dv/dh = (1-s) + (v_reset - h) * sg  (detach_reset=False)
        gh = gv * ((1 - s) + (v_reset - h) * sg) + gs_seq[t] * sg
        gx[t] = gh / tau
        gh_next = gh
    return gx


def test_lif_bptt_gradient_matches_numpy_oracle():
    p = NeuronParams()
    rng = np.random.RandomState(3)
    x0 = rng.uniform(-1, 3, size=(6, 4)).astype(np.float32)
    ws = rng.uniform(-1, 1, size=(6, 4)).astype(np.float32)
    wv = rng.uniform(-1, 1, size=(6, 4)).astype(np.float32)

    def loss(x):
        s, v_seq, _ = lif_scan(x, params=p, return_v_seq=True)
        return jnp.sum(s * ws) + jnp.sum(v_seq * wv)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x0)))
    g_ref = ref_lif_bptt(x0, ws, wv)
    np.testing.assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6)


def test_lif_multi_step_scan_backend():
    from spiking_diffusion_tpu.snn import lif_multi_step

    x = jnp.ones((3, 2)) * 2.0
    s = lif_multi_step(x, backend="scan")
    s2, _ = lif_scan(x)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
