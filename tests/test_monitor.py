"""Monitor subsystem tests: output capture, spike rates, membrane traces,
grad norms."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.profiling import monitor

CFG = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                  enc_channels=(4, 8), dec_channels=(8, 4))


def _model():
    model = SNNVQVAE(CFG, backend="scan")
    img = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    return model, variables


def test_capture_outputs():
    model, variables = _model()
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 28, 28, 1)) - 0.5
    outs = monitor.capture_outputs(model, variables, img, train=False)
    assert len(outs) > 5
    assert any("encoder" in k for k in outs)


def test_spike_rates():
    model, variables = _model()
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 28, 28, 1)) - 0.5
    rates = monitor.spike_rates(model, variables, img, train=False)
    assert len(rates) >= 3  # encoder LIFs + poisson + decoder LIFs
    for k, r in rates.items():
        assert 0.0 <= r <= 1.0, (k, r)


def test_membrane_traces():
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 2, (4, 3)).astype(np.float32))
    tr = monitor.membrane_traces(x)
    assert tr["spikes"].shape == (4, 3)
    assert tr["v_seq"].shape == (4, 3)
    np.testing.assert_allclose(
        np.asarray(tr["v_seq"][-1]), np.asarray(tr["v_last"])
    )
    # membranes reset to 0 wherever a spike fired (hard reset, v_reset 0)
    v = np.asarray(tr["v_seq"])
    s = np.asarray(tr["spikes"])
    assert (v[s == 1.0] == 0.0).all()


def test_grad_norms():
    model, variables = _model()
    img = jax.random.uniform(jax.random.PRNGKey(3), (2, 28, 28, 1)) - 0.5

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, train=True, mutable=["batch_stats"],
        )
        return out["vq_loss"] + out["recon_loss"]

    grads = jax.grad(loss)(variables["params"])
    norms = monitor.grad_norms(grads)
    assert len(norms) > 5
    assert all(np.isfinite(v) for v in norms.values())
    assert any(v > 0 for v in norms.values())


def test_device_monitor_records_and_summarizes():
    import time

    from spiking_diffusion_tpu.profiling.monitor import DeviceMonitor

    dm = DeviceMonitor(interval=0.05, start_now=True)
    time.sleep(0.2)
    records = dm.stop()
    assert len(records) >= 2
    assert all("t" in r for r in records)
    # CPU backend exposes no memory_stats -> empty summary, no crash
    assert isinstance(dm.summary(), dict)
    # stopping twice is safe
    dm.stop()
