"""syops profiler tests: op formulas, spike classification, model totals."""

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import VQVAEConfig
from spiking_diffusion_tpu.models import SNNVQVAE
from spiking_diffusion_tpu.profiling import syops


def test_spike_stats():
    spikes = jnp.asarray(np.random.RandomState(0).binomial(1, 0.3, 1000).astype(np.float32))
    is_spike, rate = syops.spike_stats(spikes)
    assert bool(is_spike)
    assert abs(float(rate) - float(spikes.mean())) < 1e-6
    analog = spikes + 0.5
    is_spike2, rate2 = syops.spike_stats(analog)
    assert not bool(is_spike2)
    assert float(rate2) == 1.0


def test_classify_splits_acs_macs():
    spikes = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    e = syops.classify(100.0, spikes)
    assert float(e["acs"]) == 50.0  # rate 0.5
    assert float(e["macs"]) == 0.0
    analog = jnp.asarray([0.3, 1.7])
    e2 = syops.classify(100.0, analog)
    assert float(e2["acs"]) == 0.0
    assert float(e2["macs"]) == 100.0


def test_neuron_entry_always_acs():
    x = jnp.ones((4, 8)) * 0.7
    s = jnp.asarray(np.random.RandomState(1).binomial(1, 0.2, (4, 8)).astype(np.float32))
    e = syops.neuron_entry(x, s)
    assert float(e["acs"]) == 32.0
    assert float(e["macs"]) == 0.0
    assert abs(float(e["rate"]) - float(s.mean())) < 1e-6


def test_profile_model_end_to_end():
    cfg = VQVAEConfig(num_steps=4, embedding_dim=8, num_embeddings=16)
    model = SNNVQVAE(cfg, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(1), img, train=True)

    out, per_layer, total = syops.profile_apply(
        model, variables, img, train=False
    )
    assert out["recon"].shape == (2, 28, 28, 1)
    # encoder: 3 convs + 3 BNs + 3 LIFs; poisson: conv+bn+lif;
    # decoder: 3 deconvs + 2 BNs + 2 LIFs  => >= 16 instrumented layers
    assert len(per_layer) >= 16
    assert total["ops"] > 0
    assert total["acs"] > 0  # spiking layers exist
    assert total["macs"] > 0  # first conv sees analog input
    assert 0 <= total["mean_spike_rate"] <= 1.0
    assert total["energy_mJ"] > 0

    # first encoder conv: analog input (image repeated) -> all MACs
    first_conv = [
        k for k in per_layer if "encoder" in k and "SeqConv_0" in k
    ]
    assert first_conv, list(per_layer)[:5]
    e = per_layer[first_conv[0]]
    assert e["macs"] > 0 and e["acs"] == 0
    # expected: N*14*14*32 outputs * 3*3*1 ops + bias. NOTE: the counter
    # reports the work actually executed — with the static-first-layer
    # optimization the first conv of a direct-coded model runs ONCE and is
    # broadcast over T (identical math), so its count is 1/T of the
    # reference's T-fold count (a real efficiency win, not a miscount).
    n = 2
    out_elems = n * 14 * 14 * 32
    assert e["ops"] == out_elems * 9 + out_elems


def test_count_params():
    cfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8)
    model = SNNVQVAE(cfg, backend="scan")
    img = jnp.zeros((1, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    n = syops.count_params(variables["params"])
    manual = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
    assert n == manual > 0


def test_format_report_runs():
    per_layer = {"enc/conv": {"ops": 100.0, "acs": 40.0, "macs": 60.0, "rate": 0.4}}
    total = syops.totals(per_layer)
    rep = syops.format_report(per_layer, total, 1234)
    assert "TOTAL" in rep and "1,234" in rep


def test_benchmark_harness():
    from spiking_diffusion_tpu.profiling import benchmark

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128,))
    stats = benchmark(f, x, iters=5, warmup=1)
    assert stats["mean_ms"] > 0
    assert stats["calls_per_sec"] > 0


def test_profile_dataset_averages():
    cfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                      enc_channels=(4, 8), dec_channels=(8, 4))
    model = SNNVQVAE(cfg, backend="scan")
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 28, 28, 1)) - 0.5
    variables = model.init(jax.random.PRNGKey(1), img, train=True)
    batches = [img, img + 0.01]
    per_layer, total = syops.profile_dataset(
        model, variables, batches, train=False
    )
    assert total["ops"] > 0
    # static op counts identical across batches -> average == single run
    _, pl1, t1 = syops.profile_apply(model, variables, img, train=False)
    assert abs(total["ops"] - t1["ops"]) < 1e-3
    # empty loader degrades gracefully
    pl0, t0 = syops.profile_dataset(model, variables, [], train=False)
    assert pl0 == {} and t0["ops"] == 0


def test_generation_energy():
    """Pipeline energy estimate: sampler-state probes + decode, per image."""
    import jax

    from spiking_diffusion_tpu.config import DiffusionConfig, VQVAEConfig
    from spiking_diffusion_tpu.models import SNNVQVAE, SpikingDenoiser

    dcfg = DiffusionConfig(num_timesteps=4, num_embeddings=8, mask_id=8,
                           num_steps=2, denoiser_channels=(4, 4, 4, 4, 4))
    vcfg = VQVAEConfig(num_steps=2, embedding_dim=4, num_embeddings=8,
                       enc_channels=(4, 8), dec_channels=(8, 4))
    key = jax.random.PRNGKey(0)
    den = SpikingDenoiser(dcfg, backend="scan")
    d_vars = jax.jit(lambda k: den.init(
        k, jnp.zeros((2, 7, 7), jnp.int32), jnp.ones((2,), jnp.int32),
        train=True))(key)
    model = SNNVQVAE(vcfg, backend="scan")
    m_vars = jax.jit(lambda k: model.init(
        k, jnp.zeros((2, 28, 28, 1)), train=True))(key)

    e = syops.generation_energy(
        den, d_vars, model, m_vars, dcfg, key,
        n_samples=4, probe_steps=(4, 2, 1),
    )
    assert e["energy_uJ_per_img"] > 0
    assert e["acs_per_img"] > 0 and e["macs_per_img"] > 0
    assert 0 < e["denoiser_spike_rate"] < 1
