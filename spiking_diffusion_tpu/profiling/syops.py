"""Spike-aware op/energy accounting (the reference's ``syops`` package).

Parity target: ``Spiking-Diffusion-release/syops/`` — per-layer counters
that classify traffic as ACs (accumulate-only, spike-driven) vs MACs
(multiply-accumulate, analog) using the layer *input*'s spike-ness, plus
spike rates, parameter counts, and the 0.9pJ/4.6pJ energy model.

JAX has no forward hooks; instead every step-aware layer in
:mod:`spiking_diffusion_tpu.models.layers` ``sow``s its counters into a
``syops`` variable collection. When the caller does not request that
collection, XLA dead-code-eliminates the bookkeeping — profiling is free
unless asked for.

Counting rules (mirroring ``syops/ops.py``):
  * conv:    ops = T*N*Hout*Wout * k*k*Cin*Cout/groups (+ bias: out elems)
  * linear:  ops = prod(in.shape) * out_features (+ out_features if bias)
  * BN:      ops = in_elems * (2 if affine)
  * LIF/IF:  ops = in_elems, always accrued as ACs (membrane adds)
  * an input is "spike" if every element is 0 or 1; then ACs += ops * rate,
    else MACs += ops. rate = mean(input).
Note: the reference's conv hook mis-reads 5-D (T,N,C,H,W) inputs (it takes
``input.shape[0]`` as batch and ``output.shape[2:]`` as spatial, dropping
N and counting C as spatial — ``syops/ops.py:121-139``); this rebuild
counts the time axis correctly and documents the divergence.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# energy per op, picojoules (45nm CMOS, the convention used by the
# syops-counter README and the Spiking-Diffusion paper's energy table)
E_AC_PJ = 0.9
E_MAC_PJ = 4.6


def spike_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(is_spike, rate): is_spike = every element in {0,1};
    rate = mean (fraction of ones) if spike else 1.0."""
    xf = x.astype(jnp.float32)
    is_spike = jnp.all((xf == 0.0) | (xf == 1.0))
    rate = jnp.where(is_spike, jnp.mean(xf), 1.0)
    return is_spike, rate


def classify(ops: float, x_in: jax.Array) -> Dict[str, jax.Array]:
    """Split a static op count into ACs/MACs by input spike-ness."""
    is_spike, rate = spike_stats(x_in)
    ops = jnp.float32(ops)
    acs = jnp.where(is_spike, ops * rate, 0.0)
    macs = jnp.where(is_spike, 0.0, ops)
    return {"ops": ops, "acs": acs, "macs": macs, "rate": rate}


def neuron_entry(x_in: jax.Array, s_out: jax.Array) -> Dict[str, jax.Array]:
    """LIF/IF accounting: in_elems membrane adds, all ACs; rate from the
    *output* spike train (``syops/ops.py:68-75``)."""
    ops = jnp.float32(x_in.size)
    _, rate = spike_stats(s_out)
    return {"ops": ops, "acs": ops, "macs": jnp.zeros(()), "rate": rate}


def collect(variables_syops: Any) -> Dict[str, Dict[str, float]]:
    """Flatten a sown 'syops' collection into {layer_path: entry}."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict) and "ops" in node:
            flat["/".join(path)] = {
                k: float(np.asarray(v[0] if isinstance(v, tuple) else v))
                for k, v in node.items()
            }
            return
        if isinstance(node, (dict,)):
            for k, v in node.items():
                walk(v, path + (str(k),))
        elif isinstance(node, tuple):
            # sow default reduce wraps each value in a tuple
            for i, v in enumerate(node):
                walk(v, path if len(node) == 1 else path + (str(i),))

    walk(variables_syops, ())
    return flat


def totals(per_layer: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    ops = sum(e["ops"] for e in per_layer.values())
    acs = sum(e["acs"] for e in per_layer.values())
    macs = sum(e["macs"] for e in per_layer.values())
    rates = [e["rate"] for e in per_layer.values()]
    return {
        "ops": ops,
        "acs": acs,
        "macs": macs,
        "mean_spike_rate": float(np.mean(rates)) if rates else 1.0,
        "energy_mJ": (acs * E_AC_PJ + macs * E_MAC_PJ) * 1e-9,
    }


def count_params(params: Any) -> int:
    return int(sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)))


_PROFILE_JIT_CACHE: Dict[Any, Any] = {}
# keys hold model instances (and their closed-over compiled executables);
# cap the cache so config sweeps over freshly constructed models don't
# accumulate them for the process lifetime
_PROFILE_JIT_CACHE_MAX = 16


def profile_apply(model, variables, *args, **kwargs):
    """Run ``model.apply`` collecting the syops counters.

    Returns (output, per_layer dict, totals dict). Mirrors
    ``syops.get_model_complexity_info`` (``flops_counter.py:17-65``) but
    for a single batch; average over a loader by calling repeatedly.
    """
    mutable = kwargs.pop("mutable", [])
    if isinstance(mutable, (list, tuple)):
        mutable = list(mutable) + ["syops"]
    else:
        mutable = [mutable, "syops"]
    # jit the instrumented apply (eager per-op dispatch is prohibitive on
    # the remote-TPU tunnel), CACHED per (model, mutable, kwargs) so
    # repeated profiling — generation_energy probes, profile_dataset
    # loops — reuses one compilation instead of retracing every call
    try:
        cache_key = (model, tuple(mutable), tuple(sorted(kwargs.items())))
        fn = _PROFILE_JIT_CACHE.get(cache_key)
    except TypeError:  # unhashable kwarg — fall back to uncached
        cache_key, fn = None, None
    if fn is None:
        fn = jax.jit(
            lambda v, *a: model.apply(v, *a, mutable=mutable, **kwargs)
        )
        if cache_key is not None:
            while len(_PROFILE_JIT_CACHE) >= _PROFILE_JIT_CACHE_MAX:
                _PROFILE_JIT_CACHE.pop(next(iter(_PROFILE_JIT_CACHE)))
            _PROFILE_JIT_CACHE[cache_key] = fn
    out, mut = fn(variables, *args)
    per_layer = collect(mut.get("syops", {}))
    return out, per_layer, totals(per_layer)


def profile_dataset(model, variables, batches, *args_fn, **kwargs):
    """Average syops over a dataloader, the reference's protocol
    (``syops/engine.py:39-61``: accrue per batch, divide by batch count).

    ``batches`` is an iterable of model inputs (each passed as the first
    positional arg). Returns (per_layer averaged, totals averaged).
    """
    acc: Dict[str, Dict[str, float]] = {}
    n = 0
    for batch in batches:
        _, per_layer, _ = profile_apply(model, variables, batch, **kwargs)
        for k, e in per_layer.items():
            slot = acc.setdefault(k, {kk: 0.0 for kk in e})
            for kk, v in e.items():
                slot[kk] += v
        n += 1
    if n == 0:
        return {}, totals({})
    per_layer = {
        k: {kk: v / n for kk, v in e.items()} for k, e in acc.items()
    }
    return per_layer, totals(per_layer)


def format_report(
    per_layer: Dict[str, Dict[str, float]],
    total: Dict[str, float],
    n_params: int,
) -> str:
    """Human-readable per-layer table (``syops/engine.py:104-165``)."""
    lines = [
        f"{'layer':60s} {'Ops':>14s} {'ACs':>14s} {'MACs':>14s} {'rate%':>7s}"
    ]
    for name, e in sorted(per_layer.items()):
        lines.append(
            f"{name:60s} {e['ops']:14.3e} {e['acs']:14.3e} "
            f"{e['macs']:14.3e} {e['rate'] * 100:6.2f}%"
        )
    lines.append("-" * 112)
    lines.append(
        f"{'TOTAL':60s} {total['ops']:14.3e} {total['acs']:14.3e} "
        f"{total['macs']:14.3e} {total['mean_spike_rate'] * 100:6.2f}%"
    )
    lines.append(
        f"params: {n_params:,}   estimated energy: "
        f"{total['energy_mJ']:.4f} mJ  (ACs*{E_AC_PJ} + MACs*{E_MAC_PJ} pJ)"
    )
    return "\n".join(lines)


def generation_energy(
    denoiser,
    d_vars,
    model,
    m_vars,
    d_cfg,
    key,
    n_samples: int = 64,
    probe_steps: Tuple[int, ...] | None = None,
):
    """Spike-aware op/energy estimate for ONE generated image through the
    full pipeline: ``num_timesteps`` denoiser forwards + the VQ decode.

    The reference's energy table profiles single forwards; generation cost
    is what a deployment pays, so this extends the same protocol: sample
    real code grids, re-corrupt them at a few probe timesteps (the
    sampler's actual state distribution at step t is "codes masked w.p.
    t/T"), average the denoiser's AC/MAC counters over the probes, scale
    by the step count, and add one decode. Returns a dict with
    ``acs``/``macs``/``energy_uJ`` per image and the probe spike rate.
    """
    from spiking_diffusion_tpu.models import diffusion

    if probe_steps is None:
        # 5 probes spread over the schedule, derived from the config (a
        # fixed list would silently probe t > num_timesteps on smaller
        # schedules, i.e. mask probabilities > 1)
        t_max = d_cfg.num_timesteps
        probe_steps = tuple(sorted(
            {max(1, round(t_max * f)) for f in (1.0, 0.75, 0.5, 0.25, 0.02)},
            reverse=True,
        ))

    def denoise(x_t, t):
        return denoiser.apply(d_vars, x_t, t, train=False)

    codes = jax.jit(
        lambda k: diffusion.sample(
            k, denoise, d_cfg, n_samples=n_samples, temperature=0.8
        )
    )(key)

    den_tot = {"ops": 0.0, "acs": 0.0, "macs": 0.0, "rate": 0.0}
    for t in probe_steps:
        kt = jax.random.fold_in(key, t)
        t_vec = jnp.full((n_samples,), t, jnp.int32)
        x_t, _, _ = diffusion.q_sample(
            kt, codes, t_vec, d_cfg.mask_id, d_cfg.num_timesteps
        )
        _, _, tot = profile_apply(denoiser, d_vars, x_t, t_vec, train=False)
        den_tot["ops"] += tot["ops"]
        den_tot["acs"] += tot["acs"]
        den_tot["macs"] += tot["macs"]
        den_tot["rate"] += tot["mean_spike_rate"]
    n_probe = len(probe_steps)
    for k in den_tot:
        den_tot[k] /= n_probe

    _, _, dec_tot = profile_apply(
        model, m_vars, codes, method="decode_indices"
    )

    steps = d_cfg.num_timesteps
    acs = (den_tot["acs"] * steps + dec_tot["acs"]) / n_samples
    macs = (den_tot["macs"] * steps + dec_tot["macs"]) / n_samples
    return {
        "acs_per_img": acs,
        "macs_per_img": macs,
        "energy_uJ_per_img": (acs * E_AC_PJ + macs * E_MAC_PJ) * 1e-6,
        "denoiser_spike_rate": den_tot["rate"],
    }
