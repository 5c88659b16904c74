"""Stage 2: train the absorbing-diffusion prior over VQ code grids.

Replaces the reference loop (``main.py:241-286``): AdamW over the denoiser,
loss from :func:`spiking_diffusion_tpu.models.diffusion.train_loss`,
periodic sample grids. One jitted step; RNG is an explicit threaded key
(the reference relies on the global torch seed).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models import diffusion
from spiking_diffusion_tpu.train.state import TrainState, create_train_state


def make_train_step_diffusion(
    cfg: DiffusionConfig, donate: bool = True
) -> Callable[
    [TrainState, jax.Array, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]
]:
    """Jitted diffusion train step: (state, indices (N,h,w) int32, key)."""

    def loss_fn(params, batch_stats, apply_fn, x0, key):
        mutated = {}

        def denoise(x_t, t):
            nonlocal mutated
            logits, mut = apply_fn(
                {"params": params, "batch_stats": batch_stats},
                x_t,
                t,
                train=True,
                mutable=["batch_stats"],
            )
            mutated = mut
            return logits

        loss = diffusion.train_loss(key, denoise, x0, cfg)
        return loss, mutated["batch_stats"]

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, x0: jax.Array, key: jax.Array):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.apply_fn, x0, key
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss}

    return train_step


def make_train_step_diffusion_dp(cfg: DiffusionConfig, mesh, donate: bool = True):
    """Explicit-collective data-parallel train step (``shard_map``).

    Exists because the 'bnlif' denoiser backend is a Pallas custom call —
    opaque to GSPMD auto-partitioning — so the sharded-inputs+jit recipe
    used everywhere else can't split it over devices. Here every device
    runs the fused kernel on its local batch shard and the collectives
    are explicit:

      * corruption randomness (t, x_t, x_0_ignore) is drawn OUTSIDE the
        shard_map on the global batch — bitwise-identical draws to
        :func:`make_train_step_diffusion`;
      * BN statistics sync via pmean inside the module (the denoiser must
        be built with ``bn_axis_name == mesh.axis_names[0]`` — SyncBN),
        reproducing the single-device T*N-joint statistics;
      * per-device grads (and the scalar loss) are pmean-ed; updates are
        therefore identical on every device and equal to single-device up
        to reduction order (asserted in tests/test_bnlif_dp.py).
    """
    from jax.sharding import PartitionSpec as P

    from spiking_diffusion_tpu.parallel import shard_map_compat

    axis = mesh.axis_names[0]

    def local_step(state: TrainState, x_t, t, pt, x0_ignore):
        def loss_fn(params, batch_stats):
            mutated = {}

            def denoise(x, tt):
                nonlocal mutated
                logits, mut = state.apply_fn(
                    {"params": params, "batch_stats": batch_stats},
                    x, tt, train=True, mutable=["batch_stats"],
                )
                mutated = mut
                return logits

            loss = jnp.mean(
                diffusion.per_sample_loss(denoise, x_t, t, pt, x0_ignore, cfg)
            )
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats
        )
        # local loss is the mean over this device's shard; shards are
        # equal-size, so pmean == the global batch mean. Same for grads
        # (the BN-stat cross-device terms arrive via the psum transposes
        # of the SyncBN pmeans, so pmean(grads) IS the global gradient).
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss}

    smapped = shard_map_compat(
        local_step, mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, x0: jax.Array, key: jax.Array):
        x_t, t, pt, x0_ignore = diffusion.corrupt(key, x0, cfg)
        return smapped(state, x_t, t, pt, x0_ignore)

    return train_step


def train_diffusion(
    denoiser,
    cfg: DiffusionConfig,
    indices: np.ndarray,
    epochs: int = 1,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-3,
    seed: int = 42,
    log_every: int = 20,
    log_fn: Optional[Callable[[str], None]] = print,
    epoch_callback: Optional[Callable[[int, TrainState], None]] = None,
    data_parallel: int = 1,
) -> TrainState:
    """Full stage-2 loop over pre-extracted (N, h, w) code grids.

    ``data_parallel > 1`` shards the batch over a 1-D device mesh with
    replicated parameters (same recipe as stage 1).
    """
    key = jax.random.PRNGKey(seed)
    init_key, key = jax.random.split(key)
    sample = jnp.asarray(indices[:batch_size])
    t0 = jnp.ones((batch_size,), jnp.int32)
    variables = jax.jit(
        lambda k, x, t: denoiser.init(k, x, t, train=True)
    )(init_key, sample, t0)
    state = create_train_state(
        denoiser, variables, learning_rate=learning_rate, weight_decay=weight_decay
    )
    step_fn = make_train_step_diffusion(cfg)

    # device-resident code grids (tiny: N*h*w int32) + on-device gather —
    # avoids per-step host->device copies over the slow tunnel
    device_resident = data_parallel <= 1
    if device_resident:
        data_dev = jnp.asarray(indices, jnp.int32)
        body = step_fn.__wrapped__

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_idx_fn(state, data, idx, k):
            return body(state, jnp.take(data, idx, axis=0), k)
    else:
        from spiking_diffusion_tpu.parallel import make_mesh, replicate, shard_batch

        if batch_size % data_parallel:
            raise ValueError("batch_size must divide by data_parallel")
        mesh = make_mesh(data_parallel)
        state = replicate(state, mesh)
        place = lambda b: shard_batch(jnp.asarray(b), mesh)
        bn_axis = getattr(denoiser, "bn_axis_name", None)
        if bn_axis is not None:
            # GSPMD-opaque backend (bnlif Pallas kernel): explicit
            # shard_map step with SyncBN over the mesh axis
            if bn_axis != mesh.axis_names[0]:
                raise ValueError(
                    f"denoiser bn_axis_name={bn_axis!r} != mesh axis "
                    f"{mesh.axis_names[0]!r}"
                )
            step_fn = make_train_step_diffusion_dp(cfg, mesh)

    n = indices.shape[0]
    steps_per_epoch = n // batch_size
    for epoch in range(epochs):
        t_start = time.time()
        order = np.arange(n)
        np.random.RandomState(seed * 7919 + epoch).shuffle(order)
        for i in range(steps_per_epoch):
            sel = order[i * batch_size : (i + 1) * batch_size]
            key, k = jax.random.split(key)
            if device_resident:
                state, metrics = step_idx_fn(
                    state, data_dev, jnp.asarray(sel.astype(np.int32)), k
                )
            else:
                state, metrics = step_fn(state, place(indices[sel]), k)
            if log_fn and ((i + 1) % log_every == 0 or i + 1 == steps_per_epoch):
                m = jax.device_get(metrics)
                log_fn(
                    f"[{epoch}/{epochs}][{i}/{steps_per_epoch}]: "
                    f"loss {m['loss']:.3f}"
                )
        if log_fn:
            dt = time.time() - t_start
            log_fn(f"diff epoch {epoch} done in {dt:.1f}s")
        if epoch_callback:
            epoch_callback(epoch, state)
    return state


def sample_codes(
    state: TrainState,
    cfg: DiffusionConfig,
    key: jax.Array,
    n_samples: int = 16,
    temperature: float = 1.0,
    sample_steps: Optional[int] = None,
    unmask_mode: str = "random",
    choice_temperature: float = 1.0,
    spacing: str = "linear",
    data_parallel: int = 1,
    fused: bool = False,
    fused_dtype=None,
) -> jax.Array:
    """Generate (N, h, w) code grids from a trained denoiser state.

    ``data_parallel > 1``: shard the sample batch over a 1-D mesh —
    generation throughput scales with chips (no collectives; each device
    runs its slice through the same 49-step scan).

    ``fused=True`` samples through the whole-denoiser Pallas megakernel
    (``ops/fused_denoiser.py``), in fp32 unless ``fused_dtype`` says
    otherwise (match it to the training dtype). A Pallas custom call is
    opaque to GSPMD auto-partitioning, so the data-parallel fused path
    uses ``shard_map``:
    every device runs its own kernel on its local batch shard, with the
    RNG key folded by device index (sample streams therefore differ from
    the single-device run — same distribution, different draws).
    """

    import jax.numpy as jnp

    from spiking_diffusion_tpu.ops.fused_denoiser import make_denoise_fn

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    denoise = make_denoise_fn(
        variables, cfg, state.apply_fn, fused=bool(fused),
        dtype=jnp.float32 if fused_dtype is None else fused_dtype,
    )

    if data_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from spiking_diffusion_tpu.parallel import make_mesh, replicate

        if n_samples % data_parallel:
            raise ValueError("n_samples must divide by data_parallel")
        mesh = make_mesh(data_parallel)
        if fused:
            per_dev = n_samples // data_parallel

            def local_gen(k):
                k = jax.random.fold_in(k, jax.lax.axis_index("data"))
                return diffusion.sample(
                    k, denoise, cfg, n_samples=per_dev,
                    temperature=temperature, sample_steps=sample_steps,
                    unmask_mode=unmask_mode,
                    choice_temperature=choice_temperature,
                    spacing=spacing,
                )

            try:
                # jax >= 0.8: check_vma replaced the old check_rep flag.
                # TypeError covers versions where jax.shard_map exists but
                # still takes check_rep (pre-check_vma API).
                from jax import shard_map

                smapped = shard_map(
                    local_gen, mesh=mesh, in_specs=P(),
                    out_specs=P("data", None, None), check_vma=False,
                )
            except (ImportError, TypeError):  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map

                smapped = shard_map(
                    local_gen, mesh=mesh, in_specs=P(),
                    out_specs=P("data", None, None), check_rep=False,
                )
            return jax.jit(smapped)(key)
        state = replicate(state, mesh)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

        def denoise(x_t, t):  # rebind on the replicated state
            return state.apply_fn(variables, x_t, t, train=False)

        out_sharding = NamedSharding(mesh, P("data", None, None))
    else:
        out_sharding = None

    fn = jax.jit(
        lambda k: diffusion.sample(
            k, denoise, cfg, n_samples=n_samples,
            temperature=temperature, sample_steps=sample_steps,
            unmask_mode=unmask_mode,
            choice_temperature=choice_temperature,
            spacing=spacing,
        ),
        **({"out_shardings": out_sharding} if out_sharding else {}),
    )
    return fn(key)
