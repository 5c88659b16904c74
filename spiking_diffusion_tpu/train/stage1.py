"""Stage 1: train the spiking VQ-VAE on images.

Replaces the reference epoch loop (``main.py:124-199``): loss =
vq_loss + mse(recon, image)/data_variance, AdamW, per-epoch recon grids and
checkpoints. The whole optimizer step (forward, backward-through-time over
the T-step scans, AdamW update, BN stat update) is one jitted function.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.data import batch_iterator
from spiking_diffusion_tpu.train.state import TrainState, create_train_state


def make_train_step_vqvae(
    data_variance: float, donate: bool = True
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build a jitted VQ-VAE train step: (state, images) -> (state, metrics).

    ``data_variance`` is static — it is a dataset constant (``main.py:95``).
    """

    def loss_fn(params, batch_stats, apply_fn, images):
        out, mutated = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            data_variance=data_variance,
            mutable=["batch_stats"],
        )
        loss = out["vq_loss"] + out["recon_loss"]
        aux = {
            "loss": loss,
            "vq_loss": out["vq_loss"],
            "recon_loss": out["recon_loss"],
            "real_recon_loss": out["real_recon_loss"],
            "batch_stats": mutated["batch_stats"],
        }
        return loss, aux

    def train_step_body(state: TrainState, images: jax.Array):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, images
        )
        new_state = state.apply_gradients(
            grads, new_batch_stats=aux.pop("batch_stats")
        )
        return new_state, aux

    return jax.jit(
        train_step_body, donate_argnums=(0,) if donate else ()
    )


def make_train_step_vqvae_indexed(
    data_variance: float, donate: bool = True
) -> Callable:
    """Device-resident-dataset variant: (state, data, idx) -> (state, metrics).

    ``data`` is the WHOLE [0,1] training set living on device; ``idx`` is
    the (B,) int32 batch selection. The gather and the -0.5 shift happen
    on device, so the host->device traffic per step is ~4*B bytes instead
    of the full batch — essential on this environment's tunnel-attached
    TPU (~35 MB/s host copies: a 256x28x28 batch costs ~23 ms to ship,
    dwarfing the 30 ms step itself).
    """
    step = make_train_step_vqvae(data_variance, donate=False)
    body = step.__wrapped__  # the unjitted step body

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, data: jax.Array, idx: jax.Array):
        batch = jnp.take(data, idx, axis=0) - 0.5
        return body(state, batch)

    return train_step


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def eval_step_vqvae(apply_fn, params, batch_stats, images):
    """Eval forward: returns recon images + code indices (jitted)."""
    out = apply_fn(
        {"params": params, "batch_stats": batch_stats}, images, train=False
    )
    return out["recon"], out["indices"]


def extract_code_indices(
    state: TrainState, images: np.ndarray, batch_size: int = 256
) -> np.ndarray:
    """Run the trained VQ-VAE over a dataset, returning (N, h, w) int32
    code grids for stage-2 training (parity: ``vq_diffusion.py:23-36``,
    which caches per-batch (B,7,7) index tensors to host RAM).
    """

    @jax.jit
    def encode(params, batch_stats, imgs):
        return state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            imgs,
            method="encode_indices",
        )

    chunks = []
    n = images.shape[0]
    for i in range(0, n - n % batch_size, batch_size):
        batch = jnp.asarray(images[i : i + batch_size] - 0.5)
        chunks.append(np.asarray(encode(state.params, state.batch_stats, batch)))
    # remainder (padded to keep shapes static, then trimmed)
    rem = n % batch_size
    if rem:
        tail = images[n - rem :] - 0.5
        pad = np.concatenate(
            [tail, np.zeros((batch_size - rem,) + tail.shape[1:], tail.dtype)]
        )
        out = np.asarray(encode(state.params, state.batch_stats, jnp.asarray(pad)))
        chunks.append(out[:rem])
    return np.concatenate(chunks, axis=0).astype(np.int32)


def train_vqvae(
    model,
    images: np.ndarray,
    data_variance: float,
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
    """Full stage-1 training loop. Images are raw [0,1]; the -0.5 shift is
    applied per batch (``main.py:131``).

    ``data_parallel > 1`` trains over an n-device 1-D mesh: parameters
    replicated, batch sharded on its leading axis; XLA inserts the gradient
    all-reduce over ICI from the sharding annotations (the reference has no
    distributed path at all, SURVEY.md §2d).
    """
    key = jax.random.PRNGKey(seed)
    sample = jnp.asarray(images[:batch_size] - 0.5)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(key, sample)
    state = create_train_state(
        model, variables, learning_rate=learning_rate, weight_decay=weight_decay
    )

    # Device-resident dataset fast path (single-device): ship the whole
    # training set once and gather batches on device — the tunnel-attached
    # TPU copies hosts->device at ~35 MB/s, so per-step batch shipping
    # would triple the step time. DP keeps the host-sharding path.
    device_resident = data_parallel <= 1
    if device_resident:
        data_dev = jnp.asarray(images, jnp.float32)
        step_idx_fn = make_train_step_vqvae_indexed(data_variance)
    else:
        step_fn = make_train_step_vqvae(data_variance)
        from spiking_diffusion_tpu.parallel import make_mesh, replicate, shard_batch

        if batch_size % data_parallel:
            raise ValueError("batch_size must divide by data_parallel")
        mesh = make_mesh(data_parallel)
        state = replicate(state, mesh)
        place = lambda b: shard_batch(jnp.asarray(b), mesh)

    steps_per_epoch = images.shape[0] // batch_size
    n = images.shape[0]
    for epoch in range(epochs):
        t0 = time.time()
        if device_resident:
            order = np.arange(n)
            np.random.RandomState(seed * 100003 + epoch).shuffle(order)
            batches = (
                jnp.asarray(order[i * batch_size : (i + 1) * batch_size]
                            .astype(np.int32))
                for i in range(steps_per_epoch)
            )
        else:
            batches = batch_iterator(images, batch_size, seed=seed, epoch=epoch)
        for i, batch in enumerate(batches):
            if device_resident:
                state, metrics = step_idx_fn(state, data_dev, batch)
            else:
                state, metrics = step_fn(state, place(batch - 0.5))
            if log_fn and ((i + 1) % log_every == 0 or i + 1 == steps_per_epoch):
                m = jax.device_get(metrics)
                log_fn(
                    f"[{epoch}/{epochs}][{i}/{steps_per_epoch}]: "
                    f"loss {m['loss']:.3f} loss_eq {m['vq_loss']:.3f} "
                    f"loss_rec {m['real_recon_loss']:.3f}"
                )
        if log_fn:
            log_fn(
                f"epoch {epoch} done in {time.time() - t0:.1f}s "
                f"({steps_per_epoch / max(time.time() - t0, 1e-9):.1f} it/s)"
            )
        if epoch_callback:
            epoch_callback(epoch, state)
    return state
