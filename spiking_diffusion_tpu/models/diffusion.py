"""Absorbing-state discrete diffusion over the VQ code grid.

Parity target: ``AbsorbingDiffusion`` (``snn_model/vq_diffusion.py:43-147``):
uniform-time masking corruption, masked-token cross-entropy training loss
(ELBO or reweighted ELBO), and a reverse sampler that progressively unmasks
tokens over ``num_timesteps`` steps.

TPU-native design: everything is a pure function of (params, key, data);
the reverse sampler is one ``lax.scan`` inside jit — 49 denoiser forwards
with zero host round-trips (the reference pays a device sync per step via
``torch.distributions.Categorical``, ``vq_diffusion.py:136-138``). Note the
reference also calls ``functional.reset_net`` between steps — here each
denoiser call starts with fresh membranes by construction.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.config import DiffusionConfig

# denoise_fn: (x_tokens (N,h,w) int, t (N,) int) -> logits (N,h,w,K)
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def sample_time(
    key: jax.Array, batch: int, num_timesteps: int
) -> Tuple[jax.Array, jax.Array]:
    """t ~ Uniform{1..T} per sample; pt = 1/T (``vq_diffusion.py:56-59``)."""
    t = jax.random.randint(key, (batch,), 1, num_timesteps + 1)
    pt = jnp.full((batch,), 1.0 / num_timesteps, jnp.float32)
    return t, pt


def q_sample(
    key: jax.Array, x_0: jax.Array, t: jax.Array, mask_id: int, num_timesteps: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Mask each token of x_0 (N,h,w) w.p. t/T; unmasked targets -> -1.

    Returns (x_t, x_0_ignore, mask) (``vq_diffusion.py:61-72``).
    """
    prob = (t.astype(jnp.float32) / num_timesteps)[:, None, None]
    mask = jax.random.uniform(key, x_0.shape) < prob
    x_t = jnp.where(mask, mask_id, x_0)
    x_0_ignore = jnp.where(mask, x_0, -1)
    return x_t, x_0_ignore, mask


def _masked_cross_entropy(
    logits: jax.Array, targets: jax.Array
) -> jax.Array:
    """Per-sample sum of token CE, ignoring targets == -1.

    logits (N, h, w, K); targets (N, h, w) in [-1, K).
    Parity: ``F.cross_entropy(..., ignore_index=-1, reduction='none').sum(1)``.
    """
    valid = targets >= 0
    safe = jnp.maximum(targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    tok_ce = jnp.where(valid, tok_ce, 0.0)
    return jnp.sum(tok_ce, axis=(1, 2))


def corrupt(
    key: jax.Array, x_0: jax.Array, cfg: DiffusionConfig
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Draw the training corruption for a batch: (x_t, t, pt, x_0_ignore).

    Split out of :func:`train_loss` so the data-parallel shard_map step
    can draw it on the GLOBAL batch (bitwise-identical to single-device)
    and then batch-shard the results into the per-device bodies.
    """
    kt, km = jax.random.split(key)
    t, pt = sample_time(kt, x_0.shape[0], cfg.num_timesteps)
    x_t, x_0_ignore, _ = q_sample(km, x_0, t, cfg.mask_id, cfg.num_timesteps)
    return x_t, t, pt, x_0_ignore


def per_sample_loss(
    denoise_fn: DenoiseFn,
    x_t: jax.Array,
    t: jax.Array,
    pt: jax.Array,
    x_0_ignore: jax.Array,
    cfg: DiffusionConfig,
) -> jax.Array:
    """(N,) per-sample loss given a drawn corruption.

    Parity: ``_train_loss`` (``vq_diffusion.py:75-101``): default
    'reweighted_elbo' = (1 - t/T) * CE / (ln2 * D);
    'elbo' = CE / t / pt / (ln2 * D).
    """
    d = x_t.shape[1] * x_t.shape[2]
    logits = denoise_fn(x_t, t)
    ce = _masked_cross_entropy(logits, x_0_ignore)
    tf = t.astype(jnp.float32)
    if cfg.loss_type == "elbo":
        return ce / tf / pt / (math.log(2) * d)
    if cfg.loss_type == "reweighted_elbo":
        return (1.0 - tf / cfg.num_timesteps) * ce / (math.log(2) * d)
    raise ValueError(f"unknown loss_type {cfg.loss_type!r}")


def train_loss(
    key: jax.Array,
    denoise_fn: DenoiseFn,
    x_0: jax.Array,
    cfg: DiffusionConfig,
) -> jax.Array:
    """Scalar diffusion training loss over a batch of code grids (N,h,w)."""
    x_t, t, pt, x_0_ignore = corrupt(key, x_0, cfg)
    return jnp.mean(per_sample_loss(denoise_fn, x_t, t, pt, x_0_ignore, cfg))


def sample(
    key: jax.Array,
    denoise_fn: DenoiseFn,
    cfg: DiffusionConfig,
    n_samples: int,
    temperature: float = 1.0,
    sample_steps: int | None = None,
    unmask_mode: str = "random",
    choice_temperature: float = 1.0,
    spacing: str = "linear",
) -> jax.Array:
    """Reverse sampler: all-mask start, progressive unmasking.

    Returns (n_samples, h, w) int32 code grids. One ``lax.scan`` over the
    reversed timesteps — fully on-device (``vq_diffusion.py:103-142``).

    ``sample_steps < num_timesteps`` visits a STRIDED subset of the full
    T-step schedule with renormalized unmask probabilities (not the naive
    truncation ``t = steps..1``, which starts from the wrong masked
    fraction and craters quality). Under the full schedule the masked
    fraction after processing step t telescopes to (t-1)/T (product of
    (1-1/s) for s = T..t), so visiting t_1=T > ... > t_k=1 must unmask
    with p_i = 1 - (t_i-1)/(t_{i-1}-1) and feed the denoiser
    t = t_{i-1}-1 — the timestep whose training-time masked fraction
    matches the sampler's actual input. With ``sample_steps == T`` this
    reduces bit-exactly to the reference's 1/t at input t.

    ``unmask_mode``:

    - ``'random'`` — the reference's scheme: each step unmasks a uniform
      random subset of still-masked positions (``vq_diffusion.py:118-124``).
    - ``'confidence'`` — MaskGIT-style (Chang et al. 2022, public): the
      positions to reveal are the ones whose sampled token the denoiser is
      most confident about (log-prob of the drawn token plus annealed
      Gumbel noise, scale ``choice_temperature * (t_in / T)``), with a
      DETERMINISTIC per-step reveal count that follows the same
      masked-fraction trajectory ``D * (t_i - 1) / T`` as the random
      schedule in expectation. At few steps this closes most of the
      quality gap: each step reveals many tokens at once, and revealing
      the confident ones keeps the joint draw coherent. Rank selection is
      a double-argsort over the D=h*w positions — static shapes, no
      top_k-with-traced-k inside the scan.
    """
    import numpy as np

    h = w = cfg.latent_size
    big_t = cfg.num_timesteps
    steps = big_t if sample_steps is None else min(int(sample_steps), big_t)
    if steps >= 2:
        u = np.linspace(0.0, 1.0, steps)
        if spacing == "cosine":
            # MaskGIT-style masked-fraction trajectory cos(pi/2 * u):
            # few reveals early (sparse context), many late
            frac = np.cos(0.5 * np.pi * u)
        elif spacing == "linear":
            frac = 1.0 - u
        else:
            raise ValueError(f"unknown spacing {spacing!r}")
        # visited t-values: masked fraction after step i is (t_i - 1)/T
        ts = np.unique(
            np.round(1.0 + frac * (big_t - 1.0)).astype(np.int64)
        )[::-1]
        ts[-1] = 1  # always finish fully unmasked
    else:
        ts = np.asarray([1], np.int64)  # one shot: unmask everything
    prev = np.concatenate([[big_t + 1], ts[:-1]])
    t_input = (prev - 1).astype(np.int64)  # first input = T; stride-1: = t
    # integer numerator keeps p == 1/t bit-exact in the stride-1 case
    p_unmask = (t_input - ts + 1).astype(np.float32) / t_input.astype(
        np.float32
    )
    d = h * w
    # deterministic reveal counts for confidence mode: masked count after
    # step i targets round(D * (t_i - 1) / T); starts at D, ends at 0
    tgt = np.round(d * (ts - 1) / big_t).astype(np.int64)
    n_reveal = np.concatenate([[d], tgt[:-1]]) - tgt
    schedule = (
        jnp.asarray(t_input, jnp.int32),
        jnp.asarray(p_unmask, jnp.float32),
        jnp.asarray(n_reveal, jnp.int32),
    )

    x_init = jnp.full((n_samples, h, w), cfg.mask_id, jnp.int32)
    unmasked_init = jnp.zeros((n_samples, h, w), jnp.bool_)

    def body(carry, sched):
        t_in, p, n_rev = sched
        key, x_t, unmasked = carry
        key, k_change, k_cat = jax.random.split(key, 3)
        t_vec = jnp.full((n_samples,), t_in, jnp.int32)
        logits = denoise_fn(x_t, t_vec)  # (N, h, w, K)
        x_0_hat = jax.random.categorical(k_cat, logits / temperature, axis=-1)

        if unmask_mode == "random":
            # where to unmask; never a position already unmasked
            # (``vq_diffusion.py:118-124``: xor/and dance == logical andnot)
            changes = jax.random.uniform(k_change, x_t.shape) < p
            changes = jnp.logical_and(changes, jnp.logical_not(unmasked))
        else:  # confidence
            logp = jax.nn.log_softmax(logits / temperature, axis=-1)
            tok_logp = jnp.take_along_axis(
                logp, x_0_hat[..., None], axis=-1
            )[..., 0]
            u = jax.random.uniform(
                k_change, x_t.shape, minval=1e-20, maxval=1.0
            )
            gumbel = -jnp.log(-jnp.log(u))
            anneal = choice_temperature * (
                t_in.astype(jnp.float32) / big_t
            )
            conf = tok_logp + anneal * gumbel
            conf = jnp.where(unmasked, -jnp.inf, conf)
            order = jnp.argsort(-conf.reshape(n_samples, d), axis=-1)
            rank = jnp.argsort(order, axis=-1)  # rank[pos] in 0..D-1
            changes = (rank < n_rev).reshape(n_samples, h, w)

        unmasked = jnp.logical_or(unmasked, changes)
        x_t = jnp.where(changes, x_0_hat.astype(jnp.int32), x_t)
        return (key, x_t, unmasked), None

    (_, x_final, _), _ = jax.lax.scan(
        body, (key, x_init, unmasked_init), schedule
    )
    return x_final


def pick_mask_id(mode: str, num_embeddings: int, first_batch: jax.Array) -> int:
    """mask_id selection (``main.py:212-223``): 'codebook_size' (default)
    uses K itself; 'max' the most common code in the first batch. The
    reference's 'min' mode is a known bug (assigns a *count* as the id,
    ``main.py:217-221``) — here 'min' selects the least common code value,
    the evident intent.
    """
    if mode == "codebook_size":
        return int(num_embeddings)
    flat = jnp.ravel(first_batch)
    counts = jnp.bincount(flat, length=num_embeddings)
    if mode == "max":
        return int(jnp.argmax(counts))
    if mode == "min":
        # least common among codes that appear; reference intent
        masked = jnp.where(counts > 0, counts, jnp.iinfo(jnp.int32).max)
        return int(jnp.argmin(masked))
    raise ValueError(f"unknown mask mode {mode!r}")
