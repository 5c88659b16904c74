"""Feature extractors for the generative metrics.

The reference scores IS/FID/KID with torchvision's pretrained InceptionV3
(``metric/IS_score.py``, ``metric/Fid_score.py``). This build environment
has no network egress, so pretrained Inception weights cannot be fetched;
the framework therefore ships:

  * :class:`LeNet` — the reference's own mode-coverage classifier
    (``classify.py:18-54``: conv 1->6 (k5, pad 2) -> avgpool -> conv 6->16
    (k5) -> avgpool -> 120 -> 84 -> classes), trainable in seconds on the
    target datasets; its penultimate layer doubles as the FID/KID feature
    space and its softmax as the IS class distribution.
  * a pluggable ``FeatureFn`` protocol so an InceptionV3 (JAX port +
    converted weights placed at a known path) can be dropped in for
    paper-comparable numbers without touching the metric code.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from spiking_diffusion_tpu.models.layers import torch_bias_init, torch_kernel_init

# (images uint8/float (N,H,W,C)) -> (features (N,D), probs (N,classes))
FeatureFn = Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]


class LeNet(nn.Module):
    """LeNet-5 as in the reference's ``classify.py:18-54``."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False):
        # x: (N, 28, 28, 1) float in [0, 1]
        x = nn.Conv(6, (5, 5), padding=((2, 2), (2, 2)),
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(25))(x)
        x = jnp.maximum(x, 0.0)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), padding="VALID",
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(6 * 25))(x)
        x = jnp.maximum(x, 0.0)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(120, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]))(x)
        x = jnp.maximum(x, 0.0)
        feats = nn.Dense(84, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(120))(x)
        x = jnp.maximum(feats, 0.0)
        logits = nn.Dense(self.num_classes, kernel_init=torch_kernel_init,
                          bias_init=torch_bias_init(84))(x)
        if return_features:
            return logits, feats
        return logits


def train_lenet(
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    epochs: int = 3,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_fn: Optional[Callable[[str], None]] = None,
):
    """Train a LeNet classifier; returns (model, params).

    Parity: ``classify.py:56-101`` (Adam 1e-3, CE loss).
    """
    model = LeNet(num_classes=num_classes)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1,) + images.shape[1:]))["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    # whole dataset device-resident, batches gathered ON device: one host
    # upload instead of one per step (the remote-TPU tunnel moves ~35 MB/s
    # — per-step 200 KB copies would dominate the training time). The data
    # MUST be an explicit jit argument: closing over a large array bakes
    # it into the HLO as a constant and stalls compilation.
    data_dev = jax.device_put(jnp.asarray(images, jnp.float32))
    labels_dev = jax.device_put(jnp.asarray(labels, jnp.int32))

    @jax.jit
    def step(params, opt_state, data, labels_d, idx):
        x = jnp.take(data, idx, axis=0)
        y = jnp.take(labels_d, idx, axis=0)

        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = images.shape[0]
    if n < batch_size:
        batch_size = max(n, 1)
    loss = jnp.zeros(())
    for epoch in range(epochs):
        order = np.random.RandomState(seed + epoch).permutation(n)
        for i in range(0, n - n % batch_size, batch_size):
            idx = order[i : i + batch_size].astype(np.int32)
            params, opt_state, loss = step(params, opt_state, data_dev,
                                           labels_dev, jnp.asarray(idx))
        if log_fn:
            log_fn(f"lenet epoch {epoch}: loss {float(loss):.4f}")
    return model, params


def lenet_feature_fn(model: LeNet, params) -> FeatureFn:
    """Wrap a trained LeNet as a FeatureFn for FID/IS/KID."""

    @jax.jit
    def fwd(x):
        logits, feats = model.apply(
            {"params": params}, x, return_features=True
        )
        return feats, jax.nn.softmax(logits, axis=-1)

    def fn(images: np.ndarray, batch_size: int = 512):
        x = np.asarray(images, np.float32)
        if x.max() > 1.5:  # uint8 range
            x = x / 255.0
        if x.ndim == 3:
            x = x[..., None]
        feats, probs = [], []
        n = x.shape[0]
        pad = (-n) % batch_size
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        for i in range(0, x.shape[0], batch_size):
            f, p = fwd(jnp.asarray(x[i : i + batch_size]))
            feats.append(np.asarray(f))
            probs.append(np.asarray(p))
        feats = np.concatenate(feats)[:n]
        probs = np.concatenate(probs)[:n]
        return feats, probs

    return fn
