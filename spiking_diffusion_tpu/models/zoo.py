"""Pretrained-style SNN model zoo — spikingjelly ``model/`` parity.

Compact flax rebuilds of the reference classification families
(``spikingjelly/activation_based/model/``):
  * :class:`SpikingVGG` (``spiking_vgg.py``) — VGG convs with BN+LIF.
  * :class:`SpikingResNet` (``spiking_resnet.py``) — standard ResNet basic
    blocks with LIF activations (spiking input to every conv).
  * :class:`SEWResNet` (``sew_resnet.py``) — Spike-Element-Wise residuals:
    both branches emit spikes, combined with g in {ADD, AND, IAND}.
  * :class:`PLIFNet` (``parametric_lif_net.py``) — the Conv+BN+PLIF+pool
    MNIST net with a voting readout.

All operate on (T, N, H, W, C) spike/analog sequences and rate-decode
logits as the mean over T. ``train_classifier`` is the
``train_classify.py`` analogue: a jitted AdamW loop with rate or TET loss.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.models.layers import (
    LIF,
    SeqBatchNorm,
    SeqConv,
    SeqLinear,
    SeqMaxPool,
    VotingLayer,
)
from spiking_diffusion_tpu.snn.neuron import NeuronParams, plif_scan

VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
}


class SpikingVGG(nn.Module):
    """VGG backbone with Conv+BN+LIF blocks; rate-decoded classifier."""

    cfg: Tuple = VGG_CFGS["vgg11"]
    num_classes: int = 10
    params_lif: NeuronParams = NeuronParams()
    backend: str = "auto"

    @nn.compact
    def __call__(self, x_seq: jax.Array, train: bool = True) -> jax.Array:
        h = x_seq
        for v in self.cfg:
            if v == "M":
                h = SeqMaxPool(2)(h)
            else:
                h = SeqConv(int(v), 3, 1, 1)(h)
                h = SeqBatchNorm(use_running_average=not train)(h)
                h = LIF(params=self.params_lif, backend=self.backend)(h, train=train)
        h = h.reshape(h.shape[0], h.shape[1], -1)
        h = SeqLinear(self.num_classes)(h)
        return jnp.mean(h, axis=0)  # rate decode


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1
    params_lif: NeuronParams = NeuronParams()
    backend: str = "auto"
    sew: Optional[str] = None  # None = spiking_resnet; 'ADD'/'AND'/'IAND'

    @nn.compact
    def __call__(self, x_seq: jax.Array, train: bool = True) -> jax.Array:
        identity = x_seq
        h = SeqConv(self.features, 3, self.strides, 1, use_bias=False)(x_seq)
        h = SeqBatchNorm(use_running_average=not train)(h)
        h = LIF(params=self.params_lif, backend=self.backend)(h, train=train)
        h = SeqConv(self.features, 3, 1, 1, use_bias=False)(h)
        h = SeqBatchNorm(use_running_average=not train)(h)

        if self.strides != 1 or identity.shape[-1] != self.features:
            identity = SeqConv(
                self.features, 1, self.strides, 0, use_bias=False
            )(identity)
            identity = SeqBatchNorm(use_running_average=not train)(identity)
            if self.sew is not None:
                identity = LIF(params=self.params_lif, backend=self.backend)(
                    identity, train=train
                )

        if self.sew is None:
            # spiking_resnet: analog residual add, then spike
            return LIF(params=self.params_lif, backend=self.backend)(
                h + identity, train=train
            )
        # SEW: spike both branches, combine element-wise (sew_resnet.py)
        s = LIF(params=self.params_lif, backend=self.backend)(h, train=train)
        if self.sew == "ADD":
            return s + identity
        if self.sew == "AND":
            return s * identity
        if self.sew == "IAND":
            return (1.0 - s) * identity
        raise ValueError(f"unknown SEW function {self.sew!r}")


class SpikingResNet(nn.Module):
    """ResNet-style spiking classifier (resnet18-ish when stages=(2,2,2,2))."""

    stages: Tuple[int, ...] = (2, 2)
    width: int = 64
    num_classes: int = 10
    params_lif: NeuronParams = NeuronParams()
    backend: str = "auto"
    sew: Optional[str] = None

    @nn.compact
    def __call__(self, x_seq: jax.Array, train: bool = True) -> jax.Array:
        h = SeqConv(self.width, 3, 1, 1, use_bias=False)(x_seq)
        h = SeqBatchNorm(use_running_average=not train)(h)
        h = LIF(params=self.params_lif, backend=self.backend)(h, train=train)
        feats = self.width
        for i, blocks in enumerate(self.stages):
            for b in range(blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                h = _BasicBlock(
                    feats, strides, self.params_lif, self.backend, self.sew
                )(h, train=train)
            feats *= 2
        # global average pool over H, W
        h = jnp.mean(h, axis=(2, 3))  # (T, N, C)
        h = SeqLinear(self.num_classes)(h)
        return jnp.mean(h, axis=0)


def SEWResNet(*args, sew: str = "ADD", **kwargs) -> SpikingResNet:
    """Spike-Element-Wise ResNet constructor (``sew_resnet.py``)."""
    return SpikingResNet(*args, sew=sew, **kwargs)


class PLIFNet(nn.Module):
    """Parametric-LIF MNIST net (``parametric_lif_net.py:1-231``):
    {Conv3x3+BN+PLIF+MaxPool} x2 -> flatten -> FC+PLIF -> FC -> voting."""

    channels: int = 128
    num_classes: int = 10
    voting_size: int = 10
    init_tau: float = 2.0

    @nn.compact
    def __call__(self, x_seq: jax.Array, train: bool = True) -> jax.Array:
        # sigmoid(w) = 1/tau  =>  w = -log(tau - 1)
        w_init = -float(np.log(self.init_tau - 1.0))

        def plif(h):
            w = self.param(
                f"plif_w_{plif.counter}",
                nn.initializers.constant(w_init), (),
            )
            plif.counter += 1
            s, _ = plif_scan(h, w)
            return s

        plif.counter = 0

        h = x_seq
        for _ in range(2):
            h = SeqConv(self.channels, 3, 1, 1)(h)
            h = SeqBatchNorm(use_running_average=not train)(h)
            h = plif(h)
            h = SeqMaxPool(2)(h)
        h = h.reshape(h.shape[0], h.shape[1], -1)
        h = SeqLinear(self.num_classes * self.voting_size)(h)
        h = plif(h)
        h = VotingLayer(self.voting_size)(h)
        return jnp.mean(h, axis=0)


def train_classifier(
    model,
    images: np.ndarray,
    labels: np.ndarray,
    num_steps: int = 4,
    epochs: int = 1,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_fn: Optional[Callable[[str], None]] = None,
):
    """Minimal ``train_classify.py`` analogue: direct-coded input, AdamW,
    CE on rate-decoded logits. Returns (variables, final accuracy on the
    training data)."""
    import optax

    from spiking_diffusion_tpu.snn.encoding import direct_encode

    key = jax.random.PRNGKey(seed)
    x0 = direct_encode(jnp.asarray(images[:2]), num_steps)
    variables = model.init(key, x0, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                direct_encode(x, num_steps), train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            return loss, (mut["batch_stats"], logits)

        (loss, (bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return optax.apply_updates(params, updates), bs, opt_state, loss, acc

    n = images.shape[0]
    acc = 0.0
    for epoch in range(epochs):
        order = np.random.RandomState(seed + epoch).permutation(n)
        for i in range(0, n - n % batch_size, batch_size):
            idx = order[i : i + batch_size]
            params, batch_stats, opt_state, loss, acc = step(
                params, batch_stats, opt_state,
                jnp.asarray(images[idx]), jnp.asarray(labels[idx]),
            )
        if log_fn:
            log_fn(f"epoch {epoch}: loss {float(loss):.4f} acc {float(acc):.3f}")
    return {"params": params, "batch_stats": batch_stats}, float(acc)
