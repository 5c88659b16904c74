"""Step-aware flax.linen layers over (T, N, H, W, C) sequences.

TPU-native equivalent of spikingjelly ``activation_based/layer.py``: the
reference wraps ``nn.Conv2d``/``BatchNorm2d``/``Linear`` with a ``step_mode``
switch that time-flattens (T,N,...) -> (T*N,...) before the stateless op
(``layer.py:164-173,459-466,900-924``). Here the flattening is
:func:`spiking_diffusion_tpu.snn.temporal.seq_apply`, and the layout is
channels-last NHWC (what the TPU conv units want) instead of torch NCHW.

BatchNorm statistics are computed over T*N jointly — a reference behavior
the rebuild must match (SURVEY.md L2).

Initializers mirror torch defaults (kaiming_uniform(a=sqrt(5)) for kernels,
uniform(+-1/sqrt(fan_in)) for biases, N(0,1) for embeddings) so training
dynamics are comparable with the reference even though no weights are
ported.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_multi_step
from spiking_diffusion_tpu.snn.temporal import seq_apply
from spiking_diffusion_tpu.profiling import syops as _syops

# re-exported from utils.init (kept here for the public API surface)
from spiking_diffusion_tpu.utils.init import (  # noqa: F401
    torch_bias_init,
    torch_kernel_init,
)


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv``: declares the identical
    ``kernel``/``bias`` variables (same shapes, inits, fp32 param dtype)
    without computing anything. Named ``Conv_0`` inside SeqConv so the
    checkpoint tree is byte-identical whether the conv runs through XLA
    (`nn.Conv`) or the Pallas training kernel (``ops/spike_conv``)."""

    features: int
    kernel: Tuple[int, int]
    in_ch: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", torch_kernel_init,
            self.kernel + (self.in_ch, self.features), jnp.float32,
        )
        b = None
        if self.use_bias:
            fan_in = self.in_ch * self.kernel[0] * self.kernel[1]
            b = self.param(
                "bias", torch_bias_init(fan_in), (self.features,),
                jnp.float32,
            )
        return k, b


class SeqConv(nn.Module):
    """Conv2d over a (T, N, H, W, C) sequence, time folded into batch.

    ``padding`` is torch-style symmetric int padding (explicit, so spatial
    alignment matches the reference exactly rather than XLA-'SAME').

    ``fused_train=True`` (3x3 / stride 1 / pad 1 only) computes the conv
    with the Pallas masked-shift training kernel (``ops/spike_conv``) and
    returns ``(y_seq, s1, s2)`` — the per-channel BN moments accumulated
    in-kernel, to feed ``SeqBatchNorm(moments=...)``. Parameters live
    under the same ``Conv_0`` scope either way (checkpoints
    interchangeable; asserted in tests/test_denoiser_fusedconv.py).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    fused_train: bool = False

    @nn.compact
    def __call__(self, x_seq: jax.Array, with_moments: bool = True):
        k = _pair(self.kernel_size)
        p = _pair(self.padding)
        in_ch = x_seq.shape[-1]
        fan_in = in_ch * k[0] * k[1]
        if self.fused_train:
            if k != (3, 3) or _pair(self.strides) != (1, 1) or p != (1, 1):
                raise ValueError(
                    "fused_train supports 3x3 / stride 1 / pad 1 only"
                )
            from spiking_diffusion_tpu.ops.spike_conv import spike_conv3x3

            kernel, bias = _ConvParams(
                self.features, k, in_ch, self.use_bias, name="Conv_0"
            )()
            x = x_seq if self.dtype is None else x_seq.astype(self.dtype)
            y_seq, s1, s2 = spike_conv3x3(
                x, kernel, bias, with_moments=with_moments
            )
            ops = float(y_seq.size) * k[0] * k[1] * in_ch + (
                float(y_seq.size) if self.use_bias else 0.0
            )
            self.sow("syops", "counters", _syops.classify(ops, x_seq))
            return y_seq, s1, s2
        conv = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.strides),
            padding=(p, p) if isinstance(self.padding, int) else p,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )
        y_seq = seq_apply(conv, x_seq)
        # syops accounting: k*k*Cin*Cout per output element (+ bias), split
        # into ACs/MACs by input spike-ness; DCE'd unless 'syops' is
        # requested (see profiling.syops)
        ops = float(y_seq.size) * k[0] * k[1] * in_ch + (
            float(y_seq.size) if self.use_bias else 0.0
        )
        self.sow("syops", "counters", _syops.classify(ops, x_seq))
        return y_seq


class SeqConvTranspose(nn.Module):
    """ConvTranspose2d over (T, N, H, W, C) with torch semantics.

    torch output size: (H-1)*stride - 2*padding + kernel + output_padding.
    Implemented as ``lax.conv_transpose`` with explicit padding
    (lo = k-1-p, hi = k-1-p+output_padding), which reproduces it exactly.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        k = _pair(self.kernel_size)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        pad = tuple(
            (k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(2)
        )
        # torch ConvTranspose2d fan_in for init = out_channels * prod(kernel)
        # (weight shape is (in, out, kH, kW); kaiming uses fan_in from dim 1)
        fan_in = self.features * k[0] * k[1]
        conv = nn.ConvTranspose(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.strides),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )
        y_seq = seq_apply(conv, x_seq)
        in_ch = x_seq.shape[-1]
        ops = float(y_seq.size) * k[0] * k[1] * in_ch + (
            float(y_seq.size) if self.use_bias else 0.0
        )
        self.sow("syops", "counters", _syops.classify(ops, x_seq))
        return y_seq


class BatchNorm(nn.Module):
    """Variable-compatible stand-in for ``flax.linen.BatchNorm`` that can
    hand back the folded per-channel affine instead of applying it.

    Same variable layout (params ``scale``/``bias``, batch_stats
    ``mean``/``var``), same fp32 fast-variance statistics, same running
    update ``ra = m * ra + (1-m) * new`` — checkpoints are interchangeable
    with the flax module (asserted bit-exactly in tests/test_layers.py).
    Exists so :func:`ops.bn_lif.bn_lif` can fuse the application into the
    LIF kernel: ``y = x * scale_eff + shift_eff`` with
    ``scale_eff = gamma * rsqrt(var + eps)``,
    ``shift_eff = beta - mean * scale_eff``.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    # cross-device statistics sync (SyncBN): when set, batch mean and
    # E[x^2] are pmean-ed over the named mesh axis before the variance is
    # formed — inside ``shard_map`` over equal-size batch shards this
    # reproduces the single-device T*N-joint statistics exactly (same
    # convention as flax.linen.BatchNorm's axis_name).
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, return_affine: bool = False, moments=None):
        feat = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if moments is not None:
                # pre-accumulated per-channel (sum, sum-of-squares, count)
                # — from a producer kernel (ops/spike_conv) that already
                # reduced its output in VMEM, so BN never re-reads x.
                s1, s2, count = moments
                mean = s1.astype(jnp.float32) / count
                msq = s2.astype(jnp.float32) / count
            else:
                xf = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axes)
                msq = jnp.mean(xf * xf, axes)
            # during init the module runs outside shard_map (no bound
            # mesh axis) — local stats only, same as flax BatchNorm
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                msq = jax.lax.pmean(msq, self.axis_name)
            # flax use_fast_variance (its default): E[x^2] - E[x]^2,
            # clipped at 0 against round-off
            var = jnp.maximum(0.0, msq - jnp.square(mean))
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var
                )
        scale_eff = gamma * jax.lax.rsqrt(var + self.epsilon)
        shift_eff = beta - mean * scale_eff
        if return_affine:
            return scale_eff, shift_eff
        # unfused application mirrors flax._normalize exactly: ALL
        # arithmetic in fp32 (mean/var/params are fp32, so x promotes),
        # multiplier built first, and only the final result cast to
        # dtype — bit-identical rounding to the flax module
        mul = jax.lax.rsqrt(var + self.epsilon) * gamma
        y = (x - mean) * mul + beta  # fp32 (params are fp32)
        return y if self.dtype is None else y.astype(self.dtype)


class SeqBatchNorm(nn.Module):
    """BatchNorm over (T, N, ...) with statistics over T*N jointly.

    Parity: spikingjelly ``layer.BatchNorm2d`` in 'm' step mode
    (``layer.py:459-466``) — flatten T into batch, then standard BN.
    torch defaults: eps=1e-5, momentum=0.1 (== flax momentum 0.9).

    ``return_affine=True`` computes statistics (and updates running
    stats) but returns the folded per-channel ``(scale, shift)`` fp32
    pair instead of the normalized stack — the application then happens
    inside the fused BN+LIF kernel (``ops/bn_lif.py``), saving a full
    HBM pass over the stack.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None  # SyncBN over a shard_map mesh axis

    @nn.compact
    def __call__(
        self,
        x_seq: jax.Array,
        use_running_average: Optional[bool] = None,
        return_affine: bool = False,
        moments=None,
    ):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        bn = BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )
        # affine BN: 2 ops per element (``syops/ops.py:105-118``)
        self.sow(
            "syops", "counters", _syops.classify(2.0 * x_seq.size, x_seq)
        )
        if return_affine:
            if moments is not None:
                # stats come pre-reduced (fused-conv moments); x_seq is
                # only consulted for the channel count
                return bn(x_seq[0, :1], return_affine=True,
                          moments=moments)
            t = x_seq.shape[0]
            flat = x_seq.reshape((t * x_seq.shape[1],) + x_seq.shape[2:])
            return bn(flat, return_affine=True)
        return seq_apply(bn, x_seq)


class SeqLinear(nn.Module):
    """Linear over the trailing axis of a (T, N, ..., F) sequence."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        fan_in = x_seq.shape[-1]
        dense = nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )
        y_seq = dense(x_seq)
        # linear: prod(in.shape) * out_features (+ out_features if bias),
        # matching ``syops/ops.py:77-90``
        ops = float(x_seq.size) * self.features + (
            float(self.features) if self.use_bias else 0.0
        )
        self.sow("syops", "counters", _syops.classify(ops, x_seq))
        return y_seq


class SeqMaxPool(nn.Module):
    """MaxPool2d over (T, N, H, W, C) (spikingjelly ``layer.MaxPool2d``)."""

    window: int = 2
    strides: Optional[int] = None

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        s = self.strides or self.window
        return seq_apply(
            lambda x: nn.max_pool(x, (self.window, self.window), (s, s)), x_seq
        )


class SeqAvgPool(nn.Module):
    """AvgPool2d over (T, N, H, W, C) (spikingjelly ``layer.AvgPool2d``)."""

    window: int = 2
    strides: Optional[int] = None

    @nn.compact
    def __call__(self, x_seq: jax.Array) -> jax.Array:
        s = self.strides or self.window
        return seq_apply(
            lambda x: nn.avg_pool(x, (self.window, self.window), (s, s)), x_seq
        )


class SeqDropout(nn.Module):
    """Dropout with the mask FROZEN across the T axis.

    Parity: spikingjelly ``layer.Dropout`` (``layer.py:1047-1142``) samples
    one mask per forward and reuses it for all timesteps (an SNN-specific
    behavior — per-step masks would break temporal spike statistics).
    """

    rate: float = 0.5
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x_seq: jax.Array, deterministic: Optional[bool] = None
    ) -> jax.Array:
        det = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if det or self.rate == 0.0:
            return x_seq
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x_seq.shape[1:])
        return x_seq * mask / keep


class VotingLayer(nn.Module):
    """Average-pool the class axis in groups of ``voting_size``
    (spikingjelly ``layer.VotingLayer``): (..., C*k) -> (..., C)."""

    voting_size: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1] // self.voting_size
        return jnp.mean(
            x.reshape(x.shape[:-1] + (c, self.voting_size)), axis=-1
        )


class LIF(nn.Module):
    """LIF spiking activation over a (T, N, ...) sequence.

    A stateless linen wrapper over the functional neuron: the membrane is a
    scan carry inside :func:`lif_multi_step`, created fresh per call — the
    moral opposite of spikingjelly's ``MemoryModule``+``reset_net``.
    """

    params: NeuronParams = NeuronParams()
    backend: str = "auto"

    @nn.compact
    def __call__(self, x_seq: jax.Array, train: bool = True) -> jax.Array:
        s_seq = lif_multi_step(
            x_seq, params=self.params, backend=self.backend, train=train
        )
        self.sow("syops", "counters", _syops.neuron_entry(x_seq, s_seq))
        return s_seq
