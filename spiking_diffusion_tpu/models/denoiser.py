"""Spiking conv denoiser for the absorbing discrete diffusion prior.

Parity target: ``DummyModel`` (``snn_model/vq_diffusion.py:150-208``):
the (N, 7, 7) float token map plus a per-sample timestep broadcast as a
second channel, direct-coded to T=16 steps, pushed through 5 Conv+BN+LIF
blocks (2->64->128->256->512->256) with a U-Net-style skip cat(x5, x1) on
the channel axis, a bare conv to ``num_embeddings`` logits, and a firing-
rate decode (mean over T).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.config import DiffusionConfig
from spiking_diffusion_tpu.models.layers import LIF, SeqBatchNorm, SeqConv
from spiking_diffusion_tpu.ops.bn_lif import bn_lif
from spiking_diffusion_tpu.profiling import syops as _syops
from spiking_diffusion_tpu.snn.encoding import direct_encode


class SpikingDenoiser(nn.Module):
    """(N, h, w) token map + (N,) timestep -> (N, h, w, K) logits."""

    cfg: DiffusionConfig
    backend: str = "auto"
    dtype: jnp.dtype = None  # e.g. jnp.bfloat16 for inference
    # SyncBN: mesh axis name for cross-device BN statistics. Set when the
    # train step runs inside shard_map (the Pallas 'bnlif' backend is
    # opaque to GSPMD, so its data-parallel path is explicit shard_map +
    # pmean-synced BN — train/stage2.make_train_step_diffusion_dp).
    bn_axis_name: str = None

    @nn.compact
    def __call__(
        self, x_tokens: jax.Array, t: jax.Array, train: bool = True
    ) -> jax.Array:
        c = self.cfg
        p = c.lif.to_params()
        x = x_tokens.astype(jnp.float32)[..., None]  # (N, h, w, 1)
        t_map = jnp.broadcast_to(
            t.astype(jnp.float32)[:, None, None, None], x.shape
        )
        x = jnp.concatenate([x, t_map], axis=-1)  # (N, h, w, 2)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # direct coding: the T axis is a pure repeat (``vq_diffusion.py:198``)
        # so the FIRST Conv+BN runs once on a length-1 time axis and is
        # broadcast into the LIF — identical math (BN stats over T*N of
        # repeats equal stats over N) at 1/T of the first block's conv work
        x_seq = direct_encode(x, 1)  # (1, N, h, w, 2)

        fused_bnlif = self.backend in ("bnlif", "bnlifconv")
        # 'bnlifconv': also run every 3x3 conv through the Pallas
        # masked-shift TRAINING kernel (ops/spike_conv), which emits the
        # per-channel BN moments in-kernel — BatchNorm then never re-reads
        # the conv output from HBM (moments=).
        fused_conv = self.backend == "bnlifconv"
        feats = []
        h = x_seq
        for i, ch in enumerate(c.denoiser_channels):
            moments = None
            if fused_conv:
                # moments only matter in training (eval BN reads running
                # stats), so eval skips the in-kernel accumulation
                h, s1, s2 = SeqConv(ch, kernel_size=3, strides=1,
                                    padding=1, dtype=self.dtype,
                                    fused_train=True)(h, with_moments=train)
                if train:
                    # stats count: elements per channel of THIS stack
                    # (block 0 runs on a length-1 time axis; repeats don't
                    # change mean/var, so the length-1 moments are the
                    # T-broadcast statistics exactly)
                    moments = (s1, s2, h.size // h.shape[-1])
            else:
                h = SeqConv(ch, kernel_size=3, strides=1, padding=1,
                            dtype=self.dtype)(h)
            if fused_bnlif:
                # fused BN-apply+LIF Pallas kernel (ops/bn_lif.py): the
                # stats (and running updates) stay in SeqBatchNorm; the
                # normalization application + T-step recurrence run in
                # one VMEM-resident kernel. Block 0's length-1 time axis
                # is broadcast INSIDE the kernel (t_out) — same math as
                # the jnp.broadcast_to below, zero extra HBM traffic.
                sc, sh = SeqBatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    axis_name=self.bn_axis_name,
                )(h, return_affine=True, moments=moments)
                h = bn_lif(h, sc, sh, p,
                           t_out=c.num_steps if i == 0 else None)
                self.sow("syops", "counters",
                         _syops.neuron_entry(h, h))
            else:
                h = SeqBatchNorm(use_running_average=not train,
                                 dtype=self.dtype,
                                 axis_name=self.bn_axis_name)(h)
                if i == 0:
                    h = jnp.broadcast_to(h, (c.num_steps,) + h.shape[1:])
                h = LIF(params=p, backend=self.backend)(h, train=train)
            feats.append(h)

        # U-Net style skip: cat(last, first) on channels
        # (``vq_diffusion.py:205``: torch.cat((x5, x1), dim=2) with dim 2 ==
        # channel axis of (T,N,C,H,W))
        h = jnp.concatenate([feats[-1], feats[0]], axis=-1)
        if fused_conv:
            h, _, _ = SeqConv(c.num_embeddings, kernel_size=3, strides=1,
                              padding=1, dtype=self.dtype,
                              fused_train=True)(h, with_moments=False)
        else:
            h = SeqConv(c.num_embeddings, kernel_size=3, strides=1,
                        padding=1, dtype=self.dtype)(h)

        # firing-rate decode over T (``vq_diffusion.py:206``); logits fp32
        return (jnp.sum(h, axis=0) / c.num_steps).astype(jnp.float32)
