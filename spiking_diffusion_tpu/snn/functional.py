"""Graph-wide SNN utilities — spikingjelly ``functional.py`` equivalents.

What transfers and what doesn't, by design:
  * ``reset_net`` / ``set_step_mode`` / ``set_backend`` / ``detach_net`` —
    intentionally absent: state is a scan carry created per call, the time
    axis is explicit, the backend is a constructor argument, and detaching
    is ``jax.lax.stop_gradient`` at the use site.
  * ``seq_to_ann_forward`` -> :func:`spiking_diffusion_tpu.snn.temporal.seq_apply`.
  * ``multi_step_forward`` -> ``lax.scan`` (``lif_scan`` etc.).
  * conv-BN fusion (``functional.py:691-927``) -> :func:`fuse_conv_bn` /
    :func:`fuse_model_conv_bn`: fold trained BatchNorm statistics into conv
    kernels for inference (one fewer elementwise pass per block; on TPU
    this also removes an HBM round-trip between conv and BN).
  * TET loss (``functional.py:1129-1160``) -> :func:`temporal_efficient_loss`.
  * ``kaiming_normal_init_with_gain``-style helpers are in models.layers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def fuse_conv_bn(
    kernel: jax.Array,
    bias: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Fold BN(conv(x)) into a single conv.

    kernel: (kh, kw, cin, cout) flax layout; all BN params per-cout.
    Returns (fused_kernel, fused_bias):
        w' = w * gamma / sqrt(var + eps);  b' = (b - mean) * s + beta.
    """
    s = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * s, (bias - bn_mean) * s + bn_bias


def fuse_model_conv_bn(variables: Dict[str, Any], eps: float = 1e-5) -> Dict[str, Any]:
    """Fuse every adjacent (SeqConv_i, SeqBatchNorm_i) / (poisson_conv,
    poisson_bn) pair in a model's variables for inference.

    Returns new variables where each fused BN becomes an identity
    (scale=1, bias=0, mean=0, var=1) and the conv absorbs it. Works on the
    models in this framework, whose blocks follow the conv->BN->LIF naming
    convention.
    """
    import copy

    params = jax.tree.map(lambda x: x, variables["params"])  # shallow-ish copy
    stats = jax.tree.map(lambda x: x, variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return
        names = list(p_node.keys())
        for name in names:
            # pair SeqConv_i with SeqBatchNorm_i, poisson_conv with poisson_bn
            if name.startswith("SeqConv_"):
                bn = "SeqBatchNorm_" + name.split("_")[-1]
            elif name == "poisson_conv":
                bn = "poisson_bn"
            else:
                bn = None
            if (
                bn is not None
                and bn in p_node
                and isinstance(s_node, dict)
                and bn in s_node
            ):
                conv_p = p_node[name]
                # descend to the inner flax Conv/BatchNorm leaves
                conv_key = next(iter(conv_p.keys()))  # 'Conv_0'
                bn_p = p_node[bn]
                bn_key = next(iter(bn_p.keys()))  # 'BatchNorm_0'
                bn_s = s_node[bn][bn_key]
                k, b = fuse_conv_bn(
                    conv_p[conv_key]["kernel"],
                    conv_p[conv_key].get(
                        "bias", jnp.zeros(conv_p[conv_key]["kernel"].shape[-1])
                    ),
                    bn_p[bn_key]["scale"],
                    bn_p[bn_key]["bias"],
                    bn_s["mean"],
                    bn_s["var"],
                    eps,
                )
                conv_p[conv_key]["kernel"] = k
                conv_p[conv_key]["bias"] = b
                bn_p[bn_key]["scale"] = jnp.ones_like(bn_p[bn_key]["scale"])
                bn_p[bn_key]["bias"] = jnp.zeros_like(bn_p[bn_key]["bias"])
                bn_s["mean"] = jnp.zeros_like(bn_s["mean"])
                bn_s["var"] = jnp.ones_like(bn_s["var"])
        for name, child in p_node.items():
            if isinstance(child, dict):
                s_child = s_node.get(name, {}) if isinstance(s_node, dict) else {}
                walk(child, s_child)

    # deep-copy mutable dicts (frozen dicts already converted by tree.map?)
    params = _to_mutable(params)
    stats = _to_mutable(stats)
    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def folded_conv_params(variables: Dict[str, Any], n_blocks: int):
    """BN-folded (kernel, bias) per ``SeqConv_i``, i in [0, n_blocks).

    Shared weight-walk for every consumer of eval-time conv+BN folding
    (the sampling megakernel, the Lava netx exporter): fold with
    :func:`fuse_model_conv_bn`, then pull each block's flax kernel
    (kh, kw, cin, cout) and bias out of the conv->BN naming convention.
    """
    fused = fuse_model_conv_bn(variables)
    params = fused["params"]
    out = []
    for i in range(n_blocks):
        node = params[f"SeqConv_{i}"]
        inner = node[next(iter(node))]
        k = inner["kernel"]
        b = inner.get("bias", jnp.zeros((k.shape[-1],), jnp.float32))
        out.append((k, b))
    return out


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def temporal_efficient_loss(
    logits_seq: jax.Array,
    labels: jax.Array,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """TET loss: mean over T of the per-step loss on (T, N, C) outputs
    instead of one loss on the time-mean (``functional.py:1129-1160``)."""
    if loss_fn is None:
        import optax

        loss_fn = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
            lg, lb
        ).mean()
    per_step = jax.vmap(lambda lg: loss_fn(lg, labels))(logits_seq)
    return jnp.mean(per_step)


def chunked_scan(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, jax.Array]],
    init: Any,
    x_seq: jax.Array,
    chunk: int,
) -> Tuple[Any, jax.Array]:
    """Scan over T in rematerialized chunks.

    Parity: ``functional.chunk_multi_step_forward`` (``functional.py:567``),
    which processes long sequences in pieces to bound memory. Here each
    chunk is wrapped in ``jax.checkpoint`` so the backward pass recomputes
    within-chunk activations instead of storing all T steps — the scan
    carry (membranes) is the only cross-chunk state.
    """
    t = x_seq.shape[0]
    if t % chunk:
        raise ValueError(f"T={t} not divisible by chunk={chunk}")

    @jax.checkpoint
    def run_chunk(carry, x_chunk):
        return jax.lax.scan(step_fn, carry, x_chunk)

    x_chunks = x_seq.reshape((t // chunk, chunk) + x_seq.shape[1:])
    carry, ys = jax.lax.scan(run_chunk, init, x_chunks)
    return carry, ys.reshape((t,) + ys.shape[2:])


def delay(x_seq: jax.Array, steps: int) -> jax.Array:
    """Time-shift a (T, ...) sequence by ``steps``, zero-padding the front
    (spikingjelly ``layer.Delay``)."""
    if steps == 0:
        return x_seq
    pad = jnp.zeros((steps,) + x_seq.shape[1:], x_seq.dtype)
    return jnp.concatenate([pad, x_seq[:-steps]], axis=0)
