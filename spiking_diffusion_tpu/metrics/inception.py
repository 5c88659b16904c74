"""InceptionV3 in flax — for paper-comparable FID/IS/KID.

Faithful port of the torchvision ``inception_v3`` architecture (the
feature extractor behind the reference's FID/IS,
``metric/Fid_score.py:34-95`` — Mixed_7c pooled activations (2048-d) — and
``metric/IS_score.py`` — class logits).

Pretrained weights cannot be downloaded in this environment (zero egress).
``load_torch_weights_npz`` ingests a locally-provided ``.npz`` produced by
:func:`convert_torchvision_state_dict` from a torchvision
``Inception_V3_Weights.IMAGENET1K_V1`` state_dict; with such a file the
metric numbers are directly comparable to the reference's. Without it the
LeNet feature space (metrics/features.py) is the default.

Input contracts (both reference metric paths are reproduced EXACTLY):

- FID (``Fid_score.py:36-64``): ``inception_v3(pretrained=True)`` — which
  in torchvision implies ``transform_input=True`` — fed ``x * 2 - 1`` of
  [0,1] images. Use ``__call__(x_pm1, transform_input=True)``.
- IS (``IS_score.py:37``, ``main.py:450-457``): ``transform_input=False``
  fed raw [0,1] images (uint8/255 — no further normalization despite the
  docstring there claiming [-1,1]). Use ``__call__(x_01)``.

``inception_feature_fn`` runs both pipelines so FID features and IS probs
are each paper-comparable by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel_size, self.strides, self.padding,
            use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _pad(k):
    return tuple((p, p) for p in k)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=_pad((2, 2)), name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((1, 1)), name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((1, 1)), name="branch3x3dbl_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding=_pad((1, 1)))
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=_pad((1, 1)), name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding=_pad((1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=_pad((1, 1)), name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding=_pad((1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Torchvision-topology InceptionV3; returns (features_2048, logits).

    ``x`` is fed to the stem as-is (match the caller's normalization to the
    reference path being reproduced — see module docstring). With
    ``transform_input=True`` torchvision's per-channel ImageNet rescale is
    applied first (what ``inception_v3(pretrained=True)`` does by default,
    hence what the reference FID uses).
    """

    num_classes: int = 1000

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, transform_input: bool = False
    ):
        if transform_input:
            # torchvision Inception3._transform_input (expects x in [-1, 1])
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=_pad((1, 1)), name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x, train)
        x = InceptionA(64, name="Mixed_5c")(x, train)
        x = InceptionA(64, name="Mixed_5d")(x, train)
        x = InceptionB(name="Mixed_6a")(x, train)
        x = InceptionC(128, name="Mixed_6b")(x, train)
        x = InceptionC(160, name="Mixed_6c")(x, train)
        x = InceptionC(160, name="Mixed_6d")(x, train)
        x = InceptionC(192, name="Mixed_6e")(x, train)
        x = InceptionD(name="Mixed_7a")(x, train)
        x = InceptionE(name="Mixed_7b")(x, train)
        x = InceptionE(name="Mixed_7c")(x, train)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


def convert_torchvision_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torchvision inception_v3 state_dict -> flat npz dict with flax names.

    conv weights (O,I,H,W) -> (H,W,I,O); BN {weight,bias,running_mean,
    running_var} -> {scale,bias,mean,var}; fc weight (O,I) -> (I,O).
    Save with ``np.savez(path, **arrays)`` and load via
    :func:`load_torch_weights_npz`.
    """
    out = {}
    for k, v in state_dict.items():
        if k.startswith("AuxLogits"):
            continue
        arr = np.asarray(v)
        if k.endswith(".conv.weight"):
            out[k[: -len(".conv.weight")] + "/conv/kernel"] = arr.transpose(2, 3, 1, 0)
        elif k.endswith(".bn.weight"):
            out[k[: -len(".bn.weight")] + "/bn/scale"] = arr
        elif k.endswith(".bn.bias"):
            out[k[: -len(".bn.bias")] + "/bn/bias"] = arr
        elif k.endswith(".bn.running_mean"):
            out[k[: -len(".bn.running_mean")] + "/bn/mean"] = arr
        elif k.endswith(".bn.running_var"):
            out[k[: -len(".bn.running_var")] + "/bn/var"] = arr
        elif k == "fc.weight":
            out["fc/kernel"] = arr.T
        elif k == "fc.bias":
            out["fc/bias"] = arr
        # AuxLogits.* and num_batches_tracked are dropped
    return out


def load_torch_weights_npz(npz_path: str, num_classes: int = 1000):
    """Build (model, variables) from a converted-weights .npz."""
    return load_converted_weights(np.load(npz_path), num_classes)


def load_converted_weights(data, num_classes: int = 1000):
    """Build (model, variables) from a converted flat mapping
    (:func:`convert_torchvision_state_dict` output or a loaded npz)."""
    model = InceptionV3(num_classes=num_classes)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])

    def to_mutable(t):
        return (
            {k: to_mutable(v) for k, v in t.items()} if hasattr(t, "items") else t
        )

    params, stats = to_mutable(params), to_mutable(stats)
    keys = data.files if hasattr(data, "files") else data.keys()
    loaded = set()
    for key in keys:
        parts = key.replace(".", "/").split("/")
        leaf = parts[-1]
        tree = stats if leaf in ("mean", "var") else params
        node = tree
        for p in parts[:-1]:
            node = node[p]
        expected = node[leaf].shape
        assert data[key].shape == tuple(expected), (key, data[key].shape, expected)
        node[leaf] = jnp.asarray(data[key])
        loaded.add("/".join(parts))
    # every model leaf must have been replaced — a converter key-schema
    # drift (renamed block, missed BN stat) fails loudly instead of
    # silently keeping random-init weights
    expected_keys = set()
    for tree, leaves in ((params, ("kernel", "scale", "bias")),
                         (stats, ("mean", "var"))):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, _ in flat:
            name = "/".join(getattr(p, "key", str(p)) for p in path)
            if name.rsplit("/", 1)[-1] in leaves:
                expected_keys.add(name)
    missing = expected_keys - loaded
    assert not missing, f"converter left {len(missing)} leaves unset: {sorted(missing)[:5]}"
    return model, {"params": params, "batch_stats": stats}


def resize_for_inception(
    images: np.ndarray, antialias: bool = False
) -> jax.Array:
    """(N, H, W, 1|3) in [0,1] -> (N, 299, 299, 3) bilinear, on device.

    Parity: the reference's ``nn.Upsample(size=(299, 299), mode='bilinear')``
    + channel repeat (``main.py:503-506``). ``antialias=True`` uses the
    anti-aliased scale-and-translate resize — the fix the reference's
    vendored-but-unwired clean-fid package exists to provide
    (``metric/cleanfid/resize.py``).
    """
    x = jnp.asarray(images, jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if antialias:
        return jax.image.resize(
            x, (x.shape[0], 299, 299, 3), method="lanczos3", antialias=True
        )
    return jax.image.resize(
        x, (x.shape[0], 299, 299, 3), method="bilinear"
    )


def inception_feature_fn(model: InceptionV3, variables, batch_size: int = 64):
    """Wrap as a metrics FeatureFn: images -> (2048-d feats, class probs).

    Reproduces BOTH reference pipelines exactly (two passes):
    - feats: ``x*2-1`` + ``transform_input=True``  (FID, ``Fid_score.py:55``)
    - probs: raw [0,1] + ``transform_input=False`` (IS, ``IS_score.py:37``)
    """

    @jax.jit
    def fwd(x):
        feats, _ = model.apply(
            variables, x * 2.0 - 1.0, train=False, transform_input=True
        )
        _, logits = model.apply(variables, x, train=False)
        return feats, jax.nn.softmax(logits, axis=-1)

    def fn(images: np.ndarray):
        x = np.asarray(images, np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        n = x.shape[0]
        pad = (-n) % batch_size
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        feats, probs = [], []
        for i in range(0, x.shape[0], batch_size):
            xb = resize_for_inception(x[i : i + batch_size])
            f, p = fwd(xb)
            feats.append(np.asarray(f))
            probs.append(np.asarray(p))
        return np.concatenate(feats)[:n], np.concatenate(probs)[:n]

    return fn
