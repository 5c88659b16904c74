"""Numeric known-answer validation of the InceptionV3 flax port + converter.

Round-1 weakness (VERDICT.md #2): the port was only shape-tested, so a
transposed conv kernel, a BN-eps misplacement, or a pooling-mode mismatch
could silently poison every future FID. Here a torch mirror of the
torchvision Inception3 architecture (hand-built — torchvision is not
installed in this env) is random-initialised, its state_dict exported with
the exact torchvision key schema, converted via
``convert_torchvision_state_dict``, and per-block + full-network outputs
are asserted equal between torch and flax. Both reference metric input
pipelines are covered:
- FID  (``metric/Fid_score.py:36-64``): x*2-1 then transform_input=True
- IS   (``metric/IS_score.py:37``):     raw [0,1], transform_input=False
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from spiking_diffusion_tpu.metrics import inception as jinc

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch mirror of torchvision Inception3 (eval-path only, no AuxLogits)
# --------------------------------------------------------------------------
class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInception3(tnn.Module):
    """Eval-path mirror of torchvision Inception3; returns (feats, logits)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x, transform_input=False):
        if transform_input:
            ch0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat([ch0, ch1, ch2], 1)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        feats = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return feats, self.fc(feats)


def _randomize(module: tnn.Module, seed=0):
    """Non-trivial weights + BN running stats (a realistic state_dict)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, tnn.Conv2d):
            m.weight.data = torch.randn(m.weight.shape, generator=g) * 0.05
        elif isinstance(m, tnn.BatchNorm2d):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.1
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5
        elif isinstance(m, tnn.Linear):
            m.weight.data = torch.randn(m.weight.shape, generator=g) * 0.02
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
    return module


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


BLOCK_CASES = [
    ("A", lambda: InceptionA(64, 32), lambda: jinc.InceptionA(32), 64, 17),
    ("B", lambda: InceptionB(64), lambda: jinc.InceptionB(), 64, 17),
    ("C", lambda: InceptionC(64, 128), lambda: jinc.InceptionC(128), 64, 17),
    ("D", lambda: InceptionD(64), lambda: jinc.InceptionD(), 64, 17),
    ("E", lambda: InceptionE(64), lambda: jinc.InceptionE(), 64, 9),
]


@pytest.mark.parametrize("name,mk_t,mk_j,cin,hw", BLOCK_CASES,
                         ids=[c[0] for c in BLOCK_CASES])
def test_block_known_answer(name, mk_t, mk_j, cin, hw):
    """Each Mixed-block family: torch vs converted flax, exact pooling/
    padding/BN semantics."""
    tm = _randomize(mk_t(), seed=ord(name)).eval()
    flat = jinc.convert_torchvision_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    jm = mk_j()
    x = np.random.RandomState(1).rand(2, hw, hw, cin).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # graft converted leaves into the init tree
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def to_mut(t):
        return {k: to_mut(v) for k, v in t.items()} if hasattr(t, "items") else t

    params, stats = to_mut(params), to_mut(stats)
    for key, arr in flat.items():
        parts = key.split("/")
        tree = stats if parts[-1] in ("mean", "var") else params
        node = tree
        for p in parts[:-1]:
            node = node[p]
        assert node[parts[-1]].shape == arr.shape, key
        node[parts[-1]] = arr

    out_j = np.asarray(jax.jit(lambda v, x: jm.apply(v, x))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)))
    with torch.no_grad():
        out_t = tm(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_full_network_and_converter_known_answer():
    """Full 299x299 network + converter + both metric input pipelines."""
    tm = _randomize(TorchInception3(num_classes=10), seed=7).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # pretrained torchvision state_dicts carry AuxLogits.*; the converter
    # must drop them — simulate one
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    flat = jinc.convert_torchvision_state_dict(sd)
    assert not any(k.startswith("AuxLogits") for k in flat)

    model, variables = jinc.load_converted_weights(flat, num_classes=10)
    x01 = np.random.RandomState(3).rand(2, 299, 299, 3).astype(np.float32)

    # IS pipeline: raw [0,1], transform_input=False
    feats_j, logits_j = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, jnp.asarray(x01))
    with torch.no_grad():
        feats_t, logits_t = tm(_nchw(x01))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=1e-3, atol=1e-3)

    # FID pipeline: x*2-1, transform_input=True (Fid_score.py:55 +
    # inception_v3(pretrained=True) implying transform_input=True)
    feats_j2, _ = jax.jit(
        lambda v, x: model.apply(v, x * 2.0 - 1.0, train=False,
                                 transform_input=True)
    )(variables, jnp.asarray(x01))
    with torch.no_grad():
        feats_t2, _ = tm(_nchw(x01) * 2.0 - 1.0, transform_input=True)
    np.testing.assert_allclose(np.asarray(feats_j2), feats_t2.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_converter_rejects_incomplete_state_dict():
    """A key-schema drift (missing leaves) must fail loudly, not silently
    keep random-init weights."""
    with pytest.raises(AssertionError):
        jinc.load_converted_weights(
            {"Conv2d_1a_3x3/conv/kernel": np.zeros((3, 3, 3, 32), np.float32)},
            num_classes=10,
        )


def test_resize_parity_with_torch_upsample():
    """jax.image.resize bilinear == the reference's nn.Upsample(299)
    (``main.py:503-506``) — same half-pixel, no-antialias semantics."""
    x = np.random.RandomState(5).rand(2, 28, 28, 1).astype(np.float32)
    out_j = np.asarray(jinc.resize_for_inception(x))
    with torch.no_grad():
        out_t = F.interpolate(
            _nchw(np.repeat(x, 3, axis=-1)), size=(299, 299), mode="bilinear"
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5)
