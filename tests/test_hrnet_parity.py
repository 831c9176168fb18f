"""HRNet forward parity vs a hand-built torch oracle (SURVEY C8, VERDICT r1
item 3).

The oracle is a miniature HRNet (width 16, one module per stage) built with
the OFFICIAL HRNet module/state-dict naming (conv1/bn1, layer1.B.*,
transitionT.I[.0].{0,1}, stageS.M.branches.I.B.*, stageS.M.fuse_layers.I.J.*)
so the test validates both the flax topology and ``engine.compat.
hrnet_to_flax``'s state-dict mapping at once — the same mapping that imports
real ImageNet HRNet-W48 checkpoints for config 5.

Fusion upsampling convention: both sides use bilinear align_corners=False
(our framework-wide choice; the official classification repo uses nearest
and the segmentation repo align_corners=True — weight-compatible either way,
and configurable through ops.resize if exact seg-repo eval parity is ever
needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from semi_supervised_semantic_segmentation_tpu.engine import compat
from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNet

WIDTH = 16
WIDTHS = (WIDTH, WIDTH * 2, WIDTH * 4, WIDTH * 8)


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


def _conv_bn_relu(cin, cout, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class TorchHRModule(nn.Module):
    """Official HighResolutionModule naming: branches + fuse_layers."""

    def __init__(self, channels):
        super().__init__()
        n = len(channels)
        self.channels = channels
        self.branches = nn.ModuleList(
            [nn.Sequential(*[TorchBasicBlock(c, c) for _ in range(4)]) for c in channels]
        )
        fuse = []
        for i in range(n):
            row = []
            for j in range(n):
                if j == i:
                    row.append(None)
                elif j > i:
                    row.append(
                        nn.Sequential(
                            nn.Conv2d(channels[j], channels[i], 1, bias=False),
                            nn.BatchNorm2d(channels[i]),
                        )
                    )
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = channels[i] if last else channels[j]
                        mods = [
                            nn.Conv2d(channels[j], cout, 3, 2, 1, bias=False),
                            nn.BatchNorm2d(cout),
                        ]
                        if not last:
                            mods.append(nn.ReLU(inplace=True))
                        chain.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*chain))
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)

    def forward(self, xs):
        ys = [br(x) for br, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(ys)):
            acc = ys[i]
            for j in range(len(ys)):
                if j == i:
                    continue
                if j > i:
                    t = self.fuse_layers[i][j](ys[j])
                    t = F.interpolate(
                        t, ys[i].shape[-2:], mode="bilinear", align_corners=False
                    )
                else:
                    t = self.fuse_layers[i][j](ys[j])
                acc = acc + t
            outs.append(F.relu(acc))
        return outs


class TorchHRNetMini(nn.Module):
    """Official state-dict naming; width 16, one module per stage."""

    def __init__(self):
        super().__init__()
        w = WIDTHS
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(
            TorchBottleneck(64, 64, downsample=True),
            *[TorchBottleneck(256, 64) for _ in range(3)],
        )
        self.transition1 = nn.ModuleList(
            [
                _conv_bn_relu(256, w[0]),
                nn.Sequential(_conv_bn_relu(256, w[1], stride=2)),
            ]
        )
        self.stage2 = nn.Sequential(TorchHRModule(list(w[:2])))
        self.transition2 = nn.ModuleList(
            [None, None, nn.Sequential(_conv_bn_relu(w[1], w[2], stride=2))]
        )
        self.stage3 = nn.Sequential(TorchHRModule(list(w[:3])))
        self.transition3 = nn.ModuleList(
            [None, None, None, nn.Sequential(_conv_bn_relu(w[2], w[3], stride=2))]
        )
        self.stage4 = nn.Sequential(TorchHRModule(list(w[:4])))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        xs = self.stage2(xs)
        xs = xs + [self.transition2[2](xs[-1])]
        xs = self.stage3(xs)
        xs = xs + [self.transition3[3](xs[-1])]
        return self.stage4(xs)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def test_hrnet_forward_parity_with_official_layout_torch():
    torch.manual_seed(0)
    tmodel = TorchHRNetMini().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = HRNet(width=WIDTH, stage_modules=(1, 1, 1), dtype=jnp.float32)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = jax.jit(
        lambda r, xx: fmodel.init({"params": r}, xx, train=False)
    )(jax.random.key(0), jnp.asarray(x))
    params, stats = compat.hrnet_to_flax(
        sd, variables["params"], variables["batch_stats"]
    )
    taps = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    for tap, t in zip(("c2", "c3", "c4", "c5"), theirs):
        ours = np.asarray(taps[tap])
        ref = t.permute(0, 2, 3, 1).numpy()
        assert ours.shape == ref.shape, tap
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3, err_msg=tap)


def test_hrnet_import_covers_every_parameter():
    """Every conv/BN tensor in the flax tree must be filled by the mapping
    (a silently-skipped tensor would keep its random init and pass shape
    checks while breaking ImageNet initialization)."""
    torch.manual_seed(1)
    tmodel = TorchHRNetMini()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    fmodel = HRNet(width=WIDTH, stage_modules=(1, 1, 1), dtype=jnp.float32)
    variables = jax.jit(
        lambda r, xx: fmodel.init({"params": r}, xx, train=False)
    )(jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
    params, stats = compat.hrnet_to_flax(
        sd, variables["params"], variables["batch_stats"]
    )
    # unflatten_torch_layout raises KeyError on any missing flat entry, so
    # reaching here means full coverage; spot-check one deep fuse tensor.
    flat = compat.flatten_params_to_torch_layout(params, stats)
    got = flat["stage4_m0.fuse_down_0_to_3_2.Conv_0.weight"]
    want = sd["stage4.0.fuse_layers.3.0.2.0.weight"]
    np.testing.assert_array_equal(got, want)


def test_load_pretrained_encoder_rejects_unknown_layout(tmp_path):
    path = str(tmp_path / "weird.npz")
    np.savez(path, **{"some.key": np.zeros(3, np.float32)})
    with pytest.raises(ValueError, match="unrecognized state-dict layout"):
        compat.load_pretrained_encoder(
            path, {"encoder": {}, "decoder": {}}, {"encoder": {}}
        )


def test_hrnetv2_head_equals_concat_formulation():
    """The restructured head (per-branch fuse GEMMs at native resolution,
    upsampled and summed) must equal the official concat -> 1x1 conv -> BN ->
    ReLU -> classifier head exactly (both are linear-algebra identities)."""
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNetV2Head
    from semi_supervised_semantic_segmentation_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    n, s = 2, 8  # stride-4 base resolution s x s
    chans = {"c2": 8, "c3": 16, "c4": 32, "c5": 64}
    taps = {
        k: jnp.asarray(
            rng.randn(n, s >> i, s >> i, c).astype(np.float32)
        )
        for i, (k, c) in enumerate(chans.items())
    }
    head = HRNetV2Head(num_classes=5, dtype=jnp.float32)
    variables = head.init(jax.random.key(0), taps, (4 * s, 4 * s), False)
    got = head.apply(variables, taps, (4 * s, 4 * s), False)

    # Official formulation from the same parameters.
    p = variables["params"]
    width = sum(chans.values())
    kernels = [np.asarray(p[f"fuse{i}"]["kernel"])[0, 0] for i in range(4)]
    w_concat = np.concatenate(kernels, axis=0)  # (sum_ci, width)
    ups = [np.asarray(taps["c2"])]
    for k in ("c3", "c4", "c5"):
        ups.append(np.asarray(resize_bilinear(taps[k], (s, s), align_corners=False)))
    x = np.concatenate(ups, axis=-1)
    # Eval-mode BN (running stats mean 0 / var 1), matching got's train=False.
    bn = p["fuse_norm"]["BatchNorm_0"]
    pre = x @ w_concat + np.asarray(p["fuse0"]["bias"])
    pre = pre / np.sqrt(1.0 + 1e-5) * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    act = np.maximum(pre, 0.0)
    logits = act @ np.asarray(p["head"]["kernel"])[0, 0] + np.asarray(
        p["head"]["bias"]
    )
    want = np.asarray(
        resize_bilinear(jnp.asarray(logits), (4 * s, 4 * s), align_corners=False)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
