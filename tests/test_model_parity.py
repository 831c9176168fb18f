"""Model parity vs torch-CPU oracles (SURVEY §4.2 'Unit: model parity').

torchvision is not installed, so the oracle is a hand-built torch ResNet-18
with exact torchvision module names/topology; weights flow through the
compat importer (OIHW->HWIO + BN split) and forward activations must agree
to fp32 tolerance.  This validates both the flax encoder topology and the
checkpoint compat layer at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from semi_supervised_semantic_segmentation_tpu.engine import compat
from semi_supervised_semantic_segmentation_tpu.models.resnet import ResNet


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    """torchvision-resnet18-shaped (same state_dict key names)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        inpl = 64
        for i, c in enumerate(chans):
            stride = 1 if i == 0 else 2
            layer = nn.Sequential(
                TorchBasicBlock(inpl, c, stride), TorchBasicBlock(c, c, 1)
            )
            setattr(self, f"layer{i + 1}", layer)
            inpl = c

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


class TorchBottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv), with the
    dilation plumbing of torchvision's ``_make_layer``."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride, dilation, dilation=dilation, bias=False
        )
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50OS16(nn.Module):
    """torchvision-resnet50-shaped state_dict, with layer4 dilated
    (replace_stride_with_dilation=[False, False, True]): block 0 of the
    dilated stage keeps the *previous* dilation, later blocks dilate —
    exactly torchvision's ``_make_layer`` bookkeeping, which the flax
    encoder's stride/dilation plan must reproduce for output_stride=16."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        blocks = (3, 4, 6, 3)
        inplanes, dilation = 64, 1
        for i, (planes, nblocks) in enumerate(zip((64, 128, 256, 512), blocks)):
            stride = 1 if i == 0 else 2
            dilate = i == 3  # output_stride 16: dilate layer4 only
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            layers = [
                TorchBottleneck(
                    inplanes, planes, stride, previous_dilation,
                    downsample=(stride != 1 or inplanes != planes * 4),
                )
            ]
            inplanes = planes * 4
            layers += [
                TorchBottleneck(inplanes, planes, 1, dilation)
                for _ in range(1, nblocks)
            ]
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def test_resnet18_forward_parity_with_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = ResNet(arch="resnet18", output_stride=32, dtype=jnp.float32)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = fmodel.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params, stats = compat.torchvision_resnet_to_flax(
        sd, variables["params"], variables["batch_stats"]
    )
    taps = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    ours = np.asarray(taps["c5"])  # (1, 2, 2, 512)

    with torch.no_grad():
        theirs = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_resnet50_dilated_forward_parity_with_torch():
    """Bottleneck + output_stride=16 dilation plan vs the torch oracle
    (closes the round-1 gap: R50/R101 had shape tests only)."""
    torch.manual_seed(1)
    tmodel = TorchResNet50OS16().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=1)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = ResNet(arch="resnet50", output_stride=16, dtype=jnp.float32)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    variables = fmodel.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params, stats = compat.torchvision_resnet_to_flax(
        sd, variables["params"], variables["batch_stats"]
    )
    taps = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    ours = np.asarray(taps["c5"])  # (1, 4, 4, 2048): stride 16, dilated layer4

    with torch.no_grad():
        theirs = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_conv_transpose_roundtrip():
    w = np.random.RandomState(1).rand(8, 3, 5, 5).astype(np.float32)
    back = compat.conv_flax_to_torch(compat.conv_torch_to_flax(w))
    np.testing.assert_array_equal(w, back)


def test_flatten_unflatten_roundtrip():
    fmodel = ResNet(arch="resnet18", output_stride=32, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fmodel.init({"params": jax.random.key(0)}, x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    flat = compat.flatten_params_to_torch_layout(
        jax.device_get(params), jax.device_get(stats)
    )
    p2, s2 = compat.unflatten_torch_layout(flat, params, stats)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
