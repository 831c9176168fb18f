"""ResNet-18/50/101 encoders (rebuilds C7) in flax.linen, NHWC/bf16.

Structure matches torchvision ResNet v1.5 (stride on the 3x3 conv of the
bottleneck) so ImageNet state-dicts import cleanly via
``engine.compat.load_torch_resnet`` (OIHW->HWIO transpose + BN param map).
Dilated ``output_stride`` 8/16 variants replace stride with dilation in
layer3/layer4 for DeepLabV3+ (torchvision ``replace_stride_with_dilation``).

Returns a pyramid of feature taps:
  c1 (stride 2, post-stem-relu), c2 (s4), c3 (s8), c4 (s16*), c5 (s32*)
(* = nominal; with output_stride<32 the later taps keep resolution but gain
dilation, as in every DeepLab implementation).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semi_supervised_semantic_segmentation_tpu.models.layers import (
    ConvNormAct,
    Norm,
    PallasStemSegment,
    max_pool_same_as_torch,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    # 'NCHW' runs both 3x3 convs through the layout-pinned pallas path
    # (HRNet branch chains; stride/dilation must be 1, no downsample).
    # Param tree is identical either way.
    data_format: str = "NHWC"
    # Mesh for the NCHW pallas kernels' data-sharded shard_map.
    dp_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.data_format == "NCHW":
            # Fused branch-chain flow: conv1's BN+ReLU is applied inside
            # conv2's kernel (in VMEM, never materialized in HBM) and both
            # BatchNorms read their batch statistics from the kernels'
            # accumulated sums.  Same math and param tree as the NHWC flow.
            assert self.stride == 1 and self.dilation == 1 and not self.downsample
            y1, fold1 = ConvNormAct(
                self.planes, (3, 3), norm=self.norm,
                bn_momentum=self.bn_momentum, dtype=self.dtype,
                data_format="NCHW", raw_out=True, dp_mesh=self.dp_mesh,
                name="conv1",
            )(x, train)
            y2, (mul2, add2) = ConvNormAct(
                self.planes, (3, 3), act=False, norm=self.norm,
                bn_momentum=self.bn_momentum, dtype=self.dtype,
                data_format="NCHW", raw_out=True, dp_mesh=self.dp_mesh,
                name="conv2",
            )((y1, fold1), train)
            out = (y2 * mul2.astype(self.dtype)[None, :, None, None]
                   + add2.astype(self.dtype)[None, :, None, None])
            return nn.relu(out + x)
        identity = x
        out = ConvNormAct(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            dilation=(self.dilation, self.dilation),
            norm=self.norm,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv1",
        )(x, train)
        out = ConvNormAct(
            self.planes,
            (3, 3),
            dilation=(self.dilation, self.dilation),
            act=False,
            norm=self.norm,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv2",
        )(out, train)
        if self.downsample:
            identity = ConvNormAct(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                act=False,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; output channels = 4 * planes
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvNormAct(
            self.planes,
            (1, 1),
            norm=self.norm,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv1",
        )(x, train)
        # torchvision v1.5: stride lives on the 3x3 conv.
        out = ConvNormAct(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            dilation=(self.dilation, self.dilation),
            norm=self.norm,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv2",
        )(out, train)
        out = ConvNormAct(
            self.planes * self.expansion,
            (1, 1),
            act=False,
            norm=self.norm,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="conv3",
        )(out, train)
        if self.downsample:
            identity = ConvNormAct(
                self.planes * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                act=False,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        return nn.relu(out + identity)


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
}


class ResNet(nn.Module):
    """ResNet encoder returning multi-scale taps c1..c5."""

    arch: str = "resnet50"
    output_stride: int = 32  # 8 | 16 | 32
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    remat: bool = False  # checkpoint each residual block (memory vs FLOPs)
    # 'conv' = plain stride-2 7x7; 's2d' = same conv via 2x2 space-to-depth
    # (exact, same params; 4x denser MXU feed for the Cin=3 stem); 'pallas'
    # = the im2col-stacked MXU kernel (ops/pallas_stem.py, K=256 lanes).
    stem_impl: str = "conv"
    # Mesh with a >1 'data' axis for the pallas stem's data-sharded
    # shard_map (GSPMD cannot partition the opaque custom call).
    dp_mesh: Any = None

    @property
    def feature_channels(self) -> Tuple[int, int, int, int, int]:
        _, _, exp = _SPECS[self.arch]
        return (64, 64 * exp, 128 * exp, 256 * exp, 512 * exp)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        block_cls, layers, _ = _SPECS[self.arch]
        if self.remat:
            # static_argnums: (self, x, train) -> train must stay static.
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        # Stride/dilation plan per stage (torchvision
        # replace_stride_with_dilation): when a stage is dilated, its stride
        # moves into the dilation, block 0 keeps the *previous* dilation.
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]  # dilation of blocks 1.. within the stage
        prev_dilations = [1, 1, 1, 1]  # dilation of block 0 of the stage
        if self.output_stride == 16:
            strides[3], dilations[3], prev_dilations[3] = 1, 2, 1
        elif self.output_stride == 8:
            strides[2], dilations[2], prev_dilations[2] = 1, 2, 1
            strides[3], dilations[3], prev_dilations[3] = 1, 4, 2

        if self.stem_impl == "pallas":
            # NCHW stem segment (ops/pallas_stem.py): the kernel emits NCHW
            # y + fused BN batch stats; BN apply/ReLU/maxpool run NCHW (W in
            # dense lanes instead of the 64-ch half-empty NHWC lane dim) and
            # ONE transpose back to NHWC happens at the 4x-smaller maxpool
            # output.  Same math and param tree as the plain stem.
            x, c1 = PallasStemSegment(
                64, (7, 7), norm=self.norm, bn_momentum=self.bn_momentum,
                dtype=self.dtype, dp_mesh=self.dp_mesh, name="stem")(x, train)
        else:
            x = ConvNormAct(
                64,
                (7, 7),
                strides=(2, 2),
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                s2d=(self.stem_impl == "s2d"),
                name="stem",
            )(x, train)
            c1 = x  # stride 2
            x = max_pool_same_as_torch(x)

        taps = {"c1": c1}
        planes = (64, 128, 256, 512)
        in_ch = 64
        for stage in range(4):
            exp = getattr(block_cls, "expansion", 1)
            out_ch = planes[stage] * exp
            for b in range(layers[stage]):
                stride = strides[stage] if b == 0 else 1
                dil = prev_dilations[stage] if b == 0 else dilations[stage]
                x = block_cls(
                    planes=planes[stage],
                    stride=stride,
                    dilation=dil,
                    downsample=(b == 0 and (strides[stage] != 1 or in_ch != out_ch)),
                    norm=self.norm,
                    bn_momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                in_ch = out_ch
            taps[f"c{stage + 2}"] = x
        return taps
