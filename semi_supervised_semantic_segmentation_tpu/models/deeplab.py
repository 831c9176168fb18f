"""DeepLabV3+ decoder with ASPP (rebuilds C10).

ASPP = 1x1 conv + three 3x3 dilated convs (rates 6/12/18 at output_stride 16,
doubled at os 8) + global image pooling, concatenated and projected to 256
channels.  The v3+ decoder fuses stride-4 low-level features (1x1 -> 48 ch),
refines with two 3x3 convs, then bilinearly upsamples logits x4 to input
resolution — all resizes via the torch-parity bilinear (ops.resize).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semi_supervised_semantic_segmentation_tpu.models.layers import ConvNormAct, Norm
from semi_supervised_semantic_segmentation_tpu.ops.resize import resize_bilinear


class ASPP(nn.Module):
    features: int = 256
    dilations: Tuple[int, ...] = (6, 12, 18)
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        branches = [
            ConvNormAct(
                self.features, (1, 1), norm=self.norm,
                bn_momentum=self.bn_momentum, dtype=self.dtype, name="b0",
            )(x, train)
        ]
        for i, d in enumerate(self.dilations):
            branches.append(
                ConvNormAct(
                    self.features, (3, 3), dilation=(d, d), norm=self.norm,
                    bn_momentum=self.bn_momentum, dtype=self.dtype, name=f"b{i + 1}",
                )(x, train)
            )
        # Image pooling: global average -> 1x1 conv -> broadcast back.
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        pooled = ConvNormAct(
            self.features, (1, 1), norm=self.norm,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="pool",
        )(pooled.astype(x.dtype), train)

        # Projection restructured for TPU (same math as the usual
        # concat(5x256=1280 ch) -> 1x1 conv): a 1x1 conv over a channel
        # concat is the sum of per-branch 1x1 convs with the row blocks of
        # the projection kernel, so the 1280-channel concat (and its layout
        # copies, a top line in the config-4 profile) is never materialized.
        # The image-pool branch contributes through a 1x1-resolution GEMM
        # broadcast into the sum instead of a broadcast-then-GEMM.
        acc = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="project0",
        )(branches[0])
        for i, b in enumerate(branches[1:]):
            acc = acc + nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"project{i + 1}",
            )(b)
        pooled = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="project_pool",
        )(pooled)
        acc = acc + jnp.broadcast_to(pooled, acc.shape).astype(acc.dtype)
        out = Norm(
            kind=self.norm, momentum=self.bn_momentum, dtype=self.dtype,
            name="project_norm",
        )(acc, train)
        out = nn.relu(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class DeepLabV3Plus(nn.Module):
    """Decoder over taps: c2 (stride 4, low-level) + c5 (stride 8/16, ASPP)."""

    num_classes: int
    features: int = 256
    low_level_features: int = 48
    dilations: Tuple[int, ...] = (6, 12, 18)
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, taps: Dict[str, jnp.ndarray], out_hw: Tuple[int, int], train: bool = False):
        x = ASPP(
            self.features, self.dilations, self.norm, self.bn_momentum,
            self.dtype, name="aspp",
        )(taps["c5"], train)

        low = ConvNormAct(
            self.low_level_features, (1, 1), norm=self.norm,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="low_project",
        )(taps["c2"], train)

        x = resize_bilinear(x, (low.shape[1], low.shape[2]), align_corners=False)
        # fuse1 restructured (same math as concat(256+48=304) -> 3x3 conv):
        # a conv over a channel concat equals the sum of convs with the
        # input-channel blocks of the kernel.  Avoids materializing the
        # 304-channel concat and its relayout copies/weight-grad padding.
        pre = nn.Conv(
            self.features, (3, 3), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="fuse1a",
        )(x.astype(low.dtype)) + nn.Conv(
            self.features, (3, 3), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="fuse1b",
        )(low)
        x = nn.relu(
            Norm(
                kind=self.norm, momentum=self.bn_momentum, dtype=self.dtype,
                name="fuse1_norm",
            )(pre, train)
        )
        x = ConvNormAct(
            self.features, (3, 3), norm=self.norm,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="fuse2",
        )(x, train)
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="head",
        )(x)
        # Upsample in the compute dtype (single MXU pass).  Logits stay in
        # the compute dtype: materializing them f32 at full resolution costs
        # ~90MB of HBM traffic per branch at 512^2x21; the losses upcast
        # tile-wise inside their fusions instead.
        return resize_bilinear(logits, out_hw, align_corners=False)
