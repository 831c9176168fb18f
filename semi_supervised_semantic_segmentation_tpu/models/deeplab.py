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

from semi_supervised_semantic_segmentation_tpu.models.layers import ConvNormAct
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
        pooled = jnp.broadcast_to(pooled, (n, h, w, self.features)).astype(x.dtype)
        branches.append(pooled)

        out = jnp.concatenate(branches, axis=-1)
        out = ConvNormAct(
            self.features, (1, 1), norm=self.norm,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="project",
        )(out, train)
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
        x = jnp.concatenate([x.astype(low.dtype), low], axis=-1)
        x = ConvNormAct(
            self.features, (3, 3), norm=self.norm,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="fuse1",
        )(x, train)
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
