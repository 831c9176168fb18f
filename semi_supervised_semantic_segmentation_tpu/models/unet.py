"""U-Net decoder over encoder taps (rebuilds C9).

Skip-connected upsampling decoder in the segmentation_models-style shape:
at each step, bilinear-upsample x2, concatenate the matching encoder tap,
then two Conv-BN-ReLU blocks.  The head is a 1x1 conv producing per-class
logits, followed by a final bilinear upsample to input resolution.
All upsampling uses the torch-parity bilinear from ops.resize
(align_corners=False), as SURVEY.md §7 mandates.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semi_supervised_semantic_segmentation_tpu.models.layers import ConvNormAct
from semi_supervised_semantic_segmentation_tpu.ops.resize import resize_bilinear


class DecoderBlock(nn.Module):
    features: int
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        h, w = x.shape[1] * 2, x.shape[2] * 2
        x = resize_bilinear(x, (h, w), align_corners=False)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvNormAct(
            self.features, (3, 3), norm=self.norm, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="conv1",
        )(x, train)
        x = ConvNormAct(
            self.features, (3, 3), norm=self.norm, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="conv2",
        )(x, train)
        return x


class UNetDecoder(nn.Module):
    """Decoder over taps {c1(s2), c2(s4), c3(s8), c4(s16), c5(s32)}."""

    num_classes: int
    channels: Sequence[int] = (256, 128, 64, 32)
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, taps: Dict[str, jnp.ndarray], out_hw: Tuple[int, int], train: bool = False):
        x = taps["c5"]
        skips = [taps["c4"], taps["c3"], taps["c2"], taps["c1"]]
        for i, (ch, skip) in enumerate(zip(self.channels, skips)):
            x = DecoderBlock(
                ch, norm=self.norm, bn_momentum=self.bn_momentum,
                dtype=self.dtype, name=f"up{i}",
            )(x, skip, train)
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="head",
        )(x)
        # Head runs at stride 2; final x2 bilinear in the compute dtype
        # (single MXU pass).  Logits stay in the compute dtype — losses and
        # argmax consumers upcast tile-wise inside their fusions.
        return resize_bilinear(logits, out_hw, align_corners=False)
