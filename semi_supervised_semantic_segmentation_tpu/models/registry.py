"""Model registry: (backbone, decoder) -> flax Module (rebuilds the model
factory the reference's config surface implies — C7..C10).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.models.deeplab import DeepLabV3Plus
from semi_supervised_semantic_segmentation_tpu.models.resnet import ResNet
from semi_supervised_semantic_segmentation_tpu.models.unet import UNetDecoder

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
}


def _remat_stages(remat: str) -> Tuple[int, ...]:
    """Parse a remat plan string into HRNet stage ids (1 = layer1)."""
    if remat in ("", "none"):
        return ()
    if remat in ("blocks", "branches"):
        return (1, 2, 3, 4)
    for prefix in ("stages:", "branches:"):
        if remat.startswith(prefix):
            return tuple(int(s) for s in remat[len(prefix):].split(",") if s)
    raise ValueError(f"unknown remat plan: {remat!r}")


class SegModel(nn.Module):
    """Encoder + decoder; returns (N, H, W, num_classes) f32 logits at input
    resolution.  ``train=True`` enables BN batch-stat updates + dropout."""

    backbone: str = "resnet50"
    decoder: str = "deeplabv3plus"
    num_classes: int = 21
    output_stride: int = 16
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    aspp_dilations: Tuple[int, ...] = (6, 12, 18)
    decoder_channels: int = 256
    # Remat plan: "" / "none" = keep all activations; "blocks" = checkpoint
    # every residual block (ResNet) / layer1 + every HR module (HRNet);
    # "stages:3,4" (HRNet only) = checkpoint just those stages;
    # "branches" / "branches:3" (HRNet only) = checkpoint only the branch
    # BasicBlocks (of the listed stages), keeping fuse-layer activations
    # stored.  Selective plans fit 1024² in HBM while recomputing less than
    # the full plan (BASELINE.md remat scan).
    remat: str = ""
    # ResNet stem formulation: 'conv' (plain) or 's2d' (space-to-depth,
    # exact same math/params — see models/layers.py::S2DStemConv).
    stem_impl: str = "conv"
    # HRNet stride-2 fuse-down/transition conv formulation: 'conv' | 's2d'.
    fuse_impl: str = "conv"
    # HRNet branch BasicBlock conv path: 'xla' | 'pallas' (layout-pinned
    # NCHW kernel for the narrow branches — see ops/pallas_conv.py).
    branch_conv: str = "xla"
    # HRNetV2 head fuse order: 'conv_first' | 'up_first' (models/hrnet.py).
    head_fuse: str = "conv_first"
    # Mesh with a >1 'data' axis: the pallas branch/stem kernels run data-
    # sharded under shard_map (GSPMD cannot partition the opaque custom
    # call).
    dp_mesh: Any = None
    # Mesh for spatial (H) sharding of the HRNet stem (model axis > 1).
    spatial_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_hw = (x.shape[1], x.shape[2])
        if self.backbone.startswith("resnet"):
            taps = ResNet(
                arch=self.backbone,
                output_stride=self.output_stride if self.decoder == "deeplabv3plus" else 32,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                remat=(self.remat not in ("", "none")),
                stem_impl=self.stem_impl,
                dp_mesh=self.dp_mesh,
                name="encoder",
            )(x, train)
        elif self.backbone == "hrnet_w48":
            from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNet

            taps = HRNet(
                width=48,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                remat_stages=_remat_stages(self.remat),
                # 'branches' / 'branches:i,j' = checkpoint only the branch
                # BasicBlocks of the remat stages, keep fuse activations.
                remat_scope=(
                    "branch_blocks"
                    if self.remat.startswith("branches")
                    else "module"
                ),
                fuse_impl=self.fuse_impl,
                stem_impl="s2d" if self.stem_impl == "s2d" else "conv",
                branch_conv=self.branch_conv,
                dp_mesh=self.dp_mesh,
                spatial_mesh=self.spatial_mesh,
                name="encoder",
            )(x, train)
        else:
            raise ValueError(f"unknown backbone: {self.backbone}")

        if self.decoder == "hrnet_head":
            from semi_supervised_semantic_segmentation_tpu.models.hrnet import (
                HRNetV2Head,
            )

            logits = HRNetV2Head(
                num_classes=self.num_classes,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                fuse_order=self.head_fuse,
                name="decoder",
            )(taps, out_hw, train)
        elif self.decoder == "unet":
            logits = UNetDecoder(
                num_classes=self.num_classes,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name="decoder",
            )(taps, out_hw, train)
        elif self.decoder == "deeplabv3plus":
            # Scale ASPP rates with the output stride (DeepLab convention:
            # rates double at os 8).
            rates = tuple(
                r * (16 // self.output_stride) for r in self.aspp_dilations
            )
            logits = DeepLabV3Plus(
                num_classes=self.num_classes,
                features=self.decoder_channels,
                dilations=rates,
                norm=self.norm,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                name="decoder",
            )(taps, out_hw, train)
        else:
            raise ValueError(f"unknown decoder: {self.decoder}")
        return logits


def build_model(cfg: Config, mesh: Any = None) -> SegModel:
    """Build the SegModel for ``cfg``.  ``mesh`` only matters when
    ``cfg.parallel.model_parallel > 1``: the HRNet stem then runs H-sharded
    over the mesh's 'model' axis (spatial partitioning, SURVEY §2.3)."""
    spatial_mesh = (
        mesh if (mesh is not None and cfg.parallel.model_parallel > 1) else None
    )
    return SegModel(
        backbone=cfg.model.backbone,
        decoder=cfg.model.decoder,
        num_classes=cfg.data.num_classes,
        output_stride=cfg.model.output_stride,
        norm=cfg.model.norm,
        bn_momentum=cfg.model.bn_momentum,
        dtype=_DTYPES[cfg.model.compute_dtype],
        aspp_dilations=cfg.model.aspp_dilations,
        decoder_channels=cfg.model.decoder_channels,
        remat=cfg.model.remat if cfg.model.remat != "none" else "",
        stem_impl=cfg.model.stem_impl,
        fuse_impl=cfg.model.fuse_impl,
        branch_conv=cfg.model.branch_conv,
        head_fuse=cfg.model.head_fuse,
        dp_mesh=(
            mesh
            if (mesh is not None and dict(mesh.shape).get("data", 1) > 1
                and (cfg.model.branch_conv == "pallas"
                     or cfg.model.stem_impl == "pallas"))
            else None
        ),
        spatial_mesh=spatial_mesh,
    )
