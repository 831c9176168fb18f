"""HRNet-W48 encoder (rebuilds C8) — HRNetV2 topology in flax/NHWC.

Structure (standard HRNet-W48):
  stem: two 3x3 stride-2 Conv-BN-ReLU (-> stride 4, 64 ch)
  layer1: 4 Bottleneck(64) -> 256 ch @ s4
  transition1 -> branches [48, 96]
  stage2: 1 module  x branches [48, 96],        4 BasicBlocks each + fusion
  transition2 -> + branch 192
  stage3: 4 modules x branches [48, 96, 192]
  transition3 -> + branch 384
  stage4: 3 modules x branches [48, 96, 192, 384]

Cross-resolution fusion: j->i uses 1x1 Conv-BN + bilinear upsample (j > i)
or chained 3x3 stride-2 Conv-BNs (j < i), summed then ReLU — all resizes via
the torch-parity bilinear (align_corners=False).

For the shared decoder interface the branches map onto pyramid taps:
  c1 = stem conv1 output (s2, 64) ... c5 = branch3 (s32, 384)
so the U-Net decoder (config 5 pairs HRNet with 'unet') consumes HRNet
exactly like a ResNet pyramid.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semi_supervised_semantic_segmentation_tpu.models.layers import ConvNormAct, Norm
from semi_supervised_semantic_segmentation_tpu.models.resnet import BasicBlock, Bottleneck
from semi_supervised_semantic_segmentation_tpu.ops.resize import resize_bilinear


class HRModule(nn.Module):
    channels: Tuple[int, ...]
    num_blocks: int = 4
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    # True = checkpoint each branch BasicBlock ('branches' remat plan): the
    # block chains recompute on backward but the fuse layers (stride-2 convs
    # + upsamples, the layout-copy-heavy part of the profile) keep their
    # activations stored.
    remat_blocks: bool = False
    # True = compute the stride-2 fuse-down convs via explicit 2x2
    # space-to-depth (models/layers.py::S2DStemConv): the profile's top
    # copy lines are XLA's internal space-to-depth relayouts around these
    # small-channel stride-2 convs; the explicit form is one reshape and a
    # lane-filling 4*Cin-channel conv.  Exact same math and param layout.
    fuse_s2d: bool = False
    # 'xla' | 'pallas': conv path for the branch BasicBlock chains.  'pallas'
    # runs eligible branches (C <= 128, H % 32 == 0) in NCHW through the
    # layout-pinned kernel (ops/pallas_conv.py) — one transpose in/out per
    # 4-block chain, zero relayouts inside.  Exact same math and param tree;
    # ineligible branches/shapes keep the NHWC XLA path.
    branch_conv: str = "xla"
    # Mesh for the pallas kernels' data-sharded shard_map (multi-chip DP).
    dp_mesh: Any = None

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        n = len(self.channels)
        block_cls = (
            nn.remat(BasicBlock, static_argnums=(2,))
            if self.remat_blocks
            else BasicBlock
        )
        ys = []
        for i, c in enumerate(self.channels):
            x = xs[i]
            nchw = (
                self.branch_conv == "pallas" and c <= 128
                and x.shape[1] % 32 == 0
            )
            if nchw:
                x = jnp.transpose(x, (0, 3, 1, 2))
            ch_axis = 1 if nchw else -1
            for b in range(self.num_blocks):
                x = block_cls(
                    planes=c,
                    downsample=(b == 0 and x.shape[ch_axis] != c),
                    norm=self.norm,
                    bn_momentum=self.bn_momentum,
                    dtype=self.dtype,
                    data_format="NCHW" if nchw else "NHWC",
                    dp_mesh=self.dp_mesh if nchw else None,
                    name=f"branch{i}_block{b}",
                )(x, train)
            if nchw:
                x = jnp.transpose(x, (0, 2, 3, 1))
            ys.append(x)

        outs = []
        for i in range(n):
            acc = ys[i]
            for j in range(n):
                if j == i:
                    continue
                if j > i:
                    # lower res -> 1x1 conv + bilinear upsample to res i
                    t = ConvNormAct(
                        self.channels[i], (1, 1), act=False, norm=self.norm,
                        bn_momentum=self.bn_momentum, dtype=self.dtype,
                        name=f"fuse_up_{j}_to_{i}",
                    )(ys[j], train)
                    t = resize_bilinear(
                        t, (ys[i].shape[1], ys[i].shape[2]), align_corners=False
                    ).astype(acc.dtype)
                else:
                    # higher res -> chained stride-2 3x3 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = ConvNormAct(
                            self.channels[i] if last else self.channels[j],
                            (3, 3), strides=(2, 2), act=not last,
                            norm=self.norm, bn_momentum=self.bn_momentum,
                            dtype=self.dtype, s2d=self.fuse_s2d,
                            name=f"fuse_down_{j}_to_{i}_{k}",
                        )(t, train)
                acc = acc + t
            outs.append(nn.relu(acc))
        return outs


class HRNetV2Head(nn.Module):
    """The HRNetV2 segmentation head (official HRNet-Semantic-Segmentation
    ``last_layer``): upsample every branch to the stride-4 resolution,
    concatenate (48+96+192+384 = 720 ch for W48), 1x1 Conv-BN-ReLU at the
    concat width, 1x1 conv to classes, bilinear to input resolution.

    TPU restructuring (same math, same parameter count): a 1x1 conv over a
    channel concat is the sum of per-branch 1x1 convs with the row blocks of
    the fuse kernel, and per-channel bilinear resize commutes with channel
    matmuls — so each branch's block of the fuse conv runs at the branch's
    NATIVE resolution and only the 720-ch results are upsampled and summed.
    At 1024² crops that is ~8x fewer fuse-GEMM FLOPs (65536 vs ~5.9M
    effective pixel·channel products per output channel) and it never
    materializes the 720-channel concat, whose relayout copies showed up as
    a top line in the config-5 profile.  BN+ReLU over the sum is identical
    to BN+ReLU over the concat-conv output.
    """

    num_classes: int
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    # 'conv_first' (default): per-branch fuse conv at NATIVE resolution,
    # upsample the 720-wide result (~8x fewer fuse-GEMM FLOPs).
    # 'up_first': upsample the branch tap at its OWN width (96/192/384 ch,
    # 2-7.5x less resize traffic than the 720-wide resizes whose layout
    # copies show on the config-5 trace), conv at base resolution — more
    # MXU FLOPs, less bandwidth.  Same math and parameter tree either way.
    fuse_order: str = "conv_first"

    @nn.compact
    def __call__(self, taps: Dict[str, jnp.ndarray], out_hw, train: bool = False):
        base = taps["c2"]  # stride 4, width ch
        width = sum(taps[k].shape[-1] for k in ("c2", "c3", "c4", "c5"))
        acc = nn.Conv(
            width, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="fuse0",
        )(base)
        for i, k in enumerate(("c3", "c4", "c5")):
            conv = nn.Conv(
                width, (1, 1), use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"fuse{i + 1}",
            )
            if self.fuse_order == "up_first":
                t = conv(resize_bilinear(
                    taps[k], (base.shape[1], base.shape[2]),
                    align_corners=False).astype(self.dtype))
                acc = acc + t
            else:
                t = conv(taps[k])
                acc = acc + resize_bilinear(
                    t, (base.shape[1], base.shape[2]), align_corners=False
                ).astype(acc.dtype)
        x = Norm(
            kind=self.norm, momentum=self.bn_momentum, dtype=self.dtype,
            name="fuse_norm",
        )(acc, train)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="head",
        )(x)
        return resize_bilinear(logits, out_hw, align_corners=False)


class HRNet(nn.Module):
    width: int = 48
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    # (num_modules, num_branches) per stage 2..4; 4 blocks per branch.
    stage_modules: Tuple[int, int, int] = (1, 4, 3)
    # Rematerialization plan: which parts recompute activations on the
    # backward pass.  () = none; (1,2,3,4) = layer1 + every HR stage (the
    # "blocks" config value).  Selective plans trade HBM for recompute
    # FLOPs at finer grain than all-or-nothing: at 1024² the no-remat step
    # needs ~18.6G (> 15.75G/chip on v5e), so freeing only the largest
    # stages fits while recomputing less than the full plan.
    remat_stages: Tuple[int, ...] = ()
    # 'module' = nn.remat whole HRModules (checkpoints everything inside,
    # fuse resizes included); 'branch_blocks' = checkpoint only the branch
    # BasicBlocks, keep fuse-layer activations stored ('branches' plan).
    remat_scope: str = "module"
    # 'conv' | 's2d': formulation of the stride-2 fuse-down/transition convs
    # (see HRModule.fuse_s2d).
    fuse_impl: str = "conv"
    # 'conv' | 's2d': the two 3x3/s2 stem convs via explicit 2x2
    # space-to-depth (Cin 3->12 / 64->256 fills contraction lanes denser;
    # the config-5 trace shows the stem1 dW fusion at 2.9 ms/step reading
    # the 1024^2 Cin=3 input at 3/128-lane density).  Exact same math and
    # parameter layout (models/layers.py::S2DStemConv).  Ignored when
    # spatial_mesh is set (the H-sharded SpatialConv path wins).
    stem_impl: str = "conv"
    # 'xla' | 'pallas': branch BasicBlock conv path (see HRModule).
    branch_conv: str = "xla"
    # Mesh for the pallas kernels' data-sharded shard_map (multi-chip DP).
    dp_mesh: Any = None
    # Optional per-stage branch-width override (default () = (w,2w,4w,8w)).
    # Perf experiment surface: widths below 128 pad to 128 lanes in every
    # conv operand anyway, and the compact-vs-padded layout mismatch is what
    # drives config-5's transpose-copy tax (BASELINE.md) — padding widths
    # explicitly trades elementwise/HBM volume for zero relayouts.
    branch_widths: Tuple[int, ...] = ()
    # Optional Mesh with a >1 'model' axis: the two full/half-resolution
    # stem convs (the largest activations at 1024^2) run H-sharded with halo
    # exchange (models/layers.py::SpatialConv); activations re-replicate
    # before layer1.  SURVEY §2.3/§5 spatial-partitioning escape hatch.
    spatial_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        w = self.width
        widths = self.branch_widths or (w, 2 * w, 4 * w, 8 * w)
        kw = dict(norm=self.norm, bn_momentum=self.bn_momentum, dtype=self.dtype)
        branch_scope = self.remat_scope == "branch_blocks"
        fuse_s2d = self.fuse_impl == "s2d"

        # nn.remat over list-of-arrays args: train (argnum 2) stays static.
        mod_kw = dict(fuse_s2d=fuse_s2d, branch_conv=self.branch_conv,
                      dp_mesh=self.dp_mesh)

        def module_for(stage: int):
            if stage not in self.remat_stages:
                return functools.partial(HRModule, **mod_kw)
            if branch_scope:
                return functools.partial(HRModule, remat_blocks=True, **mod_kw)
            return functools.partial(
                nn.remat(HRModule, static_argnums=(2,)), **mod_kw
            )

        stem_s2d = self.stem_impl == "s2d" and self.spatial_mesh is None
        x = ConvNormAct(
            64, (3, 3), strides=(2, 2), spatial_mesh=self.spatial_mesh,
            s2d=stem_s2d, name="stem1", **kw
        )(x, train)
        c1 = x  # stride 2
        x = ConvNormAct(
            64, (3, 3), strides=(2, 2), spatial_mesh=self.spatial_mesh,
            s2d=stem_s2d, name="stem2", **kw
        )(x, train)
        if self.spatial_mesh is not None and not self.is_initializing():
            # Leave the spatially-partitioned region: the rest of the net
            # (stride >= 4, small activations) runs batch-DP only.  Skipped
            # during init: the batch-1 shape dummy need not divide the
            # 'data' axis (SpatialConv has the same init carve-out).
            from jax.sharding import NamedSharding, PartitionSpec as P

            import jax

            rep = NamedSharding(self.spatial_mesh, P("data", None, None, None))
            x = jax.lax.with_sharding_constraint(x, rep)
            c1 = jax.lax.with_sharding_constraint(c1, rep)

        layer1_cls = (
            nn.remat(Bottleneck, static_argnums=(2,))
            if 1 in self.remat_stages
            else Bottleneck
        )
        for b in range(4):
            x = layer1_cls(
                planes=64, downsample=(b == 0), name=f"layer1_{b}", **kw
            )(x, train)  # -> 256 ch @ s4

        # transition1: 256 -> [48, 96(s8)]
        b0 = ConvNormAct(widths[0], (3, 3), name="transition1_0", **kw)(x, train)
        b1 = ConvNormAct(
            widths[1], (3, 3), strides=(2, 2), s2d=fuse_s2d,
            name="transition1_1", **kw
        )(x, train)
        xs = [b0, b1]

        for m in range(self.stage_modules[0]):
            xs = module_for(2)(widths[:2], name=f"stage2_m{m}", **kw)(xs, train)

        xs.append(
            ConvNormAct(
                widths[2], (3, 3), strides=(2, 2), s2d=fuse_s2d,
                name="transition2_2", **kw
            )(xs[-1], train)
        )
        for m in range(self.stage_modules[1]):
            xs = module_for(3)(widths[:3], name=f"stage3_m{m}", **kw)(xs, train)

        xs.append(
            ConvNormAct(
                widths[3], (3, 3), strides=(2, 2), s2d=fuse_s2d,
                name="transition3_3", **kw
            )(xs[-1], train)
        )
        for m in range(self.stage_modules[2]):
            xs = module_for(4)(widths[:4], name=f"stage4_m{m}", **kw)(xs, train)

        return {"c1": c1, "c2": xs[0], "c3": xs[1], "c4": xs[2], "c5": xs[3]}
