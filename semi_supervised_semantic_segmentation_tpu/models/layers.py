"""Shared model building blocks (flax.linen, NHWC, bf16 compute / f32 params).

Conventions (TPU-first):
  - NHWC layout everywhere; convs lower to XLA:TPU MXU convolutions.
  - ``dtype`` is the compute dtype (bf16 by default), ``param_dtype`` stays
    float32; flax BatchNorm computes statistics in f32 internally.
  - BatchNorm under data parallelism: with GSPMD jit the batch axis is
    sharded on the mesh, so the mean/variance reductions XLA emits are
    *global* — SyncBN semantics with zero extra code (SURVEY.md N3).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from semi_supervised_semantic_segmentation_tpu.ops import pooling


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch ``nn.BatchNorm2d`` training semantics.

    Differences from ``flax.linen.BatchNorm`` (both matter for the
    reference-trajectory parity gate, tests/test_reference_trajectory.py):
      - the running variance is updated with the *unbiased* batch variance
        (factor N/(N-1), torch behavior); flax uses the biased one.  At real
        crop sizes the factor is <1e-5, but at the small spatial sizes of the
        deepest taps it reaches percents — enough to drift teacher/eval
        forwards, which read running stats.
      - normalization is applied as a per-channel ``x * mul + add`` with
        ``mul/add`` precomputed in f32 (exactly how torch's kernels fold BN);
        on TPU this is also the cheaper form — one fused multiply-add in the
        compute dtype instead of a subtract/divide chain.

    Stats are computed in f32 with the one-pass E[x^2]-E[x]^2 formulation
    (flax's fast-variance default; single HBM read).  Under GSPMD data
    parallelism the mean reductions span the sharded batch axis, so this is
    SyncBN for free, same as round 1 (models/layers.py docstring).
    """

    momentum: float = 0.9  # ra = momentum * ra + (1 - momentum) * batch
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Feature axis: -1 for NHWC (default), 1 for the NCHW branch chains
    # (models/hrnet.py layout-pinned pallas path).  Param shapes/paths are
    # axis-independent, so checkpoints are unaffected.
    axis: int = -1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True, sums=None,
                 count: int = 0):
        """Normal mode (``sums=None``): normalize ``x`` and return it.

        Folded mode (``sums`` = [2, C] f32 per-channel sum / sum-of-squares
        over ``count`` elements, from the fused branch-conv kernel): compute
        the SAME statistics from the sums, update running stats identically,
        and return the folded ``(mul, add)`` f32 [C] pair instead of
        applying — the caller applies it (or feeds it to the next kernel's
        in-VMEM input transform).  ``x`` is unused in folded mode.
        """
        feat = sums.shape[1] if sums is not None else x.shape[self.axis]
        axis = self.axis % x.ndim if sums is None else 0
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if sums is not None:
                n = count
                mean = sums[0] / n
                mean2 = sums[1] / n
            else:
                axes = tuple(a for a in range(x.ndim) if a != axis)
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=axes)
                mean2 = jnp.mean(jnp.square(xf), axis=axes)
                n = 1
                for a in axes:
                    n *= x.shape[a]
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        if sums is not None:
            return mul, add
        bshape = tuple(feat if a == axis else 1 for a in range(x.ndim))
        mul, add = mul.reshape(bshape), add.reshape(bshape)
        return x * mul.astype(self.dtype) + add.astype(self.dtype)


class Norm(nn.Module):
    """Switchable normalization: BatchNorm (reference default) or GroupNorm."""

    kind: str = "batchnorm"
    momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    axis: int = -1

    @nn.compact
    def __call__(self, x, train: bool = False, sums=None, count: int = 0):
        if self.kind == "batchnorm":
            # name pinned so param paths (and checkpoints/compat exports)
            # stay identical to the flax.linen.BatchNorm it replaced.
            return TorchBatchNorm(
                momentum=self.momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                axis=self.axis,
                name="BatchNorm_0",
            )(x, use_running_average=not train, sums=sums, count=count)
        assert sums is None, "folded-stats mode is batchnorm-only"
        if self.kind == "groupnorm":
            assert self.axis == -1, "groupnorm supports NHWC only"
            groups = min(32, x.shape[-1])
            return nn.GroupNorm(
                num_groups=groups, dtype=self.dtype, param_dtype=jnp.float32
            )(x)
        raise ValueError(f"unknown norm kind: {self.kind}")


class SpatialConv(nn.Module):
    """Stride-2 3x3 conv computed under ``shard_map`` with activation H
    sharded on the 'model' mesh axis and a one-row halo pulled over ICI
    (parallel/spatial.py) — the spatial-partitioning escape hatch for
    full-resolution stem activations (SURVEY §2.3/§5).  Param path pinned to
    the nn.Conv layout (``kernel`` under a module named 'Conv_0') so
    checkpoints and torch imports are unchanged.  Numerically identical to
    the plain conv (tests/test_spatial.py)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    mesh: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from semi_supervised_semantic_segmentation_tpu.parallel import (
            spatial as sp,
        )

        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        if self.is_initializing():
            # init() runs on a batch-1 dummy that need not divide the mesh;
            # param shapes don't depend on the sharded path.
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype), (2, 2),
                padding=[((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        mesh = self.mesh
        axis_size = mesh.shape["model"]
        spec = P("data", "model", None, None)
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        def local(xl, wl):
            return sp.spatial_conv2d_stride2(xl, wl, "model", axis_size)

        return sp.shard_map(
            local, mesh=mesh, in_specs=(spec, P()), out_specs=spec
        )(x.astype(self.dtype), w.astype(self.dtype))


class PallasConvBN(nn.Module):
    """Fused branch-chain conv (ops/pallas_conv.py::conv3x3_bn_nchw):
    stride-1 SAME 3x3 conv on NCHW activations that also (a) applies the
    PREVIOUS layer's folded BatchNorm+ReLU to its input inside VMEM when
    ``fold`` is given (the normalized tensor never exists in HBM) and
    (b) returns the [2, C] f32 per-channel (sum, sum-of-squares) of its
    output — the NEXT BatchNorm's batch statistics, accumulated under the
    MXU shadow.  Param layout identical to nn.Conv (``kernel`` [3,3,Ci,Co]
    f32, module named 'Conv_0' by callers) so checkpoints/torch imports are
    unchanged.  Unsupported shapes and init fall back to the numerically
    identical XLA formulation."""

    features: int
    dtype: Any = jnp.bfloat16
    # Mesh with a >1 'data' axis: run the kernels under shard_map with the
    # batch sharded (GSPMD cannot partition the opaque custom call; see
    # ops/pallas_conv.py::conv3x3_bn_nchw).
    dp_mesh: Any = None

    @nn.compact
    def __call__(self, x, fold=None):
        from semi_supervised_semantic_segmentation_tpu.ops import pallas_conv

        cin = x.shape[1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        on_cpu = jax.default_backend() == "cpu"
        usable = pallas_conv.supported(x.shape, cin, self.features)
        if self.is_initializing() or not usable:
            if fold is not None:
                # f32 fma + relu, single rounding — same as the kernel's
                # in-VMEM transform (conv3x3_bn_nchw).
                mul, add = fold
                x = nn.relu(x.astype(jnp.float32)
                            * mul[None, :, None, None]
                            + add[None, :, None, None]).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                x, k.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
            )
            y32 = y.astype(jnp.float32)
            s = jnp.stack([jnp.sum(y32, axis=(0, 2, 3)),
                           jnp.sum(jnp.square(y32), axis=(0, 2, 3))])
            return y, s
        mul, add = fold if fold is not None else (None, None)
        return pallas_conv.conv3x3_bn_nchw(
            x, k, mul, add, interpret=on_cpu, mesh=self.dp_mesh)


class ConvNormAct(nn.Module):
    """Conv -> Norm -> (optional) ReLU, the workhorse block."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    act: bool = True
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    # Compute a stride-2 small-Cin conv via space-to-depth (see S2DStemConv)
    # — exact same math and param layout, 4x denser MXU input feed.
    s2d: bool = False
    # Stride-2 Cin=3 stem via the im2col-stacked pallas kernel
    # (ops/pallas_stem.py) — K=256 contraction lanes instead of 3.  Falls
    # back to the plain conv for unsupported shapes; exact same params.
    pallas_stem: bool = False
    # When set (a jax.sharding.Mesh with a >1 'model' axis), stride-2 convs
    # run H-sharded under shard_map with halo exchange (SpatialConv).
    spatial_mesh: Any = None
    # 'NHWC' (default) or 'NCHW': the layout-pinned HRNet branch path keeps
    # activations NCHW (W in lanes) and computes the conv via PallasConvBN.
    data_format: str = "NHWC"
    # Mesh for the pallas branch kernels' data-sharded shard_map (NCHW only).
    dp_mesh: Any = None
    # NCHW only: return (y_raw, (mul, add)) — the conv output BEFORE the
    # BatchNorm apply plus the folded f32 [C] scale/bias.  The caller either
    # feeds the pair to the next PallasConvBN (fused in-VMEM apply+ReLU) or
    # applies it around a residual add.  ``act`` is then the CALLER's
    # responsibility.
    raw_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.data_format == "NCHW":
            assert (
                self.kernel == (3, 3)
                and self.strides == (1, 1)
                and self.dilation == (1, 1)
                and not self.use_bias
                and not self.s2d
                and self.spatial_mesh is None
            ), "NCHW path covers the stride-1 3x3 branch convs only"
            fold_in = None
            if isinstance(x, tuple):
                x, fold_in = x
            y, s = PallasConvBN(
                self.features, dtype=self.dtype, dp_mesh=self.dp_mesh,
                name="Conv_0")(x, fold_in)
            count = y.shape[0] * y.shape[2] * y.shape[3]
            fold = Norm(self.norm, self.bn_momentum, self.dtype, axis=1)(
                None, train, sums=s, count=count)
            if self.raw_out:
                return y, fold
            mul, add = fold
            out = (y * mul.astype(self.dtype)[None, :, None, None]
                   + add.astype(self.dtype)[None, :, None, None])
            return nn.relu(out) if self.act else out
        if self.spatial_mesh is not None:
            assert self.strides == (2, 2) and self.dilation == (1, 1) and not self.use_bias
            x = SpatialConv(
                self.features, self.kernel, mesh=self.spatial_mesh,
                dtype=self.dtype, name="Conv_0",
            )(x)
        elif self.pallas_stem:
            assert self.strides == (2, 2) and self.dilation == (1, 1) and not self.use_bias
            x = PallasStemConv(
                self.features, self.kernel, dtype=self.dtype,
                dp_mesh=self.dp_mesh, name="Conv_0"
            )(x)
        elif self.s2d:
            assert self.strides == (2, 2) and self.dilation == (1, 1) and not self.use_bias
            # name pinned to 'Conv_0' so the param path matches the nn.Conv
            # it replaces (checkpoints, torch imports).
            x = S2DStemConv(
                self.features, self.kernel, dtype=self.dtype, name="Conv_0"
            )(x)
        else:
            pad = (
                (self.kernel[0] - 1) * self.dilation[0] // 2,
                (self.kernel[1] - 1) * self.dilation[1] // 2,
            )
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=((pad[0], pad[0]), (pad[1], pad[1])),
                kernel_dilation=self.dilation,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        x = Norm(self.norm, self.bn_momentum, self.dtype)(x, train)
        if self.act:
            x = nn.relu(x)
        return x


def max_pool_same_as_torch(x, window: int = 3, stride: int = 2, pad: int = 1):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) with -inf padding.

    SSTPU_POOL_BWD=vect routes the (3, 2, 1) even-spatial case through
    ops/pooling.py, whose custom VJP replaces XLA's SelectAndScatter
    backward with a dense tap-mask interleave — measured SLOWER whole-step
    (ops/pooling.py docstring), so the default is the plain reduce_window
    path."""
    if window == 3 and stride == 2 and pad == 1 and pooling.supported(x.shape):
        return pooling.max_pool_3x3s2(x)
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )


class PallasStemConv(nn.Module):
    """Stride-2 small-Cin stem conv through ops/pallas_stem.py (the im2col-
    stacked MXU kernel; see that module's header for the formulation and
    measured numbers).  Param layout identical to nn.Conv (``kernel``
    [k,k,3,features] f32, callers pin name='Conv_0') so checkpoints and
    torch-weight imports are unchanged.  Unsupported shapes, init, and
    conv-eligibility failures fall back to the numerically equivalent
    XLA convolution.

    ``with_stats=True`` returns the kernel's fused-BN form instead:
    (NCHW y, [2, features] f32 (sum, sum-of-squares) batch stats)."""

    features: int
    kernel: Tuple[int, int] = (7, 7)
    dtype: Any = jnp.bfloat16
    with_stats: bool = False
    # Mesh with a >1 'data' axis: run the kernel data-sharded under
    # shard_map with a [2, features] stats psum (GSPMD cannot partition
    # the opaque custom call — see ops/pallas_stem.py::stem_conv_bn_s2).
    dp_mesh: Any = None

    @nn.compact
    def __call__(self, x):
        from semi_supervised_semantic_segmentation_tpu.ops import pallas_stem

        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        usable = pallas_stem.supported(x.shape, self.kernel, (2, 2))
        if self.is_initializing() or not usable:
            assert not self.with_stats, "callers gate the fused form"
            pad = ((kh - 1) // 2, (kw - 1) // 2)
            return jax.lax.conv_general_dilated(
                x, w.astype(self.dtype), (2, 2),
                ((pad[0], pad[0]), (pad[1], pad[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        on_cpu = jax.default_backend() == "cpu"
        # w stays f32: _pack_w casts to the compute dtype inside, and the
        # VJP then returns an f32 weight cotangent matching the param.
        # The kernel's VJP returns a hard-zero x-cotangent by design (the
        # stem input is data); make that contract explicit here so any
        # placement that needs input gradients (e.g. adversarial
        # perturbation) sees a stop_gradient, not a silent wrong grad.
        x = jax.lax.stop_gradient(x)
        if self.with_stats:
            return pallas_stem.stem_conv_bn_s2(x, w, on_cpu, self.dp_mesh)
        return pallas_stem.stem_conv_s2(x, w, on_cpu, self.dp_mesh)


class PallasStemSegment(nn.Module):
    """Stem conv + BatchNorm + ReLU + 3x3/s2 maxpool as one NCHW segment.

    The pallas stem kernel (ops/pallas_stem.py) emits NCHW activations plus
    fused BN batch stats; BN apply, ReLU, and the maxpool then run NCHW —
    W sits in dense 128 lanes instead of NHWC's half-empty 64-channel lane
    dim — and ONE transpose back to NHWC happens at the 4x-smaller maxpool
    output (the c1 tap's transpose is dead code for decoders that don't
    consume it).  Exact same math and param tree as the plain
    ConvNormAct(7x7, s2) + max_pool_same_as_torch path, which is also the
    fallback for unsupported shapes/init.  Returns (pooled, c1), NHWC."""

    features: int
    kernel: Tuple[int, int] = (7, 7)
    norm: str = "batchnorm"
    bn_momentum: float = 0.9
    dtype: Any = jnp.bfloat16
    # Mesh with a >1 'data' axis (see PallasStemConv.dp_mesh).
    dp_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from semi_supervised_semantic_segmentation_tpu.ops import pallas_stem

        usable = (
            pallas_stem.supported(x.shape, self.kernel, (2, 2))
            and self.norm == "batchnorm"
        )
        if self.is_initializing() or not usable:
            # numerically identical NHWC path, identical param tree (the
            # unnamed nn.Conv/Norm take the same auto names Conv_0/Norm_0
            # as in ConvNormAct).
            kh, kw = self.kernel
            pad = ((kh - 1) // 2, (kw - 1) // 2)
            y = nn.Conv(
                self.features,
                self.kernel,
                strides=(2, 2),
                padding=((pad[0], pad[0]), (pad[1], pad[1])),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x.astype(self.dtype))
            y = Norm(self.norm, self.bn_momentum, self.dtype)(y, train)
            y = nn.relu(y)
            return max_pool_same_as_torch(y), y
        y, s = PallasStemConv(
            self.features, self.kernel, dtype=self.dtype, with_stats=True,
            dp_mesh=self.dp_mesh, name="Conv_0",
        )(x)
        n, c, h2, w2 = y.shape
        fold = Norm(self.norm, self.bn_momentum, self.dtype)(
            None, train, sums=s, count=n * h2 * w2)
        mul, add = fold
        # same fma expression/rounding as TorchBatchNorm's NHWC apply
        y = nn.relu(y * mul.astype(self.dtype)[None, :, None, None]
                    + add.astype(self.dtype)[None, :, None, None])
        # init must be a concrete scalar so lax recognizes the max monoid
        # (otherwise the generic reduce_window has no reverse-mode rule).
        pooled = jax.lax.reduce_window(
            y,
            -jnp.inf,
            jax.lax.max,
            (1, 1, 3, 3),
            (1, 1, 2, 2),
            ((0, 0), (0, 0), (1, 1), (1, 1)),
        )
        return pooled.transpose(0, 2, 3, 1), y.transpose(0, 2, 3, 1)


class S2DStemConv(nn.Module):
    """Stride-2 conv on a 2x2 space-to-depth input (MLPerf-style stem).

    A kxk stride-2 conv with Cin=3 feeds the MXU at 3/128 of its input
    lanes (config-3 profile: conv1 forward ran at ~6% MFU and the stem
    accounted for ~6% of the whole step).  Rearranging the input as
    [N, H/2, W/2, 4*Cin] and scattering the kernel's taps into a
    ceil((k+1)/2)-tap kernel over the phase-expanded channels computes the
    SAME convolution (exactly: every (a,b) tap of the original kernel maps
    to one (da, p) phase tap) with 4x denser input channels.  The param
    keeps the original nn.Conv layout (k, k, Cin, features) so checkpoints
    and torch-weight imports are unchanged.

    Requires stride 2, odd k, torch-style (k-1)/2 padding, even H and W.
    """

    features: int
    kernel: Tuple[int, int] = (7, 7)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        n, h, wd, _ = x.shape
        x2 = (
            x.reshape(n, h // 2, 2, wd // 2, 2, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, wd // 2, 4 * cin)
        )

        def axis_taps(k):
            ph = (k - 1) // 2
            taps = []
            for a in range(k):
                p = (a - ph) % 2
                da = (a - ph - p) // 2
                taps.append((da, p))
            dmin = min(t[0] for t in taps)
            dmax = max(t[0] for t in taps)
            return taps, dmin, dmax

        taps_h, hmin, hmax = axis_taps(kh)
        taps_w, wmin, wmax = axis_taps(kw)
        w2 = jnp.zeros(
            (hmax - hmin + 1, wmax - wmin + 1, 2, 2, cin, self.features),
            jnp.float32,
        )
        for a, (da, p) in enumerate(taps_h):
            for b, (db, q) in enumerate(taps_w):
                w2 = w2.at[da - hmin, db - wmin, p, q].set(w[a, b])
        w2 = w2.reshape(
            hmax - hmin + 1, wmax - wmin + 1, 4 * cin, self.features
        ).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            w2,
            (1, 1),
            ((-hmin, hmax), (-wmin, wmax)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
