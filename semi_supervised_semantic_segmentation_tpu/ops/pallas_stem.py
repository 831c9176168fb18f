"""Pallas stem conv: odd-k stride-2 Cin=3 convolution as an im2col matmul.

Why this exists (round-4 config-3 profile): the ResNet/HRNet stem
(7x7 stride-2, Cin=3) runs at ~6% MXU under XLA — with 3 input channels the
contraction feeds 3 of 128 lanes, and the 2x2 space-to-depth reformulation
(models/layers.py::S2DStemConv, 12 channels) measured flat because 12 lanes
are still pathological.  This kernel stacks the FULL im2col patch into the
contraction dimension: the stride-2 kxk conv becomes, per 32-row output
block, ONE dot [C_out, k2*k2*16] x [k2*k2*16, 32*W2] (k2 = (k+1)/2) against
a buffer holding all k2*k2 shifted window reads of the space-to-depth
input — K = 256 contraction lanes at k=7 instead of 3.

Measured (one v5e chip, 16x512x512x3, round 4): XLA 7x7 stem fwd 1.57
ms/step in the config-3 trace; this kernel + layout transposes ~0.6 ms
standalone.  Whole-step A/B (round 5, scripts/bench_stem_ab.py): the
standalone win does NOT survive in context — config-3 step 82.5-82.7 ms
with the kernel vs 82.0-82.1 with XLA's conv (boundary transposes +
lost fusion), so 'conv' stays the default and this kernel is a
non-default option (numbers in BASELINE.md).

Layout: the kernel consumes the s2d input as NCHW [N, 12, H2p, W2p]
(W in lanes, rows in sublanes) produced by one XLA transpose of the uint8-
sized stem input (25 MB at 16x512^2 — cheap), and emits NCHW [N, 64, H2,
W2]; the caller transposes back to NHWC.  W2p is W2+128 because Mosaic
requires HBM DMA slices 128-lane-aligned; the pad columns are zero and the
per-(db,da) window reads slice [db : db+W2] out of the padded row.

Backward: dx is not needed (the stem input is data); dW reuses the same
buffer build with the dot transposed — [k2*k2*16, P] x [C_out, P]
contracted over the P = 32*W2 output pixels, accumulated in VMEM f32
across the grid (same pattern as ops/pallas_conv.py's dk kernel).

Rebuilds the N1 surface (reference dep: cuDNN conv kernels) for the stem;
reference recipe context: SURVEY.md C7/C8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 32      # output rows per grid step
GRP = 16     # b16 rows per (db, da) slice: 12 data + 4 zero (tile-aligned)


def supported(x_shape, kernel, strides) -> bool:
    """Static eligibility for NHWC input x [N, H, W, 3]."""
    n, h, w, c = x_shape
    return (
        c == 3
        and kernel[0] == kernel[1]
        and kernel[0] % 2 == 1
        and strides == (2, 2)
        and h % 2 == 0
        and w % 2 == 0
        and (h // 2) % BH == 0
        and (w // 2) % 128 == 0
    )


def _axis_taps(k: int):
    """tap a -> (da >= 0, phase) of the 2x2-s2d reformulation (torch-style
    (k-1)/2 padding) plus the left pad (-dmin) in s2d coordinates; same
    mapping as models/layers.py::S2DStemConv."""
    ph = (k - 1) // 2
    taps = []
    for a in range(k):
        p = (a - ph) % 2
        taps.append(((a - ph - p) // 2, p))
    dmin = min(t[0] for t in taps)
    return [(da - dmin, p) for da, p in taps], -dmin


def _s2d_pad(x, pad_l):
    """NHWC [N,H,W,3] -> NCHW s2d [N, 12, H2+8, W2+128] (zero padded; data
    rows/cols start at pad_l = the conv's left padding in s2d coords; the
    8/128 totals give the DMA row slack and lane alignment)."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x2 = (
        x.reshape(n, h2, 2, w2, 2, c)
        .transpose(0, 2, 4, 5, 1, 3)
        .reshape(n, 4 * c, h2, w2)
    )
    return jnp.pad(
        x2, ((0, 0), (0, 0), (pad_l, 8 - pad_l), (pad_l, 128 - pad_l)))


def _pack_w(w, dtype):
    """[k,k,3,Co] -> A [Co, k2*k2*GRP]: column (db*k2+da)*GRP + u*6+v*3+c
    holds tap (a,b) where (da,u)/(db,v) is the s2d split of a/b; the 4
    trailing columns of each GRP group stay zero."""
    k, _, cin, co = w.shape
    taps, _ = _axis_taps(k)
    k2 = max(t[0] for t in taps) + 1
    cols = np.zeros((k, k), np.int64)
    for ai, (da, u) in enumerate(taps):
        for bi, (db, v) in enumerate(taps):
            cols[ai, bi] = (db * k2 + da) * GRP + u * 2 * cin + v * cin
    a = jnp.zeros((co, k2 * k2 * GRP), w.dtype)
    for ai in range(k):
        for bi in range(k):
            for c in range(cin):
                a = a.at[:, int(cols[ai, bi]) + c].set(w[ai, bi, c, :])
    return a.astype(dtype), k2


def _dma(x_hbm, xbuf, sem, s, slot, nb):
    n2 = s // nb
    i2 = lax.rem(s, nb)
    pltpu.make_async_copy(
        x_hbm.at[n2, :, pl.ds(pl.multiple_of(i2 * BH, 8), BH + 8), :],
        xbuf.at[slot], sem.at[slot],
    ).start()


def _build_b16(xw, b16, k2, w2):
    """Fill b16 rows [(db*k2+da)*GRP : +12] with the (db, da)-shifted window
    read of the s2d rows, flattened to [12, BH*w2]."""
    for db in range(k2):
        for da in range(k2):
            g = (db * k2 + da) * GRP
            b16[g:g + 12, :] = xw[:, da:da + BH, db:db + w2].reshape(
                12, BH * w2)


def _fwd_kernel(x_hbm, a_ref, y_ref, s_ref, xbuf, b16, sem, *, nb, w2, k2, co):
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    @pl.when(step == 0)
    def _():
        _dma(x_hbm, xbuf, sem, 0, 0, nb)
        # the 4 pad rows of each GRP group multiply ZERO columns of A, but
        # uninitialized VMEM can hold Inf/NaN bit patterns (0 * Inf = NaN).
        b16[...] = jnp.zeros_like(b16)
        s_ref[...] = jnp.zeros_like(s_ref)

    @pl.when(step + 1 < total)
    def _():
        _dma(x_hbm, xbuf, sem, step + 1, (step + 1) % 2, nb)

    slot = step % 2
    pltpu.make_async_copy(
        x_hbm.at[0, :, pl.ds(0, BH + 8), :], xbuf.at[slot], sem.at[slot]
    ).wait()
    _build_b16(xbuf[slot], b16, k2, w2)
    y = lax.dot_general(
        a_ref[...], b16[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    yb = y.astype(y_ref.dtype)
    y_ref[0] = yb.reshape(co, BH, w2)
    # next BatchNorm's batch statistics of the bf16-rounded y, accumulated
    # under the MXU shadow (same flow as ops/pallas_conv.py kstack stats).
    y32 = yb.astype(jnp.float32)
    s_ref[0:1, :] += jnp.sum(y32, axis=1)[None, :]
    s_ref[1:2, :] += jnp.sum(y32 * y32, axis=1)[None, :]


def _dw_kernel(x_hbm, dy_ref, y_ref, ds_ref, dk_ref, xbuf, b16, sem, *,
               nb, w2, k2, co):
    """dW with the stats cotangent folded in: the effective output
    cotangent is dY = dy + ds[0] + 2*y*ds[1] (sum / sum-of-squares terms),
    composed in f32 in VPU and rounded to bf16 exactly where the XLA
    reference path rounds (the conv-dW operand)."""
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    @pl.when(step == 0)
    def _():
        _dma(x_hbm, xbuf, sem, 0, 0, nb)
        b16[...] = jnp.zeros_like(b16)
        dk_ref[...] = jnp.zeros_like(dk_ref)

    @pl.when(step + 1 < total)
    def _():
        _dma(x_hbm, xbuf, sem, step + 1, (step + 1) % 2, nb)

    slot = step % 2
    pltpu.make_async_copy(
        x_hbm.at[0, :, pl.ds(0, BH + 8), :], xbuf.at[slot], sem.at[slot]
    ).wait()
    _build_b16(xbuf[slot], b16, k2, w2)
    dy32 = dy_ref[0].reshape(co, BH * w2).astype(jnp.float32)
    y32 = y_ref[0].reshape(co, BH * w2).astype(jnp.float32)
    # ds arrives transposed [co, 2] so the per-channel terms broadcast along
    # sublanes without a lane->sublane relayout.
    ds0 = ds_ref[:, 0:1]
    ds1 = ds_ref[:, 1:2]
    dyr = (dy32 + ds0 + 2.0 * y32 * ds1).astype(b16.dtype)
    dk_ref[...] += lax.dot_general(
        b16[...], dyr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _stem_fwd(x2p, a, k2, co, interpret):
    n, _, hp, wp = x2p.shape
    h2, w2 = hp - 8, wp - 128
    nb = h2 // BH
    kern = functools.partial(_fwd_kernel, nb=nb, w2=w2, k2=k2, co=co)
    return pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((co, k2 * k2 * GRP), lambda nn_, ii: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, co, BH, w2), lambda nn_, ii: (nn_, 0, ii, 0)),
            pl.BlockSpec((2, co), lambda nn_, ii: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, co, h2, w2), x2p.dtype),
            jax.ShapeDtypeStruct((2, co), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 12, BH + 8, wp), x2p.dtype),
            pltpu.VMEM((k2 * k2 * GRP, BH * w2), x2p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2p, a)


def _stem_dw(x2p, dy, y, ds, k2, co, interpret):
    n, _, hp, wp = x2p.shape
    h2, w2 = hp - 8, wp - 128
    nb = h2 // BH
    kern = functools.partial(_dw_kernel, nb=nb, w2=w2, k2=k2, co=co)
    return pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, co, BH, w2), lambda nn_, ii: (nn_, 0, ii, 0)),
            pl.BlockSpec((1, co, BH, w2), lambda nn_, ii: (nn_, 0, ii, 0)),
            pl.BlockSpec((co, 2), lambda nn_, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k2 * k2 * GRP, co), lambda nn_, ii: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k2 * k2 * GRP, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 12, BH + 8, wp), x2p.dtype),
            pltpu.VMEM((k2 * k2 * GRP, BH * w2), x2p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x2p, dy, y, ds)


def _unpack_dk(dk2, k, cin, co):
    """[k2*k2*GRP, Co] f32 -> [k, k, cin, Co] (inverse of _pack_w)."""
    taps, _ = _axis_taps(k)
    k2 = max(t[0] for t in taps) + 1
    rows = np.zeros((k, k, cin), np.int64)
    for ai, (da, u) in enumerate(taps):
        for bi, (db, v) in enumerate(taps):
            for c in range(cin):
                rows[ai, bi, c] = (db * k2 + da) * GRP + u * 2 * cin + v * cin + c
    return dk2[jnp.asarray(rows.reshape(-1))].reshape(k, k, cin, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stem_conv_bn_core(x, w, interpret: bool = False):
    """Single-shard core of :func:`stem_conv_bn_s2` (custom-VJP'd)."""
    (y, s), _ = _stem_fwd_rule(x, w, interpret)
    return y, s


def stem_conv_bn_s2(x, w, interpret: bool = False, mesh=None):
    """NHWC [N,H,W,3] x [k,k,3,Co] stride-2 SAME conv -> (NCHW y, [2,Co]
    f32 (sum, sum-of-squares) of y — the next BatchNorm's batch stats).

    Conv numerics match lax.conv_general_dilated in the compute dtype up to
    bf16 accumulation-order spread (dots accumulate f32, output rounds
    once).  The VJP folds the stats cotangent into the weight grad
    (dY = dy + ds0 + 2*y*ds1, composed in-kernel) and returns a zero
    x-cotangent (the stem input is data) plus an f32 weight grad.

    ``mesh`` (a Mesh whose 'data' axis is > 1): run under ``shard_map``
    with the batch on 'data' — GSPMD treats the opaque tpu_custom_call as
    non-partitionable, so without this a batch-sharded input would be
    all-gathered and every chip would compute the full global batch (same
    rationale as ops/pallas_conv.py::conv3x3_bn_nchw).  One [2, Co] psum
    restores the global BN statistics (SyncBN semantics); the replicated
    weight's cotangent is psummed by the shard_map transpose.
    """
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return _stem_conv_bn_core(x, w, interpret)
    from jax.sharding import PartitionSpec as P

    try:  # jax >= 0.7 top-level API
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local(xs, ws):
        y, s = _stem_conv_bn_core(xs, ws, interpret)
        return y, jax.lax.psum(s, "data")

    return shard_map(
        local, mesh=mesh, in_specs=(P("data"), P()),
        out_specs=(P("data"), P()), check_vma=False,
    )(x, w)


def _stem_fwd_rule(x, w, interpret):
    co = w.shape[-1]
    _, pad_l = _axis_taps(w.shape[0])
    x2p = _s2d_pad(x, pad_l)
    a, k2 = _pack_w(w, x.dtype)
    y, s = _stem_fwd(x2p, a, k2, co, interpret)
    # w rides the residuals only for its (static) shape — 37 KB at 7x7x3x64;
    # y is needed by the dW kernel's stats-cotangent fold (and is alive
    # anyway as the BN/ReLU input).
    return (y, s), (x2p, w, y)


def _stem_bwd_rule(interpret, res, cts):
    dy, ds = cts
    x2p, w, y = res
    k, _, cin, co = w.shape
    taps, _ = _axis_taps(k)
    k2 = max(t[0] for t in taps) + 1
    dk2 = _stem_dw(x2p, dy, y, ds.astype(jnp.float32).T, k2, co, interpret)
    dw = _unpack_dk(dk2, k, cin, co)
    n, _, hp, wp = x2p.shape
    dx = jnp.zeros((n, (hp - 8) * 2, (wp - 128) * 2, cin), y.dtype)
    return dx, dw


_stem_conv_bn_core.defvjp(_stem_fwd_rule, _stem_bwd_rule)


def stem_conv_s2(x, w, interpret: bool = False, mesh=None):
    """NHWC-in/NHWC-out stride-2 stem conv (drop-in for the plain conv; the
    BN-stats output is discarded, its cotangent is zero)."""
    y, _ = stem_conv_bn_s2(x, w, interpret, mesh)
    return y.transpose(0, 2, 3, 1)
