"""Layout-pinned Pallas 3x3 conv for HRNet's narrow branches (C <= 128).

Why this exists (BASELINE.md config-5 ledger): XLA:TPU runs the 48/96-channel
branch convs of HRNet-W48 at ~9-18% MXU — with NHWC activations the channel
dim sits in the 128-lane minor dimension, so BOTH contraction and output
lanes pad 48->128, and XLA additionally ping-pongs activations between the
conv's C-minor layout and a compact elementwise layout (~100-150 ms/step of
transpose copies at 1024^2).  Measured on-chip (scripts/bench_branch_conv.py,
scan-amortized): XLA 1.19 ms per [8,48,256,256] conv vs 0.79 ms for this
kernel's formulation standalone (0.54 ms in-context) = 1.5-2.2x, at the
formulation's own ceiling (the shift-free probe times the same).

Formulation ("outshift"): activations stay NCHW — W in lanes (dense for any
W), H in sublanes, so elementwise ops and this kernel share one layout and
no relayout copies exist.  The 3x3 conv is computed as 9 accumulated
[C, C] x [C, rows*W] dots on UNSHIFTED row reads (the W-offset taps are
applied by rolling the f32 partial OUTPUTS once per dw — 2 rolls + masks per
block instead of 6 input shifts), with the C-wide output channel dim in the
M (streaming) dimension of the MXU and rows*W >= 1024 dense lanes in N.

Windowing: each grid step consumes BH output rows.  The 1-row conv halo
arrives via dedicated 1-row DMAs into aligned side-buffers (Mosaic requires
DMA destinations tile-aligned in the sublane dim) and is placed next to the
aligned body rows by VPU writes — no materialized jnp.pad of the input
(those pads cost ~33 ms/step on the config-5 trace).

Backward: dx is the same kernel with the tap-flipped, io-transposed weights;
dk is a stacked-im2col kernel ([9C, P] x [C, P] contracted over pixels,
accumulated in VMEM across the grid) — it consumes both NCHW operands in
their natural layout, replacing XLA's weight-grad conv which relaid both
out to C-minor (~47 ms/step of copies + C-minor contraction fusions).

Constraints (checked by ``supported``): stride 1, 3x3, C_in == C_out <= 128,
H a multiple of 32.  Callers fall back to ``lax.conv_general_dilated``
otherwise (models/layers.py::ConvNormAct).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 32      # output rows per grid step
BODY0 = 8    # body rows start here (tile-aligned DMA destination)
WROWS = 48   # xbuf rows: [.., 7]=spare+top halo, [8, 39]=body, [40]=bottom
SUB = 8      # row-subgroup per dot: N = SUB * W lanes


def supported(shape, c_in: int, c_out: int) -> bool:
    """Static eligibility of the pallas path for x [N, C, H, W]."""
    n, c, h, w = shape
    return c_in == c_out and c_in <= 128 and h % BH == 0 and h >= BH


# ---------------------------------------------------------------------------
# shared halo-window machinery
# ---------------------------------------------------------------------------

def _win_start(x_hbm, xbuf, halo, sem, s, slot, nb):
    """Kick off the DMAs for step ``s`` into buffer ``slot``: the BH body
    rows to the aligned offset BODY0, and (when they exist) the 1-row
    top/bottom halos into the aligned side-buffer."""
    n2 = s // nb
    i2 = lax.rem(s, nb)
    row0 = i2 * BH
    pltpu.make_async_copy(
        x_hbm.at[n2, :, pl.ds(pl.multiple_of(row0, 8), BH), :],
        xbuf.at[slot, :, pl.ds(BODY0, BH), :], sem.at[slot, 0],
    ).start()

    # Mosaic requires HBM slice sizes tile-aligned in the sublane dim too,
    # so the halos transfer 8 rows each; the fill picks the one needed.
    # (multiple_of: the i2*BH±8 provenance is lost through lax.rem.)
    @pl.when(i2 > 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[n2, :, pl.ds(pl.multiple_of(row0 - 8, 8), 8), :],
            halo.at[slot, 0], sem.at[slot, 1],
        ).start()

    @pl.when(i2 < nb - 1)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[n2, :, pl.ds(pl.multiple_of(row0 + BH, 8), 8), :],
            halo.at[slot, 1], sem.at[slot, 2],
        ).start()


def _win_wait_fill(x_hbm, xbuf, halo, sem, slot, i2, nb, c, w, pre=None):
    """Wait for step DMAs, then place halo rows (or image-edge zeros) next
    to the body with VPU writes: top at BODY0-1, bottom at BODY0+BH.

    ``pre`` = optional (mul, add) [C, 1] arrays (compute dtype): the
    conv input becomes relu(x * mul + add) — the previous layer's folded
    BatchNorm+ReLU applied AFTER the DMA, so the normalized tensor never
    exists in HBM.  Image-edge rows stay zero (conv SAME padding pads the
    TRANSFORMED input), hence the transform runs before the zero writes."""
    if pre is not None:
        # f32 [C, 1] holding bf16-ROUNDED values: Mosaic can't insert a
        # minor dim on bf16 vectors, so the broadcastable operands are f32;
        # the products/sums of bf16-representable values are exact in f32
        # and the rounding casts reproduce the XLA path's bf16 fma
        # (x*mul then +add, each rounded) BIT-EXACTLY.
        mul, add = pre

        def tr(v):
            p = (v.astype(jnp.float32) * mul[:, :, None]).astype(xbuf.dtype)
            t = (p.astype(jnp.float32) + add[:, :, None]).astype(xbuf.dtype)
            return jnp.maximum(t, 0)
    pltpu.make_async_copy(
        x_hbm.at[0, :, pl.ds(0, BH), :],
        xbuf.at[slot, :, pl.ds(BODY0, BH), :], sem.at[slot, 0],
    ).wait()
    if pre is not None:
        xbuf[slot, :, BODY0:BODY0 + BH, :] = tr(
            xbuf[slot, :, BODY0:BODY0 + BH, :])

    @pl.when(i2 > 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[0, :, pl.ds(0, 8), :],
            halo.at[slot, 0], sem.at[slot, 1],
        ).wait()
        row = halo[slot, 0, :, 7:8, :]
        xbuf[slot, :, BODY0 - 1:BODY0, :] = tr(row) if pre is not None else row

    @pl.when(i2 == 0)
    def _():
        xbuf[slot, :, BODY0 - 1:BODY0, :] = jnp.zeros((c, 1, w), xbuf.dtype)

    @pl.when(i2 < nb - 1)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[0, :, pl.ds(0, 8), :],
            halo.at[slot, 1], sem.at[slot, 2],
        ).wait()
        row = halo[slot, 1, :, 0:1, :]
        xbuf[slot, :, BODY0 + BH:BODY0 + BH + 1, :] = (
            tr(row) if pre is not None else row)

    @pl.when(i2 == nb - 1)
    def _():
        xbuf[slot, :, BODY0 + BH:BODY0 + BH + 1, :] = jnp.zeros(
            (c, 1, w), xbuf.dtype)


def _roll_fn(interpret):
    # Mosaic's roll lowering requires 32-bit data (f32 here); jnp.roll is
    # the interpret-mode equivalent.
    if interpret:
        return lambda v, s: jnp.roll(v, s, axis=1)
    return functools.partial(pltpu.roll, axis=1)


def _win_scratch(c, w, dtype):
    return [
        pltpu.VMEM((2, c, WROWS, w), dtype),
        pltpu.VMEM((2, 2, c, 8, w), dtype),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]


# ---------------------------------------------------------------------------
# forward kernel (also computes dx with flipped/transposed weights)
# ---------------------------------------------------------------------------

def _kernel(x_hbm, a_ref, y_ref, xbuf, halo, sem, *, nb, c, w, interpret,
            sub=SUB, s_inner=True):
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    @pl.when(step == 0)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, 0, 0, nb)

    @pl.when(step + 1 < total)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, step + 1, (step + 1) % 2, nb)

    slot = step % 2
    _win_wait_fill(x_hbm, xbuf, halo, sem, slot, i, nb, c, w)

    xw = xbuf[slot]
    nsub = BH // sub
    base = BODY0 - 1  # window row of (first output row - 1)

    def dot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    roll = _roll_fn(interpret)
    wcol = lax.broadcasted_iota(jnp.int32, (c, BH * w), 1) % w
    tmp = []
    for dw in range(3):
        parts = [jnp.zeros((c, sub * w), jnp.float32) for _ in range(nsub)]
        # s_inner keeps one A slice stationary across the row-subgroups
        # (fewer MXU weight reloads); the math is identical either way.
        loop = (
            [(dh, s) for dh in range(3) for s in range(nsub)]
            if s_inner else
            [(dh, s) for s in range(nsub) for dh in range(3)]
        )
        for dh, s in loop:
            r0 = base + s * sub + dh
            rows = xw[:, r0:r0 + sub, :]
            parts[s] += dot(a_ref[:, (3 * dh + dw) * c:(3 * dh + dw + 1) * c],
                            rows.reshape(c, sub * w))
        tmp.append(jnp.concatenate(parts, axis=1))
    # y[:, wi] = tmp0[wi-1] + tmp1[wi] + tmp2[wi+1]  (taps at dw-1 in {-1,0,1})
    left = jnp.where(wcol == 0, 0.0, roll(tmp[0], 1))
    right = jnp.where(wcol == w - 1, 0.0, roll(tmp[2], BH * w - 1))
    y = tmp[1] + left + right
    y_ref[0] = y.reshape(c, BH, w).astype(y_ref.dtype)


def _kernel_kstack(x_hbm, a_ref, *refs, nb, c, w, interpret, sub=BH,
                   pre=False, stats=False, post=False):
    """K-stacked variant of ``_kernel``: for each dw tap, ONE dot
    [C, 3C] x [3C, sub*W] against a dh-stacked row buffer (the three dh row
    windows concatenated along the contraction dim).  3 dots of K=3C per
    row-subgroup instead of 9 of K=C — at C=48 the contraction lanes fill
    144/256 instead of 48/128 per pass and the MXU issues 3x fewer dots
    (pipeline-fill amortization).  Output dw rolls identical to ``_kernel``.
    ``a_ref`` must be packed by ``_pack_kstack`` ((dw, dh, ci) column order).

    ``pre`` adds (mul, add) [C, 1] inputs: the conv input becomes
    relu(x*mul+add) applied in VMEM after the DMA (the previous BN+ReLU,
    never materialized in HBM).  ``stats`` adds a [2, C] f32 output
    accumulated across the grid: per-channel sum and sum-of-squares of the
    bf16-rounded y (the NEXT BatchNorm's batch statistics, for free under
    the MXU shadow).

    ``post``: the CBR dx-epilogue fusion.  When this kernel computes the
    backward conv dt = conv(dY, k_flipped) for a conv whose input was
    t = relu(x*mul+add), the chain dx = where(x*mul+add > 0, dt*mul, 0)
    plus the fold-parameter reductions dmul = sum(dtm*x), dadd = sum(dtm)
    used to be a separate XLA elementwise pass (read dt + read x + write
    dx per conv backward).  ``post`` streams x alongside the dY window
    (Mosaic-pipelined BlockSpec), applies the mask/scale in VMEM under
    the MXU shadow, writes dx directly, and accumulates (dmul, dadd) into
    the [2, C] output — dt never exists in HBM.  Inputs appended: x block
    [1, C, BH, W] and three [C, 1] f32 vectors (bf16-ROUNDED mul and add
    reproducing the XLA mask's bf16 fma bit-exactly, and the RAW f32 mul
    for the dx product, matching ops/pallas_conv._cbr_fn's XLA chain).
    """
    refs = list(refs)
    pre_refs = None
    if pre:
        pre_refs = (refs.pop(0)[:], refs.pop(0)[:])
    post_refs = None
    if post:
        post_refs = (refs.pop(0), refs.pop(0)[:], refs.pop(0)[:],
                     refs.pop(0)[:])
    y_ref = refs.pop(0)
    s_ref = refs.pop(0) if (stats or post) else None
    xbuf, halo, sem = refs

    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    @pl.when(step == 0)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, 0, 0, nb)
        if stats or post:
            s_ref[:] = jnp.zeros_like(s_ref)

    @pl.when(step + 1 < total)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, step + 1, (step + 1) % 2, nb)

    slot = step % 2
    _win_wait_fill(x_hbm, xbuf, halo, sem, slot, i, nb, c, w, pre=pre_refs)

    xw = xbuf[slot]
    nsub = BH // sub
    base = BODY0 - 1

    def dot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    roll = _roll_fn(interpret)
    wcol = lax.broadcasted_iota(jnp.int32, (c, BH * w), 1) % w
    parts = [[None] * nsub for _ in range(3)]
    for s in range(nsub):
        r0 = base + s * sub
        b3 = jnp.concatenate(
            [xw[:, r0 + dh:r0 + dh + sub, :].reshape(c, sub * w)
             for dh in range(3)], axis=0)
        for dw in range(3):
            parts[dw][s] = dot(a_ref[:, 3 * dw * c:3 * (dw + 1) * c], b3)
    tmp = [jnp.concatenate(p, axis=1) if nsub > 1 else p[0] for p in parts]
    left = jnp.where(wcol == 0, 0.0, roll(tmp[0], 1))
    right = jnp.where(wcol == w - 1, 0.0, roll(tmp[2], BH * w - 1))
    y = tmp[1] + left + right
    yb = y.astype(y_ref.dtype)
    if post:
        x_blk, mul_r, add_r, mul_raw = post_refs
        xb = x_blk[0].reshape(c, BH * w)
        xf = xb.astype(jnp.float32)
        # The mask's bf16 fma, reproduced exactly (see _win_wait_fill):
        # x*mul rounded to bf16, +add rounded to bf16, strict > 0.
        tp = (xf * mul_r).astype(y_ref.dtype)
        # compare in f32 (Mosaic has no bf16 cmpf); upcasting the ROUNDED
        # bf16 value is exact, so the mask equals the bf16 comparison.
        t2 = (tp.astype(jnp.float32) + add_r).astype(y_ref.dtype)
        dtm = jnp.where(t2.astype(jnp.float32) > 0, yb.astype(jnp.float32), 0.0)
        y_ref[0] = (dtm * mul_raw).astype(y_ref.dtype).reshape(c, BH, w)
        s_ref[0:1, :] += jnp.sum(dtm * xf, axis=1)[None, :]
        s_ref[1:2, :] += jnp.sum(dtm, axis=1)[None, :]
        return
    y_ref[0] = yb.reshape(c, BH, w)
    if stats:
        y32 = yb.astype(jnp.float32)
        s_ref[0:1, :] += jnp.sum(y32, axis=1)[None, :]
        s_ref[1:2, :] += jnp.sum(y32 * y32, axis=1)[None, :]


def _conv3x3_nchw_impl(x, a, *, interpret=False, sub=SUB, s_inner=True,
                       variant="outshift", pre=None, stats=False, post=None,
                       vma=None):
    """pre = optional (mul, add) [C, 1] compute-dtype arrays (kstack only);
    stats=True additionally returns [2, C] f32 (sum, sum-of-squares) of y.
    post = optional (x_orig, mul_rounded, add_rounded, mul_raw) for the CBR
    dx-epilogue fusion (kstack only; see _kernel_kstack) — the output
    becomes dx and a [2, C] f32 (dmul, dadd) is returned alongside.
    vma = varying-across-mesh-axes set for the outputs (required when the
    op runs inside a ``check_vma=True`` shard_map)."""
    n, c, h, w = x.shape
    nb = h // BH
    if variant == "kstack":
        kern = functools.partial(_kernel_kstack, nb=nb, c=c, w=w,
                                 interpret=interpret, sub=sub,
                                 pre=pre is not None, stats=stats,
                                 post=post is not None)
    else:
        assert pre is None and not stats and post is None
        kern = functools.partial(_kernel, nb=nb, c=c, w=w, interpret=interpret,
                                 sub=sub, s_inner=s_inner)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((c, 9 * c), lambda nn_, ii: (0, 0)),
    ]
    args = [x, a]
    if pre is not None:
        in_specs += [pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0))] * 2
        args += [pre[0], pre[1]]
    if post is not None:
        in_specs += [
            pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0)),
            pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0)),
            pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0)),
            pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0)),
        ]
        args += list(post)
    kw = {} if vma is None else {"vma": vma}
    out_specs = pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0))
    out_shape = jax.ShapeDtypeStruct((n, c, h, w), x.dtype, **kw)
    if stats or post is not None:
        out_specs = (out_specs, pl.BlockSpec((2, c), lambda nn_, ii: (0, 0)))
        out_shape = (out_shape, jax.ShapeDtypeStruct((2, c), jnp.float32, **kw))
    return pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=_win_scratch(c, w, x.dtype),
        interpret=interpret,
    )(*args)


def _pack(k, dtype):
    """[3, 3, C, C] HWIO -> A [C_out, 9*C_in] with rows (dh, dw, ci)."""
    c = k.shape[2]
    return k.reshape(9 * c, c).T.astype(dtype)


def _pack_kstack(k, dtype):
    """[3, 3, C, C] HWIO -> A [C_out, 9*C_in] with rows (dw, dh, ci), so the
    per-dw [C, 3C] slices of ``_kernel_kstack`` are contiguous columns."""
    c = k.shape[2]
    return jnp.transpose(k, (1, 0, 2, 3)).reshape(9 * c, c).T.astype(dtype)


# ---------------------------------------------------------------------------
# weight-grad kernel
# ---------------------------------------------------------------------------

def _dw_kernel(x_hbm, dy_ref, dk_ref, xbuf, halo, sem, *, nb, c, w, interpret,
               swap=False, sub=SUB):
    """dk[(dh,dw,ci), co] = sum_pixels x_shifted * dy — one stacked im2col
    dot per row-subgroup, accumulated in VMEM across the whole grid
    (constant out index_map).  dy needs no halo and arrives via a regular
    BlockSpec pipeline.

    ``swap=True`` computes the transposed product dk[co, (dh,dw,ci)] =
    dy x b^T instead: the 9C-wide operand moves from the M (streaming) dim
    to the output-lane dim, so each MXU pass fills 9C/(pad(9C)) of its
    output lanes instead of C/128 (C=48: 84% vs 37.5%) and streams only C
    rows instead of 9C."""
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    @pl.when(step == 0)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, 0, 0, nb)
        dk_ref[:] = jnp.zeros_like(dk_ref)

    @pl.when(step + 1 < total)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, step + 1, (step + 1) % 2, nb)

    slot = step % 2
    _win_wait_fill(x_hbm, xbuf, halo, sem, slot, i, nb, c, w)

    xw = xbuf[slot]
    base = BODY0 - 1
    roll = _roll_fn(interpret)
    wcol = lax.broadcasted_iota(jnp.int32, (c, sub * w), 1) % w

    for s in range(BH // sub):
        dyb = dy_ref[0, :, s * sub:(s + 1) * sub, :].reshape(c, sub * w)
        pieces = []
        for dh in range(3):
            r0 = base + s * sub + dh
            rows = xw[:, r0:r0 + sub, :]
            rows = rows.astype(jnp.float32).reshape(c, sub * w)
            for dw_ in (-1, 0, 1):
                if dw_ == -1:
                    p = jnp.where(wcol == 0, 0.0, roll(rows, 1))
                elif dw_ == 1:
                    p = jnp.where(wcol == w - 1, 0.0, roll(rows, sub * w - 1))
                else:
                    p = rows
                pieces.append(p.astype(xbuf.dtype))
        b = jnp.concatenate(pieces, axis=0)  # [9C, sub*W]
        if swap:
            dk_ref[:, :] += lax.dot_general(
                dyb, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            dk_ref[:, :] += lax.dot_general(
                b, dyb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


def _dw_kernel_dyroll(x_hbm, dy_ref, *refs, nb, c, w, interpret, sub=SUB,
                      pre=False, fuse=False):
    """dk[co, (dw, dh, ci)] accumulated as dy_rolled x x3^T.

    Identity: sum_w x[ci, w+dw-1] dy[co, w] = sum_w x[ci, w] dy[co, w-dw+1]
    (wrapped lanes masked) — so the W-offset taps roll DY, not the im2col
    rows: 2 f32 rolls + masks per BLOCK (on the flat [C, BH*W] dy, where
    cross-row wraps land exactly on the masked w=0/W-1 lanes) instead of 6
    per row-subgroup on x.  The x side is a pure dh row-stack (3 bf16
    row-slice copies, no casts), and the dot streams M=C rows with N=3C
    output lanes per dw — both the VPU and MXU work drop vs ``_dw_kernel``.

    ``pre`` adds (mul, add) [C, 1] inputs applied to the DMA'd x window as
    relu(x*mul+add) — the weight grad of a conv whose (never-materialized)
    input is the previous BN+ReLU output.

    ``fuse`` adds (y, ds1, ds2) inputs and a second output: the raw ``dy``
    stream is replaced by the CBR total cotangent dY = dy + ds1 + 2*y*ds2
    (ds* = [C, 1] f32 cotangents of the fused BN-stats output), composed in
    VPU under the MXU shadow, and the bf16-rounded dY is ALSO written out
    for the dx kernel — the separate XLA elementwise pass (read dy, read y,
    write dY) disappears from the conv backward.  The f32 expression order
    matches the old XLA pass and every bf16 rounding lands at the same point
    (roll/mask commute with the cast); residual ULP-level differences remain
    possible where XLA contracted the f32 multiply-adds into fmas.
    """
    refs = list(refs)
    fuse_refs = (refs.pop(0), refs.pop(0), refs.pop(0)) if fuse else None
    pre_refs = (refs.pop(0)[:], refs.pop(0)[:]) if pre else None
    dk_ref = refs.pop(0)
    dY_ref = refs.pop(0) if fuse else None
    xbuf, halo, sem = refs

    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    @pl.when(step == 0)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, 0, 0, nb)
        dk_ref[:] = jnp.zeros_like(dk_ref)

    @pl.when(step + 1 < total)
    def _():
        _win_start(x_hbm, xbuf, halo, sem, step + 1, (step + 1) % 2, nb)

    slot = step % 2
    _win_wait_fill(x_hbm, xbuf, halo, sem, slot, i, nb, c, w, pre=pre_refs)

    xw = xbuf[slot]
    base = BODY0 - 1
    roll = _roll_fn(interpret)
    wcol = lax.broadcasted_iota(jnp.int32, (c, BH * w), 1) % w

    dyf = dy_ref[0].reshape(c, BH * w).astype(jnp.float32)
    if fuse:
        y_ref, ds1_ref, ds2_ref = fuse_refs
        yf = y_ref[0].reshape(c, BH * w).astype(jnp.float32)
        dyf = dyf + ds1_ref[:] + 2.0 * yf * ds2_ref[:]
        dY_ref[0] = dyf.astype(dY_ref.dtype).reshape(c, BH, w)
    # dw=0 tap pairs x[w-1] with dy[w] -> roll dy LEFT by 1 (dy[w+1] lands
    # at w)... careful: sum_w x[w] dy[w - (dw-1)]; dw=0 -> dy[w+1].
    dyv = [
        jnp.where(wcol == w - 1, 0.0, roll(dyf, BH * w - 1)).astype(xbuf.dtype),
        dyf.astype(xbuf.dtype),
        jnp.where(wcol == 0, 0.0, roll(dyf, 1)).astype(xbuf.dtype),
    ]
    for s in range(BH // sub):
        r0 = base + s * sub
        x3 = jnp.concatenate(
            [xw[:, r0 + dh:r0 + dh + sub, :].reshape(c, sub * w)
             for dh in range(3)], axis=0)
        for dw_ in range(3):
            dk_ref[:, 3 * dw_ * c:3 * (dw_ + 1) * c] += lax.dot_general(
                dyv[dw_][:, s * sub * w:(s + 1) * sub * w], x3,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _conv3x3_dw_impl(x, dy, *, interpret=False, swap=False, sub=SUB,
                     variant="stack", pre=None, fuse=None, vma=None):
    """dk [3, 3, C, C] (f32) for y = conv3x3_nchw(x, k).

    ``fuse`` (dyroll only) = (y, ds1, ds2): ``dy`` is the RAW y-cotangent and
    the kernel composes the CBR total cotangent dY = dy + ds1 + 2*y*ds2
    inline (see ``_dw_kernel_dyroll``); returns (dk, dY) with dY in x.dtype
    for the dx kernel to consume."""
    n, c, h, w = x.shape
    nb = h // BH
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0)),
    ]
    args = [x, dy]
    kw = {} if vma is None else {"vma": vma}
    if variant == "dyroll":
        kern = functools.partial(_dw_kernel_dyroll, nb=nb, c=c, w=w,
                                 interpret=interpret, sub=sub,
                                 pre=pre is not None, fuse=fuse is not None)
        out_shape = (c, 9 * c)
        if fuse is not None:
            in_specs += [
                pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0)),
                pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0)),
                pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0)),
            ]
            args += [fuse[0], fuse[1], fuse[2]]
        if pre is not None:
            in_specs += [pl.BlockSpec((c, 1), lambda nn_, ii: (0, 0))] * 2
            args += [pre[0], pre[1]]
    else:
        assert pre is None and fuse is None
        kern = functools.partial(_dw_kernel, nb=nb, c=c, w=w,
                                 interpret=interpret, swap=swap, sub=sub)
        out_shape = (c, 9 * c) if swap else (9 * c, c)
    out_specs = pl.BlockSpec(out_shape, lambda nn_, ii: (0, 0))
    out_shapes = jax.ShapeDtypeStruct(out_shape, jnp.float32, **kw)
    if fuse is not None:
        out_specs = (out_specs,
                     pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0)))
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct((n, c, h, w), x.dtype, **kw))
    out = pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=_win_scratch(c, w, x.dtype),
        interpret=interpret,
    )(*args)
    dk, dY = out if fuse is not None else (out, None)
    if variant == "dyroll":
        # columns are (dw, dh, ci); want [dh, dw, ci, co].
        dk = jnp.transpose(dk.reshape(c, 3, 3, c), (2, 1, 3, 0))
        return (dk, dY) if fuse is not None else dk
    if swap:
        return jnp.transpose(dk.reshape(c, 3, 3, c), (1, 2, 3, 0))
    return dk.reshape(3, 3, c, c)


# ---------------------------------------------------------------------------
# public op with custom vjp
# ---------------------------------------------------------------------------

# Production variant choices (scripts/bench_kernel_variants.py, one v5e,
# scan-amortized, 2026-08-17 round 3):
#   fwd/dx: 'kstack' sub16 — 0.584 ms at [8,48,256,256] vs 0.736 outshift
#           (1.26x), 0.422 vs 0.492 at [8,96,128,128] (1.17x): one
#           [C,3C]x[3C,sub*W] dot per dw tap fills 144/256 contraction
#           lanes instead of 48/128 and issues 3x fewer dots.
#   dk:     'dyroll' — rolls dy once per block instead of 6 im2col rolls
#           per row-subgroup: 0.756 vs 1.192 ms at [8,48,256,256] (1.58x),
#           0.578 vs 0.744 at [8,96,128,128] (1.29x).  The best row-subgroup
#           is shape-dependent (sub8 at W=256, sub32 at W=128 — both keep
#           the dot's pixel dim in the 2-4k lane range without blowing VMEM).
FWD_VARIANT = "kstack"
FWD_SUB = 16
DW_VARIANT = "dyroll"


def _dw_sub(w: int) -> int:
    return 8 if w >= 256 else 32


@functools.lru_cache(maxsize=2)
def _conv_fn(interpret: bool):
    pack = _pack_kstack if FWD_VARIANT == "kstack" else _pack

    @jax.custom_vjp
    def f(x, k):
        return _conv3x3_nchw_impl(x, pack(k, x.dtype), interpret=interpret,
                                  sub=FWD_SUB, variant=FWD_VARIANT)

    def fwd(x, k):
        return f(x, k), (x, k)

    def bwd(res, dy):
        x, k = res
        dy = dy.astype(x.dtype)
        # dx: correlate dy with the tap-flipped, in/out-transposed kernel.
        k_bwd = jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))
        dx = f(dy, k_bwd)
        # dk: the stacked-im2col weight-grad kernel (consumes both NCHW
        # operands in their natural layout — no relayout copies).
        dk = _conv3x3_dw_impl(x, dy, interpret=interpret,
                              variant=DW_VARIANT, sub=_dw_sub(x.shape[3]))
        return dx, dk

    f.defvjp(fwd, bwd)
    return f


def conv3x3_nchw(x, k, interpret: bool = False):
    """SAME-padded stride-1 3x3 conv, x [N, C, H, W], k [3, 3, C, C] HWIO.

    Equals ``lax.conv_general_dilated(x, k, (1,1), 'SAME', NCHW)`` with the
    kernel cast to x.dtype (the bf16 compute convention of nn.Conv with
    dtype=bf16, param_dtype=f32).
    """
    return _conv_fn(bool(interpret))(x, k)


# ---------------------------------------------------------------------------
# fused conv + BN-stats (+ input BN-apply/ReLU) — the branch-chain CBR op
# ---------------------------------------------------------------------------

# The CBR total cotangent into y when (y, s) are both consumed downstream is
# dY = dy + ds1 + 2*y*ds2 (per channel); it is composed INSIDE the dW kernel
# (``_dw_kernel_dyroll`` with ``fuse``) rather than as a separate XLA pass.


def _dx_fuse() -> bool:
    """Opt-in for the CBR dx-epilogue fusion (read at trace time)."""
    import os

    return os.environ.get("SSTPU_CBR_DX_FUSE") == "1"


@functools.lru_cache(maxsize=8)
def _cbr_fn(interpret: bool, pre: bool, axis: str | None = None):
    """``axis``: mesh axis name when the op runs inside a data-sharded
    shard_map — the kernel outputs are marked varying over it and the
    backward psums the replicated operands' gradients (dk, dmul, dadd) so
    their vma matches the primals (shard_map's transpose then inserts no
    further collective)."""
    pack = _pack_kstack
    # vma marking is disabled: pallas interpret mode cannot propagate vma
    # through its internal dynamic_slices (JAX suggests check_vma=False as
    # the workaround), so the shard_map wrapper runs check_vma=False.  Even
    # then, shard_map's transpose psums the cotangents of replicated (P())
    # operands itself — the bwd below must return PER-SHARD dk/dmul/dadd
    # (a manual psum double-counts by the axis size; pinned by
    # tests/test_parallel.py sharded == unsharded incl. all grads).
    vma = None

    def run(x, k, mul=None, add=None):
        p = None
        if pre:
            p = (mul.astype(x.dtype).astype(jnp.float32)[:, None],
                 add.astype(x.dtype).astype(jnp.float32)[:, None])
        return _conv3x3_nchw_impl(
            x, pack(k, x.dtype), interpret=interpret, sub=FWD_SUB,
            variant="kstack", pre=p, stats=True, vma=vma)

    def dx_conv(dY, k):
        k_bwd = jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))
        return _conv3x3_nchw_impl(
            dY, pack(k_bwd, dY.dtype), interpret=interpret, sub=FWD_SUB,
            variant="kstack", vma=vma)

    def dx_conv_post(dY, k, x, mul, add):
        # dx-epilogue fusion: the dt -> dx transform (relu mask from the
        # SAME bf16 fma the fwd kernels applied, scale by raw f32 mul) and
        # the (dmul, dadd) reductions run inside the dx kernel — the
        # separate XLA pass and dt's HBM round-trip are gone.  Returns
        # (dx, [2, C] f32 = (dmul, dadd)).
        k_bwd = jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))
        mul_r = mul.astype(x.dtype).astype(jnp.float32)[:, None]
        add_r = add.astype(x.dtype).astype(jnp.float32)[:, None]
        mul_raw = mul.astype(jnp.float32)[:, None]
        return _conv3x3_nchw_impl(
            dY, pack(k_bwd, dY.dtype), interpret=interpret, sub=FWD_SUB,
            variant="kstack", post=(x, mul_r, add_r, mul_raw), vma=vma)


    def dk_dY(x, y, cot, p=None):
        # dW kernel with the dY composition fused into its dy stream (and
        # the bf16 dY emitted as a side output for the dx kernel): the
        # separate XLA pass (read dy, read y, write dY) is gone — one HBM
        # read per conv backward saved, bit-exact (see _dw_kernel_dyroll).
        ds1 = cot[1][0].astype(jnp.float32)[:, None]
        ds2 = cot[1][1].astype(jnp.float32)[:, None]
        return _conv3x3_dw_impl(
            x, cot[0].astype(y.dtype), interpret=interpret,
            variant=DW_VARIANT, sub=_dw_sub(x.shape[3]), pre=p,
            fuse=(y, ds1, ds2), vma=vma)

    if not pre:
        @jax.custom_vjp
        def f(x, k):
            return run(x, k)

        def fwd(x, k):
            y, s = f(x, k)
            return (y, s), (x, k, y)

        def bwd(res, cot):
            x, k, y = res
            dk, dY = dk_dY(x, y, cot)
            dx = dx_conv(dY, k)
            return dx, dk

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def f(x, k, mul, add):
        return run(x, k, mul, add)

    def fwd(x, k, mul, add):
        y, s = f(x, k, mul, add)
        return (y, s), (x, k, mul, add, y)

    def bwd(res, cot):
        x, k, mul, add, y = res
        p = (mul.astype(x.dtype).astype(jnp.float32)[:, None],
             add.astype(x.dtype).astype(jnp.float32)[:, None])
        dk, dY = dk_dY(x, y, cot, p=p)
        if _dx_fuse():
            # dx + the input-transform chain in ONE kernel (dx-epilogue
            # fusion, opt-in SSTPU_CBR_DX_FUSE=1): same expressions as the
            # XLA pass below, dx bit-identical, the [C]-reductions
            # differing only in f32 summation order.  Whole-step A/B on
            # config 5 (one v5e, 12 iters, 2026-08-21): 473.8 -> 477.9 ms
            # at 4+4 — the replaced XLA pass was latency-hidden while the
            # epilogue extends the DMA/VPU-bound kernel's own critical
            # path, so the default stays the XLA chain (BASELINE.md).
            dx, ds = dx_conv_post(dY, k, x, mul, add)
            return dx, dk, ds[0], ds[1]
        # dt = grad wrt the transformed input t = relu(x*mul+add).
        dt = dx_conv(dY, k)
        # chain through the input transform (mask from the same bf16 fma
        # the kernels applied; relu grad is 0 at exact zeros, the torch
        # convention — jax.nn.relu, not jnp.maximum).
        mb = mul.astype(x.dtype)[None, :, None, None]
        ab = add.astype(x.dtype)[None, :, None, None]
        mask = (x * mb + ab) > 0
        xf = x.astype(jnp.float32)
        dtf = dt.astype(jnp.float32)
        dtm = jnp.where(mask, dtf, 0.0)
        dx = (dtm * mul[None, :, None, None]).astype(x.dtype)
        dmul = jnp.sum(dtm * xf, axis=(0, 2, 3))
        dadd = jnp.sum(dtm, axis=(0, 2, 3))
        return dx, dk, dmul, dadd

    f.defvjp(fwd, bwd)
    return f


def conv3x3_bn_nchw(x, k, mul=None, add=None, interpret: bool = False,
                    mesh=None):
    """Fused branch-chain conv: y = conv3x3(t, k) with
    t = relu(x*mul + add) if (mul, add) given (f32 [C], the previous folded
    BatchNorm — applied inside the kernels, never materialized in HBM) else
    t = x.  Returns (y, s) with s = [2, C] f32 per-channel (sum, sum-of-
    squares) of y — the NEXT BatchNorm's batch statistics, accumulated in
    VMEM under the MXU shadow.  Differentiable in x, k, mul, add.

    ``mesh`` (a Mesh whose 'data' axis is > 1): run the op under shard_map
    with the batch dim on 'data'.  XLA's SPMD partitioner treats the
    opaque tpu_custom_call as non-partitionable, so under plain GSPMD a
    batch-sharded input would be ALL-GATHERED and each chip would compute
    the full global batch; the shard_map keeps the kernel per-shard and
    restores the global BN statistics with one [2, C] psum (SyncBN
    semantics preserved exactly — the consumer divides by the GLOBAL
    count).  Gradients flow through shard_map: dx stays batch-sharded,
    dk/dmul/dadd of the replicated operands are psummed by the transpose.
    """
    args = (x, k) if mul is None else (x, k, mul, add)
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return _cbr_fn(bool(interpret), mul is not None)(*args)
    f = _cbr_fn(bool(interpret), mul is not None, "data")
    from jax.sharding import PartitionSpec as P

    try:  # jax >= 0.7 top-level API
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local(*a):
        y, s = f(*a)
        return y, jax.lax.psum(s, "data")

    reps = (P(),) * (len(args) - 1)
    return shard_map(
        local, mesh=mesh, in_specs=(P("data"),) + reps,
        out_specs=(P("data"), P()), check_vma=False,
    )(*args)
