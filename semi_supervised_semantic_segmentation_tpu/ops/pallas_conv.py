"""Layout-pinned Pallas 3x3 conv for HRNet's narrow branches (C <= 128).

Why this exists (BASELINE.md config-5 ledger): XLA:TPU runs the 48/96-channel
branch convs of HRNet-W48 at ~9-18% MXU — with NHWC activations the channel
dim sits in the 128-lane minor dimension, so BOTH contraction and output
lanes pad 48->128, and XLA additionally ping-pongs activations between the
conv's C-minor layout and a compact elementwise layout (~100-150 ms/step of
transpose copies at 1024^2).  Measured on-chip (scripts/bench_branch_conv.py,
scan-amortized): XLA 1.19 ms per [8,48,256,256] conv vs 0.79 ms for this
kernel's formulation = 1.52x, at the formulation's own ceiling (the
shift-free probe times the same).

Formulation ("outshift"): activations stay NCHW — W in lanes (dense for any
W), H in sublanes, so elementwise ops and this kernel share one layout and
no relayout copies exist.  The 3x3 conv is computed as 9 accumulated
[C, C] x [C, rows*W] dots on UNSHIFTED row reads (the W-offset taps are
applied by rolling the f32 partial OUTPUTS once per dw — 2 rolls + masks per
block instead of 6 input shifts), with the C-wide output channel dim in the
M (streaming) dimension of the MXU and rows*W >= 1024 dense lanes in N.

Backward: dx is the same kernel with the tap-flipped, io-transposed weights;
dk is XLA's conv weight-grad (contraction over N*H*W pixels — MXU-dense).

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

BH = 32        # output rows per grid step
FETCH = BH + 2  # VMEM window rows: top halo + body + bottom halo
SUB = 8        # row-subgroup per dot: N = SUB * W lanes


def supported(shape, c_in: int, c_out: int) -> bool:
    """Static eligibility of the pallas path for x [N, C, H, W]."""
    n, c, h, w = shape
    return c_in == c_out and c_in <= 128 and h % BH == 0 and h >= BH


def _kernel(x_hbm, a_ref, y_ref, xbuf, sem, *, nb, c, w, interpret):
    """Window layout: xbuf row 0 = top halo (global row i*BH - 1), rows
    1..BH = body, row BH+1 = bottom halo.  The halo rows arrive via their
    own 1-row DMAs instead of a materialized jnp.pad of the whole input
    (the pads cost ~33 ms/step on config 5 — BASELINE.md); image-edge halos
    are zero-filled at consume time."""
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    def start_dma(slot, s):
        n2 = s // nb
        i2 = lax.rem(s, nb)
        row0 = i2 * BH
        pltpu.make_async_copy(
            x_hbm.at[n2, :, pl.ds(row0, BH), :],
            xbuf.at[slot, :, pl.ds(1, BH), :], sem.at[slot, 0],
        ).start()

        @pl.when(i2 > 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[n2, :, pl.ds(row0 - 1, 1), :],
                xbuf.at[slot, :, pl.ds(0, 1), :], sem.at[slot, 1],
            ).start()

        @pl.when(i2 < nb - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[n2, :, pl.ds(row0 + BH, 1), :],
                xbuf.at[slot, :, pl.ds(BH + 1, 1), :], sem.at[slot, 2],
            ).start()

    def wait_dma(slot, i2):
        pltpu.make_async_copy(
            x_hbm.at[0, :, pl.ds(0, BH), :],
            xbuf.at[slot, :, pl.ds(1, BH), :], sem.at[slot, 0],
        ).wait()

        @pl.when(i2 > 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, :, pl.ds(0, 1), :],
                xbuf.at[slot, :, pl.ds(0, 1), :], sem.at[slot, 1],
            ).wait()

        @pl.when(i2 < nb - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, :, pl.ds(0, 1), :],
                xbuf.at[slot, :, pl.ds(BH + 1, 1), :], sem.at[slot, 2],
            ).wait()

    @pl.when(step == 0)
    def _():
        start_dma(0, 0)

    @pl.when(step + 1 < total)
    def _():
        start_dma((step + 1) % 2, step + 1)

    slot = step % 2
    wait_dma(slot, i)

    # Image-edge halo rows are not DMA'd — zero them before use.
    @pl.when(i == 0)
    def _():
        xbuf[slot, :, 0:1, :] = jnp.zeros((c, 1, w), xbuf.dtype)

    @pl.when(i == nb - 1)
    def _():
        xbuf[slot, :, BH + 1:BH + 2, :] = jnp.zeros((c, 1, w), xbuf.dtype)

    xw = xbuf[slot]
    nsub = BH // SUB

    def dot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # Mosaic's roll lowering requires 32-bit data (f32 here); jnp.roll is
    # the interpret-mode equivalent.
    if interpret:
        roll = lambda v, s: jnp.roll(v, s, axis=1)  # noqa: E731
    else:
        roll = functools.partial(pltpu.roll, axis=1)

    wcol = lax.broadcasted_iota(jnp.int32, (c, BH * w), 1) % w
    tmp = []
    for dw in range(3):
        parts = []
        for s in range(nsub):
            part = jnp.zeros((c, SUB * w), jnp.float32)
            for dh in range(3):
                rows = xw[:, s * SUB + dh: s * SUB + dh + SUB, :]
                part += dot(a_ref[:, (3 * dh + dw) * c:(3 * dh + dw + 1) * c],
                            rows.reshape(c, SUB * w))
            parts.append(part)
        tmp.append(jnp.concatenate(parts, axis=1))
    # y[:, wi] = tmp0[wi-1] + tmp1[wi] + tmp2[wi+1]  (taps at dw-1 in {-1,0,1})
    left = jnp.where(wcol == 0, 0.0, roll(tmp[0], 1))
    right = jnp.where(wcol == w - 1, 0.0, roll(tmp[2], BH * w - 1))
    y = tmp[1] + left + right
    y_ref[0] = y.reshape(c, BH, w).astype(y_ref.dtype)


def _conv3x3_nchw_impl(x, a, *, interpret=False):
    n, c, h, w = x.shape
    nb = h // BH
    return pl.pallas_call(
        functools.partial(_kernel, nb=nb, c=c, w=w, interpret=interpret),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c, 9 * c), lambda nn_, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c, FETCH, w), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(x, a)


def _pack(k, dtype):
    """[3, 3, C, C] HWIO -> A [C_out, 9*C_in] with rows (dh, dw, ci)."""
    c = k.shape[2]
    return k.reshape(9 * c, c).T.astype(dtype)


def _dw_kernel(x_hbm, dy_ref, dk_ref, xbuf, sem, *, nb, c, w, interpret):
    """Weight grad dk[(dh,dw,ci), co] = sum_pixels x_shifted * dy.

    One stacked im2col dot per row-subgroup: B [9C, SUB*W] x dy [C, SUB*W]
    contracted over pixels -> [9C, C], accumulated in VMEM across the whole
    grid (constant out index_map).  Replaces XLA's weight-grad convolution,
    which relaid both NCHW operands out to C-minor (~47 ms/step of copies
    on config 5 — BASELINE.md).  x windows use the same halo-DMA scheme as
    the forward kernel; dy needs no halo and arrives via a regular BlockSpec
    pipeline.
    """
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    def start_dma(slot, s):
        n2 = s // nb
        i2 = lax.rem(s, nb)
        row0 = i2 * BH
        pltpu.make_async_copy(
            x_hbm.at[n2, :, pl.ds(row0, BH), :],
            xbuf.at[slot, :, pl.ds(1, BH), :], sem.at[slot, 0],
        ).start()

        @pl.when(i2 > 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[n2, :, pl.ds(row0 - 1, 1), :],
                xbuf.at[slot, :, pl.ds(0, 1), :], sem.at[slot, 1],
            ).start()

        @pl.when(i2 < nb - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[n2, :, pl.ds(row0 + BH, 1), :],
                xbuf.at[slot, :, pl.ds(BH + 1, 1), :], sem.at[slot, 2],
            ).start()

    def wait_dma(slot, i2):
        pltpu.make_async_copy(
            x_hbm.at[0, :, pl.ds(0, BH), :],
            xbuf.at[slot, :, pl.ds(1, BH), :], sem.at[slot, 0],
        ).wait()

        @pl.when(i2 > 0)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, :, pl.ds(0, 1), :],
                xbuf.at[slot, :, pl.ds(0, 1), :], sem.at[slot, 1],
            ).wait()

        @pl.when(i2 < nb - 1)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[0, :, pl.ds(0, 1), :],
                xbuf.at[slot, :, pl.ds(BH + 1, 1), :], sem.at[slot, 2],
            ).wait()

    @pl.when(step == 0)
    def _():
        start_dma(0, 0)
        dk_ref[:] = jnp.zeros_like(dk_ref)

    @pl.when(step + 1 < total)
    def _():
        start_dma((step + 1) % 2, step + 1)

    slot = step % 2
    wait_dma(slot, i)

    @pl.when(i == 0)
    def _():
        xbuf[slot, :, 0:1, :] = jnp.zeros((c, 1, w), xbuf.dtype)

    @pl.when(i == nb - 1)
    def _():
        xbuf[slot, :, BH + 1:BH + 2, :] = jnp.zeros((c, 1, w), xbuf.dtype)

    xw = xbuf[slot]
    if interpret:
        roll = lambda v, s: jnp.roll(v, s, axis=1)  # noqa: E731
    else:
        roll = functools.partial(pltpu.roll, axis=1)
    wcol = lax.broadcasted_iota(jnp.int32, (c, SUB * w), 1) % w

    for s in range(BH // SUB):
        dyb = dy_ref[0, :, s * SUB:(s + 1) * SUB, :].reshape(c, SUB * w)
        pieces = []
        for dh in range(3):
            rows = xw[:, s * SUB + dh: s * SUB + dh + SUB, :]
            rows = rows.astype(jnp.float32).reshape(c, SUB * w)
            for dw_ in (-1, 0, 1):
                if dw_ == -1:
                    p = jnp.where(wcol == 0, 0.0, roll(rows, 1))
                elif dw_ == 1:
                    p = jnp.where(wcol == w - 1, 0.0, roll(rows, SUB * w - 1))
                else:
                    p = rows
                pieces.append(p.astype(xbuf.dtype))
        b = jnp.concatenate(pieces, axis=0)  # [9C, SUB*W]
        dk_ref[:, :] += lax.dot_general(
            b, dyb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _conv3x3_dw_impl(x, dy, *, interpret=False):
    """dk [3, 3, C, C] (f32) for y = conv3x3_nchw(x, k)."""
    n, c, h, w = x.shape
    nb = h // BH
    dk = pl.pallas_call(
        functools.partial(_dw_kernel, nb=nb, c=c, w=w, interpret=interpret),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c, BH, w), lambda nn_, ii: (nn_, 0, ii, 0)),
        ],
        out_specs=pl.BlockSpec((9 * c, c), lambda nn_, ii: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * c, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, FETCH, w), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(x, dy)
    return dk.reshape(3, 3, c, c)


@functools.lru_cache(maxsize=2)
def _conv_fn(interpret: bool):
    @jax.custom_vjp
    def f(x, k):
        return _conv3x3_nchw_impl(x, _pack(k, x.dtype), interpret=interpret)

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
        dk = _conv3x3_dw_impl(x, dy, interpret=interpret)
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
