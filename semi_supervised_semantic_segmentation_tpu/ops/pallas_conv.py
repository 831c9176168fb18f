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
HALO = 1
FETCH = BH + 8  # DMA window rows: 16-aligned-friendly, holds BH + 2 halo rows
SUB = 8        # row-subgroup per dot: N = SUB * W lanes


def supported(shape, c_in: int, c_out: int) -> bool:
    """Static eligibility of the pallas path for x [N, C, H, W]."""
    n, c, h, w = shape
    return c_in == c_out and c_in <= 128 and h % BH == 0 and h >= BH


def _kernel(x_hbm, a_ref, y_ref, xbuf, sem, *, nb, c, w, interpret):
    n, i = pl.program_id(0), pl.program_id(1)
    step = n * nb + i
    total = pl.num_programs(0) * nb

    def start_dma(slot, s):
        n2 = s // nb
        i2 = lax.rem(s, nb)
        pltpu.make_async_copy(
            x_hbm.at[n2, :, pl.ds(i2 * BH, FETCH), :],
            xbuf.at[slot], sem.at[slot],
        ).start()

    @pl.when(step == 0)
    def _():
        start_dma(0, 0)

    @pl.when(step + 1 < total)
    def _():
        start_dma((step + 1) % 2, step + 1)

    pltpu.make_async_copy(
        x_hbm.at[n, :, pl.ds(i * BH, FETCH), :],
        xbuf.at[step % 2], sem.at[step % 2],
    ).wait()

    xw = xbuf[step % 2]
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
    # H halo: 1 top + (FETCH - BH - 1) bottom so every window is in range.
    xp = jnp.pad(x, ((0, 0), (0, 0), (HALO, FETCH - BH - HALO), (0, 0)))
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
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a)


def _pack(k, dtype):
    """[3, 3, C, C] HWIO -> A [C_out, 9*C_in] with rows (dh, dw, ci)."""
    c = k.shape[2]
    return k.reshape(9 * c, c).T.astype(dtype)


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
        # dk: XLA's weight-grad conv — contraction over N*H*W is MXU-dense.
        _, vjp = jax.vjp(
            lambda kk: lax.conv_general_dilated(
                x, kk.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "HWIO", "NCHW")),
            k,
        )
        (dk,) = vjp(dy)
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
