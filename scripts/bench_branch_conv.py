"""Microbenchmark: HRNet branch-0 (48-channel) 3x3 conv formulations.

Motivation (BASELINE.md round-3 config-5 analysis): the sync-op trace shows
XLA's 48-channel conv fusions on bf16[8,256,256,48] run at ~18% MXU
efficiency — C=48 pads to 128 lanes on BOTH channel dims ((48/128)^2 = 14%
tile utilization) — and XLA ping-pongs activations between a C-minor conv
layout and a W-minor elementwise layout (~100+ ms/step of transpose copies).

Candidate fix: a layout-pinned Pallas kernel on NCHW activations
(W in lanes, never relaid out) computing the conv as matmuls where the
48-wide output channel dim sits in the M (streaming) dimension of the MXU.
Probe variants isolate the cost structure:

  io        DMA in + write out, no compute (IO floor)
  noshift   9 accumulated dots on unshifted row reads (MXU+read cost; WRONG
            math — perf probe only)
  outshift  9 dots on unshifted rows, dw handled by shifting the f32
            OUTPUTS (3 rolls per block instead of 6 input shifts)
  im2col    one dot per subgroup on a sublane-stacked B[432, SUB*W]
  im2col16  same with 16-row subgroups (B[432, 16*W]; 32-row blocks OOM'd
            scoped VMEM at ~14 MB of f32 pieces)

Input rows arrive via manual double-buffered DMA (x in ANY memory space):
the 1-row conv halo makes BlockSpec windows unexpressible, so each grid
step DMAs a 40-row aligned window (H padded by 1+7) for its 32 output rows.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_branch_conv.py
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, H, W = 8, 48, 256, 256
BH = 32           # output rows per grid step
FETCH = BH + 8    # DMA window: 8-aligned, holds BH+2 halo'd rows
TAPS = 9
NB = H // BH


def xla_conv_nhwc(x, k):
    """The current model path: bf16 NHWC conv via XLA."""
    return jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def xla_chain_nhwc(x, k, mul, add):
    """affine(f32)+relu -> bf16 -> conv: the exact math of the fused kernel."""
    xa = jnp.maximum(x.astype(jnp.float32) * mul + add, 0).astype(jnp.bfloat16)
    return xla_conv_nhwc(xa, k)


# ---------------------------------------------------------------------------
# pallas kernel (NCHW; manual double-buffered DMA for the halo'd windows)
# ---------------------------------------------------------------------------

def _make_kernel(formulation, apply_affine, sub):
    nsub = BH // sub

    def kernel(x_hbm, a_ref, mul_ref, add_ref, y_ref, st_ref, xact, xbuf, sem):
        n, i = pl.program_id(0), pl.program_id(1)
        step = n * NB + i
        total = N * NB

        def start_dma(slot, s):
            n2 = s // NB
            i2 = jax.lax.rem(s, NB)
            pltpu.make_async_copy(
                x_hbm.at[n2, :, pl.ds(i2 * BH, FETCH), :],
                xbuf.at[slot], sem.at[slot],
            ).start()

        @pl.when(step == 0)
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)
            start_dma(0, 0)

        @pl.when(step + 1 < total)
        def _():
            start_dma((step + 1) % 2, step + 1)

        pltpu.make_async_copy(
            x_hbm.at[n, :, pl.ds(i * BH, FETCH), :],
            xbuf.at[step % 2], sem.at[step % 2],
        ).wait()

        if formulation == "io":
            y_ref[0] = xbuf[step % 2, :, 1:BH + 1, :]
            return

        x = xbuf[step % 2].astype(jnp.float32)  # [C, FETCH, W]
        if apply_affine:
            mul = mul_ref[:, :][:, :, None]
            add = add_ref[:, :][:, :, None]
            x = jnp.maximum(x * mul + add, 0.0)
        # Halo rows outside the image must stay ZERO after the affine
        # (the reference activates before zero-padding): window row r is
        # original row i*BH + r - 1, valid iff 0 <= it < H.
        row0 = i * BH - 1
        rr = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, FETCH, 1), 1)
        x = jnp.where((rr >= 0) & (rr < H), x, 0.0)
        xact[:] = x.astype(jnp.bfloat16)

        def emit(y, s, rows):
            """write bf16 output rows + accumulate channel stats."""
            yb = y.astype(jnp.bfloat16)
            y_ref[0, :, s * rows:(s + 1) * rows, :] = yb.reshape(C, rows, W)
            yf = yb.astype(jnp.float32)
            st_ref[:, 0:1] += jnp.sum(yf, axis=1, keepdims=True)
            st_ref[:, 1:2] += jnp.sum(yf * yf, axis=1, keepdims=True)

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if formulation == "noshift":
            # WRONG MATH (dw shifts skipped): isolates MXU + row-read cost.
            for s in range(nsub):
                y = jnp.zeros((C, sub * W), jnp.float32)
                for dh in range(3):
                    rows = xact[:, s * sub + dh: s * sub + dh + sub, :]
                    rows = rows.reshape(C, sub * W)
                    for dw in range(3):
                        t = 3 * dh + dw
                        y += dot(a_ref[:, t * C:(t + 1) * C], rows)
                emit(y, s, sub)
            return

        if formulation == "outshift":
            # dw handled on the f32 outputs: tmp_dw = sum_dh A@rows, then
            # y = tmp[1] + shiftL(tmp[2]) + shiftR(tmp[0]) per block.
            wcol = jax.lax.broadcasted_iota(jnp.int32, (C, BH * W), 1) % W
            tmp = []
            for dw in range(3):
                parts = []
                for s in range(nsub):
                    part = jnp.zeros((C, sub * W), jnp.float32)
                    for dh in range(3):
                        rows = xact[:, s * sub + dh: s * sub + dh + sub, :]
                        rows = rows.reshape(C, sub * W)
                        part += dot(
                            a_ref[:, (3 * dh + dw) * C:(3 * dh + dw + 1) * C],
                            rows)
                    parts.append(part)
                tmp.append(jnp.concatenate(parts, axis=1))
            # y[w] = tmp0[w-1] + tmp1[w] + tmp2[w+1]
            left = jnp.where(wcol == 0, 0.0, pltpu.roll(tmp[0], 1, 1))
            right = jnp.where(wcol == W - 1, 0.0,
                              pltpu.roll(tmp[2], BH * W - 1, 1))
            emit(tmp[1] + left + right, 0, BH)
            return

        # im2col variants: B stacks 9 shifted row-groups in sublanes.
        # (rows_per = BH would need ~14 MB of f32 pieces -> VMEM OOM; the
        # subgroup size caps the transient footprint.)
        rows_per = 16 if formulation == "im2col16" else sub
        wcol = jax.lax.broadcasted_iota(jnp.int32, (C, rows_per * W), 1) % W

        def shifted(rows, dw):
            if dw == -1:
                rows = jnp.where(wcol == 0, 0.0, pltpu.roll(rows, 1, 1))
            elif dw == 1:
                rows = jnp.where(wcol == W - 1, 0.0,
                                 pltpu.roll(rows, rows_per * W - 1, 1))
            return rows.astype(jnp.bfloat16)

        for s in range(BH // rows_per):
            pieces = []
            for dh in range(3):
                rows = xact[:, s * rows_per + dh: s * rows_per + dh + rows_per, :]
                rows = rows.astype(jnp.float32).reshape(C, rows_per * W)
                for dw in (-1, 0, 1):
                    pieces.append(shifted(rows, dw))
            b = jnp.concatenate(pieces, axis=0)  # [9C, rows_per*W]
            emit(dot(a_ref[:], b), s, rows_per)

    return kernel


def pallas_conv(x_nchw, k, mul, add, *, formulation="im2col",
                apply_affine=True, sub=8, interpret=False):
    """x_nchw [N, C, H, W] bf16 -> (y [N, C, H, W] bf16, stats [C, 2] f32)."""
    a = k.reshape(TAPS * C, C).T.astype(jnp.bfloat16)  # [C, 9C]
    xp = jnp.pad(x_nchw, ((0, 0), (0, 0), (1, FETCH - BH - 1), (0, 0)))
    return pl.pallas_call(
        _make_kernel(formulation, apply_affine, sub),
        grid=(N, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C, TAPS * C), lambda n, i: (0, 0)),
            pl.BlockSpec((C, 1), lambda n, i: (0, 0)),
            pl.BlockSpec((C, 1), lambda n, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, BH, W), lambda n, i: (n, 0, i, 0)),
            pl.BlockSpec((C, 2), lambda n, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, C, H, W), jnp.bfloat16),
            jax.ShapeDtypeStruct((C, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, FETCH, W), jnp.bfloat16),
            pltpu.VMEM((2, C, FETCH, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a, mul.reshape(C, 1), add.reshape(C, 1))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

REPEAT = 24  # convs chained per program via lax.scan


def bench(name, fn, x, *args, iters=8):
    """Per-conv device time.  A single dispatched program on this relayed
    chip floors at ~1.3-1.8 ms wall regardless of content (measured: the
    IO-only kernel timed SLOWER than a compute variant), so each timed
    dispatch chains REPEAT convs (output feeds input — C==C, SAME pad)."""

    def body(c, _):
        out = fn(c, *args)
        y = out[0] if isinstance(out, (tuple, list)) else out
        return y.astype(c.dtype), ()

    def run(x0):
        y, _ = jax.lax.scan(body, x0, None, length=REPEAT)
        return y

    f = jax.jit(run)
    float(jnp.sum(f(x).astype(jnp.float32)))  # warmup + relay fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (iters * REPEAT)
    flops = 2 * N * H * W * C * C * TAPS
    print(f"{name:24s} {dt * 1e3:7.3f} ms   {flops / dt / 1e12:6.1f} TF/s "
          f"({100 * flops / dt / 197e12:4.1f}% MXU)", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32),
                    jnp.bfloat16) * 0.5
    k = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32)) * 0.05
    mul = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    add = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))

    ref = jax.jit(xla_chain_nhwc)(x, k, mul, add).astype(jnp.float32)
    for form in ("im2col", "im2col16", "outshift"):
        y, st = jax.jit(functools.partial(pallas_conv, formulation=form))(
            x_nchw, k, mul, add)
        got = jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.float32)
        err = jnp.max(jnp.abs(got - ref))
        print(f"{form}: max|err| = {float(err):.5f} "
              f"(mean|y| {float(jnp.mean(jnp.abs(ref))):.3f})")
        sgot = jnp.sum(got, axis=(0, 1, 2))
        serr = jnp.max(jnp.abs(st[:, 0] - sgot) / (jnp.abs(sgot) + 1))
        print(f"{form}: stats vs own-output rel err = {float(serr):.2e}",
              flush=True)

    print()
    bench("xla_conv_nhwc", xla_conv_nhwc, x, k)
    bench("xla_chain_nhwc", xla_chain_nhwc, x, k, mul, add)
    for form in ("io", "noshift", "outshift", "im2col", "im2col16"):
        bench(f"pallas_{form}",
              lambda xx, form=form: pallas_conv(
                  xx, k, mul, add, formulation=form),
              x_nchw)


if __name__ == "__main__":
    main()
