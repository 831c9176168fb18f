"""MaxPool 3x3/stride-2/pad-1 with a vectorized backward (rebuilds the
reference's cuDNN pooling surface, SURVEY.md N1; torch MaxPool2d(3,2,1)
semantics).  NON-DEFAULT — opt in with SSTPU_POOL_BWD=vect; see
``supported`` for the whole-step measurement that killed it as default.

The motivating trace: XLA differentiates ``reduce_window(max)`` through
SelectAndScatter, a serialized window scan showing 2.97 ms/step on the
config-3 profile (three [16,256,256,64]-shaped instances, round-5 trace).
The whole-step A/B then showed that scan is largely latency-hidden while
this formulation's ~20 dense passes are not.  The backward computes the
same routing as dense vector ops:

  1. the 9 window taps are stride-2 slices of the (-inf-padded) input, so
     the per-window FIRST-max index (SelectAndScatter's tie rule: strict >
     keeps the earliest tap in row-major window order) is 8 compare/selects
     over [N, OH, OW, C] arrays;
  2. the scatter back to input positions is an interleave: for stride 2,
     kernel 3, pad 1, input row i receives from output rows {(i-1)/2,
     (i+1)/2} (one of them for even i), so dx = stack-reshape of three
     tap-masked dy arrays along each axis — no scatter, no serialization.

Everything is dense elementwise + layout work the TPU VPU pipelines well;
XLA fuses the masks into the interleave stores.  Gradient equality with
the reduce_window VJP (including bf16 ties, which post-ReLU zeros make
common) is pinned by tests/test_pooling.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _reference_pool(x):
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def supported(shape) -> bool:
    """Eligibility for the vectorized backward: [N, H, W, C], even H and W,
    AND the opt-in env SSTPU_POOL_BWD=vect.

    NOT the default: the whole-step A/B (one v5e, 50 iters, 2026-08-21)
    measured the dense tap-mask formulation SLOWER in context — config 2
    (16+16 @256²) 42.3 vs 29.3 ms/step, config 3 (8+8 @512²) 87.4 vs
    82.0 — the ~20 full-tensor passes (9 strided-slice taps, 8
    compare/selects, 9 masks, interleaves) cost more HBM traffic than
    XLA's SelectAndScatter scan, which was partially latency-hidden.
    Kept as a tested formulation record (tests/test_pooling.py)."""
    import os

    if os.environ.get("SSTPU_POOL_BWD") != "vect":
        return False
    return len(shape) == 4 and shape[1] % 2 == 0 and shape[2] % 2 == 0


@jax.custom_vjp
def max_pool_3x3s2(x):
    """nn.max_pool(3x3, stride 2, SAME-ish pad 1) with the vectorized VJP."""
    return _reference_pool(x)


def _fwd(x):
    return _reference_pool(x), x


def _shift_left_pad(a, axis):
    """a[..., 1:, ...] with a trailing zero slot: index p -> a[p + 1]."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, 1)
    return jnp.pad(jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis), pad)


def _bwd(x, dy):
    n, h, w, c = x.shape
    oh, ow = dy.shape[1], dy.shape[2]
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)

    # 9 window taps as stride-2 slices: tap (di, dj) of window (oi, oj)
    # reads input (2oi-1+di, 2oj-1+dj) = xp[2oi+di, 2oj+dj].
    taps = [
        jax.lax.slice(
            xp,
            (0, di, dj, 0),
            (n, di + 2 * (oh - 1) + 1, dj + 2 * (ow - 1) + 1, c),
            (1, 2, 2, 1),
        )
        for di in range(3)
        for dj in range(3)
    ]

    # First-max index per window, SelectAndScatter tie order (strict >
    # keeps the earliest tap).
    best, idx = taps[0], jnp.zeros(taps[0].shape, jnp.int32)
    for k in range(1, 9):
        upd = taps[k] > best
        best = jnp.where(upd, taps[k], best)
        idx = jnp.where(upd, jnp.int32(k), idx)

    m = [jnp.where(idx == k, dy, jnp.zeros_like(dy)) for k in range(9)]

    # Columns: input col j=2oj is tap dj=1 of window oj; odd j=2p+1 is
    # dj=0 of window p+1 plus dj=2 of window p.
    def interleave(even, odd, axis):
        st = jnp.stack([even, odd], axis=axis + 1)
        shp = list(even.shape)
        shp[axis] *= 2
        return st.reshape(shp)

    rows = []
    for di in range(3):
        e = m[3 * di + 1]
        o = _shift_left_pad(m[3 * di + 0], 2) + m[3 * di + 2]
        rows.append(interleave(e, o, 2))  # [N, OH, W, C]

    # Rows: input row i=2oi is di=1 of window oi; odd i=2p+1 is di=0 of
    # window p+1 plus di=2 of window p.
    even_r = rows[1]
    odd_r = _shift_left_pad(rows[0], 1) + rows[2]
    return (interleave(even_r, odd_r, 1),)


max_pool_3x3s2.defvjp(_fwd, _bwd)
