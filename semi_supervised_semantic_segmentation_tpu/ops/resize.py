"""Bilinear / nearest resize with exact PyTorch `F.interpolate` semantics.

SURVEY.md §7 flags bilinear-semantics parity (align_corners conventions) as a
silent 0.5-mIoU killer, so this module implements resize from scratch instead
of relying on `jax.image.resize` edge conventions:

  - ``align_corners=True``:  src = dst * (in-1)/(out-1)
  - ``align_corners=False``: src = (dst + 0.5) * in/out - 0.5, edge-clamped
  - ``nearest``:             src = floor(dst * in/out)

The resize is expressed as two matmuls (separable 1-D linear maps), which XLA
lowers onto the MXU — on TPU this beats gather-based formulations and fuses
with surrounding elementwise work.  Weight matrices are computed with NumPy at
trace time from static shapes, so they fold into constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    elif align_corners:  # out_size == 1
        src = np.zeros(1, dtype=np.float64)
    else:
        src = (dst + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - w_hi)
    np.add.at(mat, (rows, hi), w_hi)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Torch 'nearest' source indices: floor(dst * in/out)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.floor(dst * in_size / out_size).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / NHW) arrays along the two spatial
    axes.  Matches ``torch.nn.functional.interpolate(mode='bilinear')``.

    Formulation note (measured, round 2): a phase-decomposed stencil path
    for integer upscale factors (2s shifted multiply-adds + an interleaving
    reshape instead of the two matmuls) was implemented and profiled on the
    chip — it LOST to the matmul path by ~9% of whole-step time on the
    HRNet config: the interleave stack/reshape and edge-clamp shifts turn
    into layout copies (a 1-element boundary slice of a wide-channel tensor
    pads to a full (8,128) tile, up to 128x memory blowup), while the
    banded matmuls run on the MXU in the operand's native layout.  Keep the
    matmul formulation; revisit only with a Pallas kernel that fuses the
    interleave into the surrounding elementwise work.

    Round-3 formulation note (measured, rejected): exact even-integer
    upsampling as two depthwise lhs-dilated convolutions (palindromic
    2s-tap kernel [1,3,..,2s-1,2s-1,..,3,1]/2s at padding 3s/2-1;
    replicate-pad 1 + slice offset s reproduces the edge clamp) measured
    2.3x the matmul FORWARD standalone at [8,64,64,720]->256^2 (0.744 vs
    1.744 ms) — but IN CONTEXT it regressed whole steps massively
    (config 3: 83.8 -> 133.8 ms; config 5: 542 -> 732 ms): the conv
    transpose of an lhs-dilated depthwise conv in the backward and the
    small-channel cases (21-ch logits) are far slower than the matmul's
    simple transposed matmul.  The matmul path stays.
    """
    batched = x.ndim == 4
    if not batched:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = out_hw
    orig_dtype = x.dtype
    wh = jnp.asarray(_linear_weights(h, oh, align_corners))
    ww = jnp.asarray(_linear_weights(w, ow, align_corners))
    # (oh, h) @ (n, h, w*c) -> contract over h, then over w.
    # MXU strategy: matmul in the input dtype (bf16 stays a single MXU pass)
    # with float32 accumulation via preferred_element_type; interpolation
    # weights for typical power-of-two scale factors are bf16-exact.  On
    # CPU (tests) f32 inputs stay exact f32.
    if orig_dtype in (jnp.bfloat16, jnp.float16):
        # Single MXU pass with f32 accumulation.
        xc = x
        wh = wh.astype(orig_dtype)
        ww = ww.astype(orig_dtype)
        precision = None
    else:
        # Exact f32 (CPU tests / eval parity paths).
        xc = x.astype(jnp.float32)
        precision = jax.lax.Precision.HIGHEST
    y = jnp.einsum(
        "oh,nhwc->nowc", wh, xc,
        precision=precision, preferred_element_type=jnp.float32,
    )
    y = jnp.einsum(
        "pw,nowc->nopc", ww, y.astype(xc.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    )
    y = y.astype(orig_dtype)
    if not batched:
        y = y[0]
    return y


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (torch 'nearest' mode) for labels / integer maps.

    Works on (N, H, W) or (N, H, W, C) arrays; dtype-preserving.
    """
    has_c = x.ndim == 4
    oh, ow = out_hw
    h = x.shape[1]
    w = x.shape[2]
    iy = jnp.asarray(_nearest_indices(h, oh))
    ix = jnp.asarray(_nearest_indices(w, ow))
    y = jnp.take(x, iy, axis=1)
    y = jnp.take(y, ix, axis=2)
    del has_c
    return y
