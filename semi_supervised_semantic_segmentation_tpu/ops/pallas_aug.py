"""Pallas TPU kernel: fused CutMix + ImageNet-normalize (SURVEY N5 — the
on-device RNG path done with ``pltpu.prng_seed``/``prng_random_bits``
inside the kernel, box mask generated in VMEM, partner pixels mixed and
normalized to bf16 in one pass over HBM).

Layout note (TPU-first): NHWC with C=3 would put 3 elements on the 128-lane
axis, so the kernel views images as (B, H, W*3) — full lane occupancy; the
channel index is reconstructed as ``lane % 3`` for the per-channel
normalize, and the box column test uses ``lane // 3``.

The box distribution matches ``augment.cutmix_boxes`` (lambda ~ U(0,1),
cut = sqrt(1-lambda), uniform center, clipped), but the random *stream*
is the Pallas per-core PRNG rather than threefry, so this path is opt-in
(``data.aug_impl`` stays the XLA version by default); geometric invariants
are tested rather than bit-parity.

Grid: (B, H // block_h).  Every H-tile of sample b re-seeds with
``seed + b`` and draws the same 4 uniforms, so all tiles of one image agree
on the box without cross-tile communication.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniforms_from_bits(bits):
    """uint32 bits -> f32 uniforms in [0, 1) (24-bit mantissa exact)."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / 16777216.0)


def _kernel(
    seed_ref,  # (1,) int32 in SMEM
    img_ref,  # (1, bh, W3) f32   (self)
    partner_ref,  # (1, bh, W3) f32   (roll-1 partner)
    lab_ref,  # (1, bh, W) i32
    partner_lab_ref,
    conf_ref,  # (1, bh, W) i32 (0/1)
    partner_conf_ref,
    out_img_ref,  # (1, bh, W3) out dtype
    out_lab_ref,
    out_conf_ref,
    *,
    height: int,
    width: int,
    block_h: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    prob: float,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # Same seed for every H-tile of sample b -> identical box scalars.
    pltpu.prng_seed(seed_ref[0] + b)
    u = _uniforms_from_bits(pltpu.prng_random_bits((8, 128)))
    lam, ucy, ucx, uprob = u[0, 0], u[0, 1], u[0, 2], u[0, 3]

    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (ratio * height).astype(jnp.int32)
    cut_w = (ratio * width).astype(jnp.int32)
    cy = (ucy * height).astype(jnp.int32)
    cx = (ucx * width).astype(jnp.int32)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    y2 = jnp.clip(cy + cut_h // 2, 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    x2 = jnp.clip(cx + cut_w // 2, 0, width)
    apply = uprob < prob

    w3 = width * 3
    row0 = t * block_h
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (block_h, w3), 0) + row0
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (block_h, w3), 1)
    cols3 = lanes3 // 3
    box3 = (
        (rows3 >= y1) & (rows3 < y2) & (cols3 >= x1) & (cols3 < x2) & apply
    )

    mixed = jnp.where(box3, partner_ref[0], img_ref[0])
    ch = lanes3 % 3
    m = jnp.where(ch == 0, mean[0], jnp.where(ch == 1, mean[1], mean[2]))
    s = jnp.where(ch == 0, std[0], jnp.where(ch == 1, std[1], std[2]))
    out_img_ref[0] = ((mixed - m) / s).astype(out_img_ref.dtype)

    rows = jax.lax.broadcasted_iota(jnp.int32, (block_h, width), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_h, width), 1)
    box = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2) & apply
    out_lab_ref[0] = jnp.where(box, partner_lab_ref[0], lab_ref[0])
    out_conf_ref[0] = jnp.where(box, partner_conf_ref[0], conf_ref[0])


def cutmix_normalize_pallas(
    images01: jnp.ndarray,  # (B, H, W, 3) f32 in [0,1] (strong views)
    labels: jnp.ndarray,  # (B, H, W) i32 pseudo-labels
    conf: jnp.ndarray,  # (B, H, W) bool confidence mask
    seed,  # int32 scalar
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
    prob: float = 1.0,
    out_dtype=jnp.bfloat16,
    block_h: int = 128,
    interpret: bool = False,
):
    """Fused CutMix + normalize: returns (normalized mixed images[out_dtype],
    mixed labels i32, mixed conf bool) in ONE pass over HBM."""
    bsz, h, w, c = images01.shape
    assert c == 3, "RGB only"
    block_h = min(block_h, h)
    assert h % block_h == 0, (h, block_h)
    img_flat = images01.reshape(bsz, h, w * 3)
    conf_i = conf.astype(jnp.int32)
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)

    grid = (bsz, h // block_h)

    def self_map(b, t):
        return (b, t, 0)

    def partner_map(b, t):
        return ((b + bsz - 1) % bsz, t, 0)

    img_spec = lambda m: pl.BlockSpec((1, block_h, w * 3), m, memory_space=pltpu.VMEM)
    map_spec = lambda m: pl.BlockSpec((1, block_h, w), m, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel,
        height=h, width=w, block_h=block_h,
        mean=tuple(float(v) for v in mean),
        std=tuple(float(v) for v in std),
        prob=float(prob),
    )
    out_img, out_lab, out_conf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            img_spec(self_map),
            img_spec(partner_map),
            map_spec(self_map),
            map_spec(partner_map),
            map_spec(self_map),
            map_spec(partner_map),
        ],
        out_specs=[img_spec(self_map), map_spec(self_map), map_spec(self_map)],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w * 3), out_dtype),
            jax.ShapeDtypeStruct((bsz, h, w), jnp.int32),
            jax.ShapeDtypeStruct((bsz, h, w), jnp.int32),
        ],
        interpret=interpret,
    )(seed_arr, img_flat, img_flat, labels, labels, conf_i, conf_i)
    return out_img.reshape(bsz, h, w, 3), out_lab, out_conf.astype(bool)
