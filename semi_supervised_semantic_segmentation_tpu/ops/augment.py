"""On-device augmentation: the reference's CPU-side PIL/torchvision weak and
strong transforms (C2 RandomScaleCrop/Flip, C3 ColorJitter(+gray/blur),
C4 CutMix) rebuilt as fused XLA programs that run *inside* the jitted train
step on uint8 HBM-resident batches (BASELINE.json:5).

Design notes (TPU-first):
  - The host ships a static-shape uint8 canvas (B, Hc, Wc, 3) plus the true
    per-sample (h, w); every random transform happens on device with
    `jax.random` threefry keys threaded through the step, so the same seed
    reproduces the same augmentation stream on any mesh.
  - Random scale-crop is formulated as an *inverse-mapped bilinear gather at
    a static output size*: sample scale s, integer crop offset in the scaled
    frame, then compute source coordinates per output pixel and take a
    separable 4-tap gather.  This is mathematically identical to
    "F.interpolate(bilinear, align_corners=False) -> pad -> crop" but needs
    no dynamic shapes, so XLA compiles it once.
  - Color jitter reproduces torchvision ColorJitter semantics (factor
    ranges, random op order, clamp-to-[0,1] blends, HSV hue shift).
  - CutMix mixes each sample with its batch neighbor (roll-by-1 pairing)
    under a rectangular mask shared by image, pseudo-label, and confidence
    mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Color-space helpers (torchvision functional-tensor semantics)
# ---------------------------------------------------------------------------

_GRAY_WEIGHTS = jnp.asarray([0.2989, 0.587, 0.114], dtype=jnp.float32)


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0,1] -> (..., 1) luminance, torchvision weights."""
    return jnp.sum(img * _GRAY_WEIGHTS, axis=-1, keepdims=True)


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_div = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = jnp.where(maxc == r, bc - gc, 0.0)
    hg = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
    hb = jnp.where((maxc != g) & (maxc != r), 4.0 + gc - rc, 0.0)
    h = hr + hg + hb
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    # Select channel combos per sextant (torchvision _hsv2rgb tables).
    def pick(a):  # a: list of 6 arrays
        out = a[0]
        for k in range(1, 6):
            out = jnp.where(i == k, a[k], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _blend(img1: jnp.ndarray, img2: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    """torchvision _blend: clamp(ratio*img1 + (1-ratio)*img2, 0, 1)."""
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    # Blend with the scalar mean of the grayscale image (per sample).
    mean = jnp.mean(rgb_to_grayscale(img), axis=(-3, -2, -1), keepdims=True)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    return _blend(img, rgb_to_grayscale(img), factor)


def adjust_hue(img, delta):
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = jnp.mod(hsv[..., 0] + delta, 1.0)
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


# ---------------------------------------------------------------------------
# Color jitter (torchvision ColorJitter with random op order)
# ---------------------------------------------------------------------------


def _sample_factor(key, strength: float) -> jnp.ndarray:
    """U(max(0, 1-s), 1+s), torchvision ColorJitter factor convention."""
    lo = max(0.0, 1.0 - strength)
    hi = 1.0 + strength
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


def color_jitter_single(
    img: jnp.ndarray,
    key: jax.Array,
    brightness: float = 0.5,
    contrast: float = 0.5,
    saturation: float = 0.5,
    hue: float = 0.25,
) -> jnp.ndarray:
    """Apply brightness/contrast/saturation/hue in a random order to one
    (H, W, 3) image in [0,1].  Semantics track torchvision ColorJitter."""
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = _sample_factor(kb, brightness)
    fc = _sample_factor(kc, contrast)
    fs = _sample_factor(ks, saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    perm = jax.random.permutation(kperm, 4)

    branches = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    ]

    def body(x, op_idx):
        return jax.lax.switch(op_idx, branches, x), None

    out, _ = jax.lax.scan(body, img, perm)
    return out


def _blur_band(sigma: jnp.ndarray, size: int, kernel_size: int) -> jnp.ndarray:
    """(B, size+2r, size) banded blur matrix, built elementwise (no gather).

    Entry [b, p, q] is sample b's normalized gaussian tap at offset
    p - q - r (zero outside the k-tap band), so that for a reflect-padded
    signal xp of length size+2r, ``xp @ band`` is the k-tap blur.  The taps
    are a smooth function of the offset, so the whole matrix is one exp()
    over a (B, size+2r, size) iota grid — cheaper and simpler than building
    tap vectors and scattering them into a matrix.
    """
    r = kernel_size // 2
    t = jnp.arange(-r, r + 1, dtype=jnp.float32)
    inv2s2 = 1.0 / (2.0 * sigma.astype(jnp.float32) ** 2)  # (B,)
    norm = jnp.sum(jnp.exp(-(t**2) * inv2s2[:, None]), axis=1)  # (B,)
    p = jnp.arange(size + 2 * r, dtype=jnp.float32)[:, None]
    q = jnp.arange(size, dtype=jnp.float32)[None, :]
    d = p - q - r  # tap offset
    band = jnp.exp(-(d**2)[None] * inv2s2[:, None, None])
    return jnp.where(jnp.abs(d)[None] <= r, band, 0.0) / norm[:, None, None]


def gaussian_blur(
    img: jnp.ndarray, sigma: jnp.ndarray, kernel_size: int
) -> jnp.ndarray:
    """Separable Gaussian blur of (B, H, W, C) with per-sample sigma.

    torchvision GaussianBlur semantics: gaussian taps normalized to sum 1,
    reflect padding.  Each axis pass is ONE batched matmul against a banded
    (B, size+2r, size) matrix built elementwise from the gaussian — the
    per-sample kernels ride the MXU instead of a feature_group_count=B*C
    depthwise convolution (which TPUs execute serially per group: 2.62 ms
    vs 1.06 ms for the band form at 8x512^2, k=51, round 4).  HIGHEST
    precision keeps the matmul in true f32 (the conv path's default bf16
    operands drifted ~4e-3).
    """
    b, h, w, c = img.shape
    r = kernel_size // 2
    orig_dtype = img.dtype
    xf = img.astype(jnp.float32)
    prec = jax.lax.Precision.HIGHEST

    band_w = _blur_band(sigma, w, kernel_size)
    xp = jnp.pad(xf, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
    y = jnp.einsum("bhpc,bpq->bhqc", xp, band_w, precision=prec)

    band_h = band_w if h == w else _blur_band(sigma, h, kernel_size)
    yp = jnp.pad(y, ((0, 0), (r, r), (0, 0), (0, 0)), mode="reflect")
    out = jnp.einsum("bpqc,bpi->biqc", yp, band_h, precision=prec)
    return out.astype(orig_dtype)


def blur_kernel_size(crop_size: int) -> int:
    """UniMatch-style kernel size: ~10% of the crop, forced odd, >= 3."""
    k = int(0.1 * crop_size) // 2 * 2 + 1
    return max(k, 3)


def strong_augment_batch(
    images: jnp.ndarray,
    key: jax.Array,
    *,
    jitter_prob: float = 0.8,
    brightness: float = 0.5,
    contrast: float = 0.5,
    saturation: float = 0.5,
    hue: float = 0.25,
    grayscale_prob: float = 0.2,
    blur_prob: float = 0.5,
    blur_kernel: int = 11,
) -> jnp.ndarray:
    """Strong photometric augmentation of a (B, H, W, 3) batch in [0,1].

    Pipeline (UniMatch/FixMatch-seg recipe): RandomApply(ColorJitter, 0.8)
    -> RandomGrayscale(0.2) -> RandomApply(GaussianBlur, 0.5).  Geometry is
    shared with the weak view (teacher pseudo-labels stay aligned).
    """
    b = images.shape[0]
    kj, kjp, kg, kbl, kblp, ksig = jax.random.split(key, 6)

    jittered = jax.vmap(
        partial(
            color_jitter_single,
            brightness=brightness,
            contrast=contrast,
            saturation=saturation,
            hue=hue,
        )
    )(images, jax.random.split(kj, b))
    apply_j = jax.random.uniform(kjp, (b,)) < jitter_prob
    out = jnp.where(apply_j[:, None, None, None], jittered, images)

    gray = jnp.broadcast_to(rgb_to_grayscale(out), out.shape)
    apply_g = jax.random.uniform(kg, (b,)) < grayscale_prob
    out = jnp.where(apply_g[:, None, None, None], gray, out)

    sigma = jax.random.uniform(ksig, (b,), minval=0.1, maxval=2.0)
    blurred = gaussian_blur(out, sigma, blur_kernel)
    apply_b = jax.random.uniform(kblp, (b,)) < blur_prob
    out = jnp.where(apply_b[:, None, None, None], blurred, out)
    del kbl
    return out


# ---------------------------------------------------------------------------
# Weak geometric augmentation: fused random scale-crop-flip
# ---------------------------------------------------------------------------


def _src_taps(coords: jnp.ndarray, limit: jnp.ndarray):
    """Torch-style clamped bilinear taps for 1-D source coords."""
    src = jnp.maximum(coords, 0.0)
    i0 = jnp.minimum(jnp.floor(src), limit - 1).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, (limit - 1).astype(jnp.int32))
    frac = jnp.clip(src - i0.astype(jnp.float32), 0.0, 1.0)
    return i0, i1, frac


def scale_crop_flip_single(
    img_u8: jnp.ndarray,  # (Hc, Wc, 3) uint8 canvas
    label: jnp.ndarray,  # (Hc, Wc) int32
    size_hw: jnp.ndarray,  # (2,) true content size
    s: jnp.ndarray,  # () scale factor
    oy: jnp.ndarray,  # () integer-valued crop offset (scaled frame), float
    ox: jnp.ndarray,
    flip: jnp.ndarray,  # () bool
    *,
    crop_size: int,
    fill_rgb: Tuple[float, float, float],
    ignore_index: int,
):
    """Deterministic core of the fused weak aug: equivalent to
    ``interpolate(bilinear, align_corners=False) -> pad(right/bottom) ->
    crop(oy, ox) -> hflip`` but as one static-shape gather.  Exposed
    separately so parity tests can drive it with fixed parameters against a
    torch-CPU oracle of the same recipe.

    Returns ``(image, label, valid)`` where ``valid`` is the geometric
    content mask (False where the crop fell outside the scaled image and the
    output is fill/ignore padding).  SSL methods need it because unlabeled
    views have no ground-truth labels to carry the ignore marker — padded
    pixels must not receive pseudo-label or consistency supervision."""
    h = size_hw[0].astype(jnp.float32)
    w = size_hw[1].astype(jnp.float32)
    sh = jnp.maximum(jnp.round(h * s), 1.0)
    sw = jnp.maximum(jnp.round(w * s), 1.0)

    grid = jnp.arange(crop_size, dtype=jnp.float32)
    ys = (grid + oy + 0.5) * (h / sh) - 0.5
    xs = (grid + ox + 0.5) * (w / sw) - 0.5
    yvalid = (grid + oy) < sh
    xvalid = (grid + ox) < sw
    valid = yvalid[:, None] & xvalid[None, :]

    y0, y1, wy = _src_taps(ys, h)
    x0, x1, wx = _src_taps(xs, w)

    imgf = img_u8.astype(jnp.float32) * (1.0 / 255.0)
    top = jnp.take(imgf, y0, axis=0)
    bot = jnp.take(imgf, y1, axis=0)
    rows = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
    left = jnp.take(rows, x0, axis=1)
    right = jnp.take(rows, x1, axis=1)
    out = left * (1.0 - wx)[None, :, None] + right * wx[None, :, None]
    fill = jnp.asarray(fill_rgb, dtype=jnp.float32)
    out = jnp.where(valid[:, :, None], out, fill)

    # Labels: nearest-center sampling, out-of-content -> ignore_index.
    ly = jnp.clip(jnp.floor(ys + 0.5), 0, h - 1).astype(jnp.int32)
    lx = jnp.clip(jnp.floor(xs + 0.5), 0, w - 1).astype(jnp.int32)
    lab = jnp.take(jnp.take(label, ly, axis=0), lx, axis=1)
    lab = jnp.where(valid, lab, ignore_index)

    out = jnp.where(flip, out[:, ::-1, :], out)
    lab = jnp.where(flip, lab[:, ::-1], lab)
    valid = jnp.where(flip, valid[:, ::-1], valid)
    return out, lab.astype(jnp.int32), valid


def _hat_weights(src: jnp.ndarray, limit: jnp.ndarray, size: int) -> jnp.ndarray:
    """(crop, size) bilinear hat-weight matrix for traced source coords.

    Equivalent to the clamped two-tap gather (``_src_taps``) but expressed
    densely so resampling becomes a matmul on the MXU — TPU gathers along
    the lane dimension are slow, batched matmuls are not.  Columns beyond
    the true content (>= limit) get zero weight automatically because src is
    clamped to limit-1 and the hat has unit support."""
    src = jnp.clip(src, 0.0, limit - 1.0)
    idx = jax.lax.broadcasted_iota(jnp.float32, (src.shape[0], size), 1)
    return jnp.clip(1.0 - jnp.abs(src[:, None] - idx), 0.0, 1.0)


def scale_crop_flip_single_matmul(
    img_u8: jnp.ndarray,
    label: jnp.ndarray,
    size_hw: jnp.ndarray,
    s: jnp.ndarray,
    oy: jnp.ndarray,
    ox: jnp.ndarray,
    flip: jnp.ndarray,
    *,
    crop_size: int,
    fill_rgb: Tuple[float, float, float],
    ignore_index: int,
):
    """MXU formulation of ``scale_crop_flip_single`` (bit-compatible up to
    fp accumulation): out = W_y @ img @ W_x^T with per-sample traced hat
    weights; the flip folds into the coordinate vectors."""
    hc, wc = img_u8.shape[0], img_u8.shape[1]
    h = size_hw[0].astype(jnp.float32)
    w = size_hw[1].astype(jnp.float32)
    sh = jnp.maximum(jnp.round(h * s), 1.0)
    sw = jnp.maximum(jnp.round(w * s), 1.0)

    grid = jnp.arange(crop_size, dtype=jnp.float32)
    ys = (grid + oy + 0.5) * (h / sh) - 0.5
    xs = (grid + ox + 0.5) * (w / sw) - 0.5
    yvalid = (grid + oy) < sh
    xvalid = (grid + ox) < sw
    # Fold the horizontal flip into the output coordinate order.
    xs = jnp.where(flip, xs[::-1], xs)
    xvalid = jnp.where(flip, xvalid[::-1], xvalid)
    valid = yvalid[:, None] & xvalid[None, :]

    wy = _hat_weights(ys, h, hc)  # (crop, Hc)
    wx = _hat_weights(xs, w, wc)  # (crop, Wc)
    imgf = img_u8.astype(jnp.float32) * (1.0 / 255.0)
    rows = jnp.einsum(
        "oh,hwc->owc", wy, imgf, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "pw,owc->opc", wx, rows, precision=jax.lax.Precision.HIGHEST
    )
    fill = jnp.asarray(fill_rgb, dtype=jnp.float32)
    out = jnp.where(valid[:, :, None], out, fill)

    # Labels stay a two-tap nearest gather (int semantics, cheap).
    ly = jnp.clip(jnp.floor(ys + 0.5), 0, h - 1).astype(jnp.int32)
    lx = jnp.clip(jnp.floor(xs + 0.5), 0, w - 1).astype(jnp.int32)
    lab = jnp.take(jnp.take(label, ly, axis=0), lx, axis=1)
    lab = jnp.where(valid, lab, ignore_index)
    return out, lab.astype(jnp.int32), valid


def _weak_single(
    img_u8: jnp.ndarray,
    label: jnp.ndarray,
    size_hw: jnp.ndarray,
    key: jax.Array,
    *,
    crop_size: int,
    scale_min: float,
    scale_max: float,
    hflip_prob: float,
    fill_rgb: Tuple[float, float, float],
    ignore_index: int,
    impl: str = "matmul",
):
    """Sample (scale, crop offset, flip) and run the deterministic core."""
    h = size_hw[0].astype(jnp.float32)
    w = size_hw[1].astype(jnp.float32)
    ks, koy, kox, kf = jax.random.split(key, 4)
    s = jax.random.uniform(ks, (), minval=scale_min, maxval=scale_max)
    sh = jnp.maximum(jnp.round(h * s), 1.0)
    sw = jnp.maximum(jnp.round(w * s), 1.0)
    # Integer crop offsets in the scaled frame; 0 when the scaled image is
    # smaller than the crop (the remainder shows up as fill/ignore padding,
    # exactly like resize -> pad(right/bottom) -> crop in the host recipe).
    oy = jnp.floor(jax.random.uniform(koy, ()) * (jnp.maximum(sh - crop_size, 0.0) + 1.0))
    ox = jnp.floor(jax.random.uniform(kox, ()) * (jnp.maximum(sw - crop_size, 0.0) + 1.0))
    flip = jax.random.uniform(kf, ()) < hflip_prob
    core = scale_crop_flip_single_matmul if impl == "matmul" else scale_crop_flip_single
    return core(
        img_u8,
        label,
        size_hw,
        s,
        oy,
        ox,
        flip,
        crop_size=crop_size,
        fill_rgb=fill_rgb,
        ignore_index=ignore_index,
    )


def weak_augment_batch(
    images_u8: jnp.ndarray,  # (B, Hc, Wc, 3) uint8
    labels: jnp.ndarray,  # (B, Hc, Wc) int32 (255 where unlabeled/pad)
    sizes: jnp.ndarray,  # (B, 2) int32 true (h, w)
    key: jax.Array,
    *,
    crop_size: int,
    scale_min: float = 0.5,
    scale_max: float = 2.0,
    hflip_prob: float = 0.5,
    fill_rgb: Tuple[float, float, float] = (0.485, 0.456, 0.406),
    ignore_index: int = 255,
    impl: str = "matmul",  # 'matmul' (MXU, default) | 'gather' (VPU)
):
    """Fused random scale-crop-flip for a batch -> ((B,c,c,3) [0,1] float32,
    (B,c,c) int32 labels, (B,c,c) bool geometric-validity mask).  One XLA
    program, static shapes, no host work."""
    b = images_u8.shape[0]
    keys = jax.random.split(key, b)
    fn = partial(
        _weak_single,
        crop_size=crop_size,
        scale_min=scale_min,
        scale_max=scale_max,
        hflip_prob=hflip_prob,
        fill_rgb=fill_rgb,
        ignore_index=ignore_index,
        impl=impl,
    )
    return jax.vmap(fn)(images_u8, labels, sizes, keys)


# ---------------------------------------------------------------------------
# CutMix (rectangular, shared across image / pseudo-label / confidence mask)
# ---------------------------------------------------------------------------


def cutmix_boxes(key: jax.Array, batch: int, height: int, width: int):
    """Sample one rectangular mask per sample: area ratio ~ U(0,1) via the
    CutMix convention cut = sqrt(1 - lambda), centered uniformly, clipped to
    the frame.  Returns a (B, H, W) bool mask (True inside the box)."""
    klam, kcy, kcx = jax.random.split(key, 3)
    lam = jax.random.uniform(klam, (batch,))
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (ratio * height).astype(jnp.int32)
    cut_w = (ratio * width).astype(jnp.int32)
    cy = (jax.random.uniform(kcy, (batch,)) * height).astype(jnp.int32)
    cx = (jax.random.uniform(kcx, (batch,)) * width).astype(jnp.int32)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    y2 = jnp.clip(cy + cut_h // 2, 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    x2 = jnp.clip(cx + cut_w // 2, 0, width)
    yy = jax.lax.broadcasted_iota(jnp.int32, (batch, height, width), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (batch, height, width), 2)
    return (
        (yy >= y1[:, None, None])
        & (yy < y2[:, None, None])
        & (xx >= x1[:, None, None])
        & (xx < x2[:, None, None])
    )


def cutmix_batch(
    images: jnp.ndarray,  # (B, H, W, 3)
    labels: jnp.ndarray,  # (B, H, W) pseudo-labels (or gt)
    conf_mask: jnp.ndarray,  # (B, H, W) bool confidence mask
    key: jax.Array,
    prob: float = 1.0,
):
    """Mix each sample with its roll-by-1 partner inside a random box; the
    same box cuts the image, the pseudo-label map, and the confidence mask
    so supervision stays geometrically consistent (C4 / BASELINE.json:9)."""
    b, h, w = images.shape[:3]
    kbox, kapply = jax.random.split(key)
    box = cutmix_boxes(kbox, b, h, w)
    apply = jax.random.uniform(kapply, (b,)) < prob
    box = box & apply[:, None, None]
    mixed_img = jnp.where(box[..., None], jnp.roll(images, 1, axis=0), images)
    mixed_lab = jnp.where(box, jnp.roll(labels, 1, axis=0), labels)
    mixed_conf = jnp.where(box, jnp.roll(conf_mask, 1, axis=0), conf_mask)
    return mixed_img, mixed_lab, mixed_conf


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def normalize_images(
    images01: jnp.ndarray,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """[0,1] float -> ImageNet-normalized model dtype (bf16 by default)."""
    m = jnp.asarray(mean, dtype=jnp.float32)
    s = jnp.asarray(std, dtype=jnp.float32)
    return ((images01 - m) / s).astype(dtype)


def canvas_normalize_eval(
    images_u8: jnp.ndarray,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """uint8 canvas -> normalized dtype, the eval-path (no-aug) feed."""
    img = images_u8.astype(jnp.float32) * (1.0 / 255.0)
    return normalize_images(img, mean, std, dtype)
