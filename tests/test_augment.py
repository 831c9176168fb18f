"""On-device augmentation parity vs torch-CPU oracles (SURVEY.md §4.2
'Unit: aug parity'): exact geometry for crop/flip/CutMix, fp tolerance for
bilinear scaling and color ops, stdlib colorsys as the HSV oracle."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from hypothesis import given, settings
from hypothesis import strategies as st

from semi_supervised_semantic_segmentation_tpu.ops import augment


# ---------------------------------------------------------------------------
# Weak aug: fused scale-crop-flip vs resize->pad->crop->flip torch oracle
# ---------------------------------------------------------------------------


def _torch_scale_crop_flip(img_u8, label, s, oy, ox, flip, crop, fill, ignore):
    h, w = img_u8.shape[:2]
    sh, sw = max(int(round(h * s)), 1), max(int(round(w * s)), 1)
    imgf = torch.from_numpy(img_u8).float().permute(2, 0, 1)[None] / 255.0
    scaled = F.interpolate(imgf, (sh, sw), mode="bilinear", align_corners=False)
    lab = torch.from_numpy(label).float()[None, None]
    lab_s = F.interpolate(lab, (sh, sw), mode="nearest-exact")[0, 0].long()
    big_h, big_w = max(sh, oy + crop), max(sw, ox + crop)
    canvas = torch.empty(1, 3, big_h, big_w)
    canvas[0] = torch.tensor(fill)[:, None, None]
    canvas[:, :, :sh, :sw] = scaled
    lcanvas = torch.full((big_h, big_w), ignore, dtype=torch.long)
    lcanvas[:sh, :sw] = lab_s
    out = canvas[0, :, oy : oy + crop, ox : ox + crop].permute(1, 2, 0)
    lout = lcanvas[oy : oy + crop, ox : ox + crop]
    if flip:
        out = torch.flip(out, dims=[1])
        lout = torch.flip(lout, dims=[1])
    return out.numpy(), lout.numpy()


@pytest.mark.parametrize(
    "h,w,s,oy,ox,flip,crop",
    [
        (40, 56, 1.3, 5, 9, False, 32),  # downcrop from upscaled
        (40, 56, 0.5, 0, 0, True, 32),  # scaled smaller than crop -> padding
        (33, 47, 2.0, 20, 30, True, 32),
        (32, 32, 1.0, 0, 0, False, 32),  # identity geometry
    ],
)
def test_scale_crop_flip_matches_torch(h, w, s, oy, ox, flip, crop):
    rng = np.random.RandomState(0)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    lab = rng.randint(0, 5, (h, w)).astype(np.int32)
    fill = (0.485, 0.456, 0.406)
    ours_img, ours_lab, ours_valid = augment.scale_crop_flip_single(
        jnp.asarray(img),
        jnp.asarray(lab),
        jnp.asarray([h, w], dtype=jnp.int32),
        jnp.float32(s),
        jnp.float32(oy),
        jnp.float32(ox),
        jnp.asarray(flip),
        crop_size=crop,
        fill_rgb=fill,
        ignore_index=255,
    )
    ref_img, ref_lab = _torch_scale_crop_flip(img, lab, s, oy, ox, flip, crop, fill, 255)
    np.testing.assert_allclose(np.asarray(ours_img), ref_img, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ours_lab), ref_lab)
    # Geometric validity mask == the oracle's padding region (labels here are
    # in [0,5), so ignore in the oracle output marks exactly the padding).
    np.testing.assert_array_equal(np.asarray(ours_valid), ref_lab != 255)


@pytest.mark.parametrize(
    "h,w,s,oy,ox,flip,crop",
    [
        (40, 56, 1.3, 5, 9, False, 32),
        (40, 56, 0.5, 0, 0, True, 32),
        (33, 47, 2.0, 20, 30, True, 32),
        (32, 32, 1.0, 0, 0, False, 32),
    ],
)
def test_matmul_core_matches_gather_core(h, w, s, oy, ox, flip, crop):
    """The MXU (hat-weight matmul) formulation must agree with the two-tap
    gather formulation everywhere, including flip and padding regions."""
    rng = np.random.RandomState(7)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    lab = rng.randint(0, 5, (h, w)).astype(np.int32)
    kw = dict(crop_size=crop, fill_rgb=(0.485, 0.456, 0.406), ignore_index=255)
    args = (
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray([h, w], dtype=jnp.int32),
        jnp.float32(s), jnp.float32(oy), jnp.float32(ox), jnp.asarray(flip),
    )
    gi, gl, gv = augment.scale_crop_flip_single(*args, **kw)
    mi, ml, mv = augment.scale_crop_flip_single_matmul(*args, **kw)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(gi), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ml), np.asarray(gl))
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(gv))


@settings(max_examples=10, deadline=None)
@given(
    # Sizes drawn from a small fixed set so the jitted gather only compiles
    # for a handful of static shapes (keeps the property test fast).
    h=st.sampled_from([16, 32, 48]),
    w=st.sampled_from([16, 33, 48]),
    seed=st.integers(0, 2**31 - 1),
)
def test_weak_augment_invariants(h, w, seed):
    """Property: labels stay in {0..C-1, ignore}; images stay in [0,1]."""
    rng = np.random.RandomState(seed % 1000)
    img = (rng.rand(1, h, w, 3) * 255).astype(np.uint8)
    lab = rng.randint(0, 4, (1, h, w)).astype(np.int32)
    sizes = np.asarray([[h, w]], dtype=np.int32)
    out, olab, ovalid = augment.weak_augment_batch(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(sizes),
        jax.random.key(seed), crop_size=32,
    )
    olab = np.asarray(olab)
    ovalid = np.asarray(ovalid)
    assert out.shape == (1, 32, 32, 3) and olab.shape == (1, 32, 32)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    assert np.all((olab == 255) | ((olab >= 0) & (olab < 4)))
    # Outside the geometric content the label must be ignore (inputs here
    # have no in-content 255s, so the implication is exact both ways).
    np.testing.assert_array_equal(ovalid, olab != 255)


def test_weak_augment_deterministic_per_key():
    rng = np.random.RandomState(3)
    img = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    lab = rng.randint(0, 4, (2, 32, 32)).astype(np.int32)
    sizes = np.asarray([[32, 32]] * 2, dtype=np.int32)
    a = augment.weak_augment_batch(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(sizes), jax.random.key(7), crop_size=16
    )
    b = augment.weak_augment_batch(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(sizes), jax.random.key(7), crop_size=16
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


# ---------------------------------------------------------------------------
# Color ops vs torchvision formulas / stdlib colorsys
# ---------------------------------------------------------------------------


def test_adjust_brightness_formula():
    x = jnp.asarray(np.random.RandomState(0).rand(4, 4, 3).astype(np.float32))
    out = augment.adjust_brightness(x, 1.7)
    np.testing.assert_allclose(np.asarray(out), np.clip(np.asarray(x) * 1.7, 0, 1), atol=1e-6)


def test_adjust_contrast_formula():
    x = np.random.RandomState(1).rand(4, 4, 3).astype(np.float32)
    gray = x @ np.array([0.2989, 0.587, 0.114], dtype=np.float32)
    mean = gray.mean()
    expected = np.clip(0.5 * x + 0.5 * mean, 0, 1)
    out = augment.adjust_contrast(jnp.asarray(x), 0.5)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_adjust_saturation_formula():
    x = np.random.RandomState(2).rand(4, 4, 3).astype(np.float32)
    gray = (x @ np.array([0.2989, 0.587, 0.114], dtype=np.float32))[..., None]
    expected = np.clip(1.4 * x + (1 - 1.4) * gray, 0, 1)
    out = augment.adjust_saturation(jnp.asarray(x), 1.4)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_hsv_roundtrip_and_colorsys_parity():
    rng = np.random.RandomState(3)
    x = rng.rand(16, 3).astype(np.float32)
    hsv = np.asarray(augment.rgb_to_hsv(jnp.asarray(x)))
    back = np.asarray(augment.hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, x, atol=1e-5)
    for i in range(16):
        h, s, v = colorsys.rgb_to_hsv(*x[i])
        np.testing.assert_allclose(hsv[i], [h, s, v], atol=1e-5)


def test_adjust_hue_matches_colorsys():
    rng = np.random.RandomState(4)
    x = rng.rand(8, 3).astype(np.float32)
    delta = 0.13
    out = np.asarray(augment.adjust_hue(jnp.asarray(x[None]), delta))[0]
    for i in range(8):
        h, s, v = colorsys.rgb_to_hsv(*x[i])
        expected = colorsys.hsv_to_rgb((h + delta) % 1.0, s, v)
        np.testing.assert_allclose(out[i], expected, atol=1e-4)


def test_gaussian_blur_matches_numpy_oracle():
    rng = np.random.RandomState(5)
    x = rng.rand(1, 12, 12, 3).astype(np.float32)
    sigma, k = 1.2, 5
    r = k // 2
    t = np.arange(-r, r + 1)
    w = np.exp(-(t**2) / (2 * sigma**2))
    w /= w.sum()
    pad = np.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
    tmp = sum(pad[:, :, i : i + 12, :] * w[i] for i in range(k))
    pad = np.pad(tmp, ((0, 0), (r, r), (0, 0), (0, 0)), mode="reflect")
    expected = sum(pad[:, i : i + 12, :, :] * w[i] for i in range(k))
    out = augment.gaussian_blur(jnp.asarray(x), jnp.asarray([sigma]), k)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


# ---------------------------------------------------------------------------
# CutMix geometry
# ---------------------------------------------------------------------------


def test_cutmix_pixels_come_from_self_or_partner():
    rng = np.random.RandomState(6)
    img = rng.rand(4, 16, 16, 3).astype(np.float32)
    lab = rng.randint(0, 5, (4, 16, 16)).astype(np.int32)
    conf = rng.rand(4, 16, 16) > 0.5
    mi, ml, mc = augment.cutmix_batch(
        jnp.asarray(img), jnp.asarray(lab), jnp.asarray(conf), jax.random.key(0)
    )
    mi, ml, mc = np.asarray(mi), np.asarray(ml), np.asarray(mc)
    rimg, rlab, rconf = np.roll(img, 1, 0), np.roll(lab, 1, 0), np.roll(conf, 1, 0)
    from_self = (ml == lab) & (mc == conf) & np.all(mi == img, axis=-1)
    from_partner = (ml == rlab) & (mc == rconf) & np.all(mi == rimg, axis=-1)
    assert np.all(from_self | from_partner)
    # Image/label/conf share the same box: wherever the image came from the
    # partner (and differs from self), the label must too.
    img_from_partner = ~np.all(mi == img, axis=-1)
    assert np.all(ml[img_from_partner] == rlab[img_from_partner])


def test_cutmix_box_is_rectangle():
    b, h, w = 3, 24, 24
    box = np.asarray(augment.cutmix_boxes(jax.random.key(1), b, h, w))
    for i in range(b):
        ys, xs = np.where(box[i])
        if len(ys) == 0:
            continue
        assert len(ys) == (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)


def test_normalize_images():
    x = jnp.ones((1, 4, 4, 3), dtype=jnp.float32) * 0.5
    out = augment.normalize_images(x, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25), jnp.float32)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    assert augment.normalize_images(x, (0.5,) * 3, (0.25,) * 3).dtype == jnp.bfloat16
