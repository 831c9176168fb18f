"""Native C++ decode path (native/decoder.cpp via ctypes) vs PIL oracle.
PNG is lossless -> bit-identical; JPEG decode uses the same libjpeg build
as PIL -> bit-identical in practice (asserted exactly; both link system
libjpeg62)."""

import numpy as np
import pytest
from PIL import Image

from semi_supervised_semantic_segmentation_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


def test_png_image_decode_matches_pil(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    canvas = np.zeros((64, 64, 3), dtype=np.uint8)
    h, w = native_io.decode_image_into(p, canvas)
    assert (h, w) == (37, 53)
    np.testing.assert_array_equal(canvas[:37, :53], img)
    assert canvas[40:, :].sum() == 0  # rest untouched


def test_jpeg_decode_matches_pil(tmp_path):
    rng = np.random.RandomState(1)
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, quality=95)
    canvas = np.zeros((64, 64, 3), dtype=np.uint8)
    h, w = native_io.decode_image_into(p, canvas)
    assert (h, w) == (40, 40)
    pil = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(canvas[:40, :40], pil)


def test_palette_label_decode_reads_indices(tmp_path):
    """VOC labels are palette PNGs whose pixel values are class indices."""
    rng = np.random.RandomState(2)
    lab = rng.randint(0, 21, (30, 31)).astype(np.uint8)
    lab[0, :5] = 255
    im = Image.fromarray(lab, mode="P")
    im.putpalette([i for _ in range(256) for i in (0, 0, 0)][: 256 * 3])
    p = str(tmp_path / "lab.png")
    im.save(p)
    canvas = np.full((64, 64), 255, dtype=np.int32)
    h, w = native_io.decode_label_into(p, canvas)
    assert (h, w) == (30, 31)
    np.testing.assert_array_equal(canvas[:30, :31], lab.astype(np.int32))


def test_batch_decode_threads(tmp_path):
    rng = np.random.RandomState(3)
    paths, imgs = [], []
    for i in range(6):
        img = (rng.rand(20 + i, 25, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        imgs.append(img)
    canvases = np.zeros((6, 32, 32, 3), dtype=np.uint8)
    sizes = np.zeros((6, 2), dtype=np.int32)
    native_io.decode_batch(paths, canvases, sizes, threads=3)
    for i, img in enumerate(imgs):
        assert tuple(sizes[i]) == img.shape[:2]
        np.testing.assert_array_equal(canvases[i, : 20 + i, :25], img)


def test_larger_than_canvas_is_cropped(tmp_path):
    img = (np.random.RandomState(4).rand(50, 70, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "big.png")
    Image.fromarray(img).save(p)
    canvas = np.zeros((32, 32, 3), dtype=np.uint8)
    h, w = native_io.decode_image_into(p, canvas)
    assert (h, w) == (32, 32)
    np.testing.assert_array_equal(canvas, img[:32, :32])
