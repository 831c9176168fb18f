"""Real-dataset plumbing tests against fabricated on-disk trees (SURVEY
C1/C5; VERDICT r1 item 5).

No real VOC/Cityscapes exists in this environment, so these tests fabricate
miniature directory trees with the exact reference layouts — VOC
JPEGImages/SegmentationClassAug/ImageSets + splits/, Cityscapes
leftImg8bit/gtFine incl. the labelIds-only fallback — and drive the full
path: id listing, split-file loading, ``build_dataset`` -> ``Loader`` batch
assembly (PIL and native C++ decode), one jitted train step, and one eval.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict
from semi_supervised_semantic_segmentation_tpu.data import native_io
from semi_supervised_semantic_segmentation_tpu.data.datasets import (
    CityscapesDataset,
    VOCDataset,
    _CITYSCAPES_ID_TO_TRAIN,
    build_dataset,
)
from semi_supervised_semantic_segmentation_tpu.data.pipeline import Loader
from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
    make_eval_step,
    run_eval,
)
from semi_supervised_semantic_segmentation_tpu.methods import supervised
from semi_supervised_semantic_segmentation_tpu.models.registry import build_model


# ---------------------------------------------------------------------------
# Tree fabricators
# ---------------------------------------------------------------------------

VOC_IDS = [f"2007_{i:06d}" for i in range(8)]
VOC_VAL_IDS = [f"2008_{i:06d}" for i in range(3)]
# Deliberately varied sizes (VOC images are <=500 px, non-square).
_VOC_SIZES = [(60, 80), (45, 37), (64, 64), (33, 90), (72, 41), (50, 50), (81, 62), (40, 44)]


def _write_voc_sample(root, sid, h, w, seed, with_label=True):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(root, "JPEGImages", sid + ".jpg"), quality=95)
    if with_label:
        lab = rng.randint(0, 21, (h, w)).astype(np.uint8)
        lab[: h // 8] = 255  # a real ignore region
        # VOC labels are palette PNGs whose class id IS the palette index.
        im = Image.fromarray(lab, mode="P")
        im.putpalette([c for i in range(256) for c in (i, i // 2, i % 7)])
        im.save(os.path.join(root, "SegmentationClassAug", sid + ".png"))


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    for d in ("JPEGImages", "SegmentationClassAug", "ImageSets/Segmentation",
              "splits/1_4"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    for sid, (h, w) in zip(VOC_IDS, _VOC_SIZES):
        _write_voc_sample(root, sid, h, w, seed=hash(sid) % 2**31)
    for i, sid in enumerate(VOC_VAL_IDS):
        _write_voc_sample(root, sid, 48 + i, 52, seed=9000 + i)
    # trainaug.txt in the reference's two-column style.
    with open(os.path.join(root, "ImageSets", "Segmentation", "trainaug.txt"), "w") as f:
        for sid in VOC_IDS:
            f.write(f"/JPEGImages/{sid}.jpg /SegmentationClassAug/{sid}.png\n")
    with open(os.path.join(root, "ImageSets", "Segmentation", "val.txt"), "w") as f:
        f.write("\n".join(VOC_VAL_IDS) + "\n")
    # Checked-in labeled split (reference parity path); unlabeled.txt absent
    # on purpose -> complement fallback must kick in.
    with open(os.path.join(root, "splits", "1_4", "labeled.txt"), "w") as f:
        f.write("\n".join(VOC_IDS[:2]) + "\n")
    return root


CITY_TRAIN = ["aachen/aachen_000000_000019", "aachen/aachen_000001_000019",
              "bochum/bochum_000000_000313", "bochum/bochum_000001_000313"]
CITY_VAL = ["frankfurt/frankfurt_000000_000294"]


def _write_city_sample(root, image_set, sid, h, w, seed, label_kind):
    city = sid.split("/")[0]
    img_dir = os.path.join(root, "leftImg8bit", image_set, city)
    gt_dir = os.path.join(root, "gtFine", image_set, city)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(
        os.path.join(root, "leftImg8bit", image_set, sid + "_leftImg8bit.png")
    )
    if label_kind == "trainids":
        lab = rng.randint(0, 19, (h, w)).astype(np.uint8)
        lab[:4] = 255
        Image.fromarray(lab, mode="L").save(
            os.path.join(root, "gtFine", image_set, sid + "_gtFine_labelTrainIds.png")
        )
    elif label_kind == "labelids":  # raw 0..33 ids -> fallback mapping path
        lab = rng.choice([0, 1, 7, 8, 11, 13, 26, 33], (h, w)).astype(np.uint8)
        Image.fromarray(lab, mode="L").save(
            os.path.join(root, "gtFine", image_set, sid + "_gtFine_labelIds.png")
        )


@pytest.fixture(scope="module")
def city_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cityscapes"))
    # aachen has labelTrainIds; bochum only labelIds (fallback coverage).
    for i, sid in enumerate(CITY_TRAIN):
        kind = "trainids" if sid.startswith("aachen") else "labelids"
        _write_city_sample(root, "train", sid, 90, 170, seed=100 + i, label_kind=kind)
    _write_city_sample(root, "val", CITY_VAL[0], 90, 170, seed=7, label_kind="trainids")
    return root


def _voc_cfg(root, **extra):
    raw = {
        "data": {"dataset": "voc", "data_root": root, "split": "1_4",
                 "num_classes": 21, "crop_size": 64, "num_workers": 2},
        "model": {"backbone": "resnet18", "decoder": "unet",
                  "output_stride": 32, "compute_dtype": "float32"},
        "method": {"name": "supervised"},
        "train": {"labeled_batch_size": 2, "unlabeled_batch_size": 2,
                  "eval_batch_size": 2, "work_dir": "/tmp/sstpu_voc_test"},
    }
    for dotted, v in extra.items():
        node = raw
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return config_from_dict(raw)


# ---------------------------------------------------------------------------
# VOC
# ---------------------------------------------------------------------------


def test_voc_list_ids_parses_trainaug_two_column_format(voc_root):
    assert VOCDataset.list_ids(voc_root, "train") == VOC_IDS
    assert VOCDataset.list_ids(voc_root, "val") == VOC_VAL_IDS


def test_voc_split_file_loading_and_complement_fallback(voc_root):
    cfg = _voc_cfg(voc_root)
    lab = build_dataset(cfg, "labeled")
    unlab = build_dataset(cfg, "unlabeled")
    assert lab.ids == VOC_IDS[:2]  # from splits/1_4/labeled.txt
    assert unlab.ids == VOC_IDS[2:]  # complement (no unlabeled.txt on disk)
    assert build_dataset(cfg, "val").ids == VOC_VAL_IDS


def test_voc_sample_decode_and_canvas_paste(voc_root):
    cfg = _voc_cfg(voc_root)
    ds = build_dataset(cfg, "labeled")
    s = ds.get(0)
    h, w = _VOC_SIZES[0]
    assert s.size == (h, w)
    assert s.image.shape == (h, w, 3) and s.label.shape == (h, w)
    assert s.label.max() == 255 and 0 <= s.label.min() < 21

    # Unlabeled datasets carry all-ignore labels.
    us = build_dataset(cfg, "unlabeled").get(0)
    assert (us.label == 255).all()

    loader = Loader(ds, batch_size=2, num_workers=2, shuffle=False)
    batch = next(loader.epoch(0))
    assert batch["image"].shape == (2, 512, 512, 3)
    assert batch["label"].shape == (2, 512, 512)
    np.testing.assert_array_equal(batch["size"][0], (h, w))
    np.testing.assert_array_equal(batch["image"][0, :h, :w], s.image)
    np.testing.assert_array_equal(batch["label"][0, :h, :w], s.label)
    # Outside the content: zero image, ignore labels.
    assert (batch["image"][0, h:] == 0).all() and (batch["label"][0, :, w:] == 255).all()


@pytest.mark.skipif(not native_io.available(), reason="native decoder not built")
def test_voc_native_decode_matches_pil(voc_root):
    cfg = _voc_cfg(voc_root)
    ds = build_dataset(cfg, "labeled")
    img_pil = np.zeros((512, 512, 3), np.uint8)
    lab_pil = np.full((512, 512), 255, np.int32)
    hw_pil = super(VOCDataset, ds).get_into(0, img_pil, lab_pil)
    img_nat = np.zeros((512, 512, 3), np.uint8)
    lab_nat = np.full((512, 512), 255, np.int32)
    hw_nat = ds.get_into(0, img_nat, lab_nat)  # native path when available
    assert hw_pil == hw_nat
    np.testing.assert_array_equal(img_pil, img_nat)
    np.testing.assert_array_equal(lab_pil, lab_nat)


@pytest.mark.slow
def test_voc_train_step_and_eval_end_to_end(voc_root):
    """Fabricated tree -> Loader -> one jitted supervised step -> one eval."""
    cfg = _voc_cfg(voc_root)
    model = build_model(cfg)
    state = supervised.init_state(cfg, model, jax.random.key(0), total_steps=10)
    step = jax.jit(supervised.make_train_step(cfg, model, total_steps=10))
    loader = Loader(build_dataset(cfg, "labeled"), batch_size=2, num_workers=2)
    batch = next(loader.epoch(0))
    state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items() if k != "index"})
    assert np.isfinite(float(m["loss"]))

    val_loader = Loader(build_dataset(cfg, "val"), batch_size=2, num_workers=2,
                        shuffle=False, drop_last=False, pad_mode="blank")
    eval_step = jax.jit(make_eval_step(cfg, model))
    iou, miou, acc = run_eval(eval_step, state.params, state.batch_stats, val_loader)
    assert iou.shape == (21,) and 0.0 <= miou <= 1.0 and 0.0 <= acc <= 1.0


# ---------------------------------------------------------------------------
# Cityscapes
# ---------------------------------------------------------------------------


def test_cityscapes_list_ids_and_split(city_root):
    assert CityscapesDataset.list_ids(city_root, "train") == CITY_TRAIN
    ds = CityscapesDataset(city_root, CITY_TRAIN)
    assert len(ds) == 4 and ds.canvas_hw == (1024, 2048)


def test_cityscapes_trainids_and_labelids_fallback(city_root):
    ds = CityscapesDataset(city_root, CITY_TRAIN)
    s_train = ds.get(0)  # aachen: labelTrainIds present
    assert s_train.size == (90, 170)
    assert ((s_train.label < 19) | (s_train.label == 255)).all()

    s_fallback = ds.get(2)  # bochum: labelIds only -> mapping applied
    raw = np.asarray(
        Image.open(os.path.join(city_root, "gtFine", "train",
                                CITY_TRAIN[2] + "_gtFine_labelIds.png")),
        dtype=np.int32,
    )
    np.testing.assert_array_equal(s_fallback.label, _CITYSCAPES_ID_TO_TRAIN[raw])
    # Spot the mapping: id 7 (road) -> 0, id 26 (car) -> 13, id 0/1 -> 255.
    assert _CITYSCAPES_ID_TO_TRAIN[7] == 0 and _CITYSCAPES_ID_TO_TRAIN[26] == 13
    assert _CITYSCAPES_ID_TO_TRAIN[0] == 255


@pytest.mark.skipif(not native_io.available(), reason="native decoder not built")
def test_cityscapes_native_fallback_decode_matches_pil(city_root):
    ds = CityscapesDataset(city_root, CITY_TRAIN)
    hc, wc = 128, 256  # small canvas keeps the test light; content is 90x170
    img_pil = np.zeros((hc, wc, 3), np.uint8)
    lab_pil = np.full((hc, wc), 255, np.int32)
    super(CityscapesDataset, ds).get_into(2, img_pil, lab_pil)
    img_nat = np.zeros((hc, wc, 3), np.uint8)
    lab_nat = np.full((hc, wc), 255, np.int32)
    ds.get_into(2, img_nat, lab_nat)
    np.testing.assert_array_equal(img_pil, img_nat)
    np.testing.assert_array_equal(lab_pil, lab_nat)


@pytest.mark.slow
def test_cityscapes_loader_and_train_step(city_root):
    raw = {
        "data": {"dataset": "cityscapes", "data_root": city_root, "split": "1_4",
                 "num_classes": 19, "crop_size": 64, "num_workers": 2},
        "model": {"backbone": "resnet18", "decoder": "unet",
                  "output_stride": 32, "compute_dtype": "float32"},
        "method": {"name": "supervised"},
        "train": {"labeled_batch_size": 1, "work_dir": "/tmp/sstpu_city_test"},
    }
    cfg = config_from_dict(raw)
    ds = build_dataset(cfg, "labeled")
    assert len(ds.ids) == 1  # 1/4 of 4 train ids via deterministic split
    loader = Loader(ds, batch_size=1, num_workers=2, shuffle=False)
    batch = next(loader.epoch(0))
    assert batch["image"].shape == (1, 1024, 2048, 3)
    np.testing.assert_array_equal(batch["size"][0], (90, 170))

    model = build_model(cfg)
    state = supervised.init_state(cfg, model, jax.random.key(0), total_steps=10)
    step = jax.jit(supervised.make_train_step(cfg, model, total_steps=10))
    state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items() if k != "index"})
    assert np.isfinite(float(m["loss"]))


# ---------------------------------------------------------------------------
# Gapped-blobs SSL fixture (VERDICT r1 item 10)
# ---------------------------------------------------------------------------


def test_gapped_synthetic_fixture_wiring():
    """synthetic_gapped=True: labeled appearance drawn from the narrow range,
    unlabeled/val from the full continuum; default stays the legacy corpus
    (bit-identical RNG stream — no appearance draw at range (0, 0))."""
    raw = {
        "data": {"dataset": "synthetic", "split": "1_16", "num_classes": 4,
                 "crop_size": 64, "synthetic_size": 16, "synthetic_gapped": True},
        "train": {"work_dir": "/tmp/sstpu_gap_test"},
    }
    cfg = config_from_dict(raw)
    assert build_dataset(cfg, "labeled").appearance_range == (0.0, 0.25)
    assert build_dataset(cfg, "unlabeled").appearance_range == (0.0, 1.0)
    assert build_dataset(cfg, "val").appearance_range == (0.0, 1.0)

    raw["data"]["synthetic_gapped"] = False
    cfg0 = config_from_dict(raw)
    ds0 = build_dataset(cfg0, "labeled")
    assert ds0.appearance_range == (0.0, 0.0)
    # Full-range blobs differ from legacy ones for the same (seed, index).
    ds_full = build_dataset(cfg, "unlabeled")
    legacy = build_dataset(cfg0, "unlabeled")
    assert not np.array_equal(ds_full.get(0).image, legacy.get(0).image)
    # Labels (geometry) are unaffected by the appearance rotation.
    lab_ds = build_dataset(cfg, "labeled")
    leg_lab = build_dataset(cfg0, "labeled")
    np.testing.assert_array_equal(lab_ds.get(0).label, leg_lab.get(0).label)
