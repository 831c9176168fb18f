"""Config system tests: YAML loading, flat reference-style aliases,
validation, overrides, and the five checked-in experiment configs."""

import glob
import os

import pytest

from semi_supervised_semantic_segmentation_tpu.config import (
    config_from_dict,
    load_config,
    save_config,
    update_config,
)

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_all_checked_in_configs_load():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
    assert len(paths) == 5
    names = set()
    for p in paths:
        cfg = load_config(p)
        names.add(cfg.name)
    assert len(names) == 5


def test_flat_reference_aliases():
    cfg = config_from_dict(
        {
            "dataset": "voc",
            "backbone": "resnet50",
            "decoder": "deeplabv3plus",
            "method": "fixmatch_cutmix",
            "lr": 0.004,
            "batch_size": 16,
            "crop_size": 512,
            "ema_decay": 0.999,
            "confidence_threshold": 0.9,
            "epochs": 10,
        }
    )
    assert cfg.data.dataset == "voc"
    assert cfg.model.backbone == "resnet50"
    assert cfg.method.name == "fixmatch_cutmix"
    assert cfg.optim.lr == 0.004
    assert cfg.train.labeled_batch_size == 16
    assert cfg.method.ema_alpha == 0.999
    assert cfg.method.conf_thresh == 0.9


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="Unknown config key"):
        config_from_dict({"bogus_key": 1})
    with pytest.raises(ValueError, match="Unknown config keys"):
        config_from_dict({"data": {"bogus": 1}})


def test_invalid_enum_rejected():
    with pytest.raises(ValueError, match="method.name"):
        config_from_dict({"method": {"name": "nope"}})
    with pytest.raises(ValueError, match="crop_size"):
        config_from_dict({"data": {"crop_size": 100}})


def test_update_config_dotted():
    cfg = config_from_dict({})
    cfg2 = update_config(cfg, {"optim.lr": 0.5, "train.epochs": 3})
    assert cfg2.optim.lr == 0.5 and cfg2.train.epochs == 3
    assert cfg.optim.lr != 0.5  # original untouched (frozen)


def test_save_load_roundtrip(tmp_path):
    cfg = config_from_dict({"method": {"name": "cps", "cps_weight": 2.0}})
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.method.name == "cps" and cfg2.method.cps_weight == 2.0
    assert cfg2.to_dict() == cfg.to_dict()
