"""Engine integration tests (SURVEY §4.2 'Integration' tier): every method's
jitted step runs and decreases its loss; checkpoint->resume restores
bit-identical state; per-step RNG streams are deterministic."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_semantic_segmentation_tpu.engine.checkpoint import CheckpointManager
from semi_supervised_semantic_segmentation_tpu.engine.evaluator import make_eval_step
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

from .helpers import synthetic_batch, tiny_cfg


def _setup(method_name: str, crop=64):
    cfg = tiny_cfg(method_name, crop=crop)
    model = build_model(cfg)
    method = get_method(method_name)
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=50)
    step = jax.jit(method.make_train_step(cfg, model, total_steps=50))
    return cfg, model, method, state, step


@pytest.mark.parametrize("method_name", ["supervised", "mean_teacher", "fixmatch_cutmix", "cps"])
@pytest.mark.slow
def test_step_runs_and_loss_finite(method_name):
    cfg, model, method, state, step = _setup(method_name)
    lab = synthetic_batch(4, cfg.data.crop_size, seed=0, labeled=True)
    unlab = synthetic_batch(4, cfg.data.crop_size, seed=1, labeled=False)
    if method.uses_unlabeled:
        state, metrics = step(state, lab, unlab)
    else:
        state, metrics = step(state, lab)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_cps_stacked_matches_separate_one_step():
    """`method.cps_impl: stacked` (vmapped dual nets -> one
    batch_group_count=2 conv per layer) is a pure execution-layout change:
    one full train step from identical init must produce the same losses
    and parameters as the `separate` two-forward formulation (tolerance =
    f32 conv reduction-order noise)."""
    results = {}
    for impl in ("stacked", "separate"):
        cfg = tiny_cfg("cps", crop=32, **{"method.cps_impl": impl})
        model = build_model(cfg)
        method = get_method("cps")
        state = method.init_state(cfg, model, jax.random.key(0), total_steps=50)
        step = jax.jit(method.make_train_step(cfg, model, total_steps=50))
        lab = synthetic_batch(4, 32, seed=0, labeled=True)
        unlab = synthetic_batch(4, 32, seed=1, labeled=False)
        state, metrics = step(state, lab, unlab)
        results[impl] = (state, metrics)
    for k in ("loss", "sup_loss", "cps_loss"):
        np.testing.assert_allclose(
            float(results["stacked"][1][k]),
            float(results["separate"][1][k]),
            rtol=1e-5,
            err_msg=k,
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4),
        results["stacked"][0].params,
        results["separate"][0].params,
    )


def test_supervised_loss_decreases():
    """On the learnable blob dataset the CE loss must fall markedly."""
    from semi_supervised_semantic_segmentation_tpu.data.datasets import SyntheticDataset
    from semi_supervised_semantic_segmentation_tpu.data.pipeline import Loader

    cfg, model, method, state, step = _setup("supervised")
    ds = SyntheticDataset(num_classes=4, size=8, image_hw=(64, 64), seed=0)
    batch = next(Loader(ds, 8, shuffle=False, num_workers=2).epoch(0))
    first = last = None
    for _ in range(25):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)


@pytest.mark.slow
def test_determinism_same_seed_same_losses():
    cfg, model, method, s1, step = _setup("fixmatch_cutmix")
    s2 = method.init_state(cfg, model, jax.random.key(0), total_steps=50)
    lab = synthetic_batch(4, cfg.data.crop_size, seed=0)
    unlab = synthetic_batch(4, cfg.data.crop_size, seed=1, labeled=False)
    t1, t2 = [], []
    for _ in range(3):
        s1, m1 = step(s1, lab, unlab)
        s2, m2 = step(s2, lab, unlab)
        t1.append(float(m1["loss"]))
        t2.append(float(m2["loss"]))
    assert t1 == t2


@pytest.mark.slow
def test_ema_moves_toward_student():
    cfg, model, method, state, step = _setup("mean_teacher")
    lab = synthetic_batch(4, cfg.data.crop_size, seed=0)
    unlab = synthetic_batch(4, cfg.data.crop_size, seed=1, labeled=False)
    p0 = jax.device_get(state.params)
    for _ in range(3):
        state, _ = step(state, lab, unlab)
    # EMA stays a convex combination: ema != student, ema != init.
    def dist(a, b):
        return float(
            sum(jnp.sum((x - y) ** 2) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
        )

    d_init_student = dist(p0, state.params)
    d_ema_student = dist(state.ema_params, state.params)
    d_ema_init = dist(state.ema_params, p0)
    assert d_init_student > 0
    assert d_ema_student < d_init_student  # teacher chased the student
    assert d_ema_init > 0  # but did move off the init


@pytest.mark.slow
def test_checkpoint_roundtrip_bit_identical(tmp_path):
    cfg, model, method, state, step = _setup("supervised")
    lab = synthetic_batch(4, cfg.data.crop_size, seed=0)
    state, _ = step(state, lab)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    host_state = jax.device_get(state)
    mgr.save(1, host_state, {"epoch": 0, "best_miou": 0.5})
    mgr.wait()
    restored, meta = mgr.restore(host_state)
    assert meta["epoch"] == 0 and meta["best_miou"] == 0.5
    for a, b in zip(jax.tree.leaves(host_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Training continues from the restored state identically.
    s_a, m_a = step(state, lab)
    s_b, m_b = step(restored, lab)
    assert float(m_a["loss"]) == float(m_b["loss"])


def test_restore_old_layout_checkpoint_fails_with_diagnosis(tmp_path):
    """A pre-round-2 (concat-layout) checkpoint must fail with an error that
    NAMES the layout break, not a raw Orbax tree mismatch (VERDICT r3 weak #5)."""
    old_tree = {
        "params": {
            "decoder": {
                "aspp": {"project": np.zeros((1, 1, 8, 4), np.float32)},
                "fuse1": {"kernel": np.zeros((3, 3, 8, 4), np.float32)},
            }
        },
        "step": np.int32(0),
    }
    mgr = CheckpointManager(str(tmp_path / "old"), async_save=False)
    mgr.save(1, old_tree, {"epoch": 0, "best_miou": 0.0})
    mgr.wait()
    new_template = {
        "params": {
            "decoder": {
                "aspp": {
                    "project0": np.zeros((1, 1, 8, 4), np.float32),
                    "project_pool": np.zeros((1, 1, 8, 4), np.float32),
                },
                "fuse1a": {"kernel": np.zeros((3, 3, 8, 4), np.float32)},
                "fuse1b": {"kernel": np.zeros((3, 3, 8, 4), np.float32)},
            }
        },
        "step": np.int32(0),
    }
    with pytest.raises(RuntimeError, match="PRE-ROUND-2"):
        mgr.restore(new_template)

    # An unrelated mismatch (not the known break) gets the generic diagnosis.
    mgr2 = CheckpointManager(str(tmp_path / "other"), async_save=False)
    mgr2.save(1, {"params": {"a": np.zeros(3, np.float32)}}, {"epoch": 0})
    mgr2.wait()
    with pytest.raises(RuntimeError, match="does not match"):
        mgr2.restore({"params": {"b": np.zeros(3, np.float32)}})


@pytest.mark.slow
def test_eval_step_confmat_shape_and_counts():
    cfg, model, method, state, step = _setup("supervised")
    eval_step = jax.jit(make_eval_step(cfg, model))
    batch = synthetic_batch(4, cfg.data.crop_size, seed=0)
    cm = np.asarray(eval_step(state.params, state.batch_stats, batch))
    assert cm.shape == (4, 4)
    assert cm.sum() == 4 * cfg.data.crop_size**2  # all pixels valid


@pytest.mark.slow
def test_fixmatch_pallas_cutmix_path_runs():
    """data.cutmix_impl=pallas routes the fixmatch step through the fused
    ops.pallas_aug kernel (interpret mode off-TPU); one step, finite loss,
    and the conf-mask metric stays a valid ratio."""
    cfg = tiny_cfg("fixmatch_cutmix", crop=64, **{"data.cutmix_impl": "pallas"})
    model = build_model(cfg)
    method = get_method("fixmatch_cutmix")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=50)
    step = jax.jit(method.make_train_step(cfg, model, total_steps=50))
    lab = synthetic_batch(2, 64, seed=0, labeled=True)
    unlab = synthetic_batch(2, 64, seed=1, labeled=False)
    state, metrics = step(state, lab, unlab)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["mask_ratio"]) <= 1.0
