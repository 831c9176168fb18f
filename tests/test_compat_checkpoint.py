"""Reference-layout (torch.save) checkpoint export/import roundtrip
(C19 'same checkpoint format' contract, SURVEY §3.4)."""

import jax
import numpy as np
import pytest

from semi_supervised_semantic_segmentation_tpu.engine import compat
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

from .helpers import tiny_cfg


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


@pytest.mark.parametrize(
    "method_name",
    ["fixmatch_cutmix", pytest.param("cps", marks=pytest.mark.slow)],
)
def test_reference_checkpoint_roundtrip(method_name, tmp_path):
    cfg = tiny_cfg(method_name, crop=32)
    model = build_model(cfg)
    method = get_method(method_name)
    state = method.init_state(cfg, model, jax.random.key(1), total_steps=10)
    path = str(tmp_path / "ref_ckpt.pth")
    compat.export_reference_checkpoint(path, state, {"epoch": 3, "best_miou": 0.42})

    # Import into a differently-initialized state: params must become equal.
    other = method.init_state(cfg, model, jax.random.key(2), total_steps=10)
    restored = compat.import_reference_checkpoint(path, other)
    _trees_equal(state.params, restored.params)
    _trees_equal(state.batch_stats, restored.batch_stats)
    if state.ema_params is not None:
        _trees_equal(state.ema_params, restored.ema_params)
        _trees_equal(state.ema_batch_stats, restored.ema_batch_stats)


@pytest.mark.parametrize(
    "method_name",
    ["supervised", pytest.param("cps", marks=pytest.mark.slow)],
)
def test_optimizer_momentum_roundtrip(method_name, tmp_path):
    """SURVEY §3.4 state_dict(opt) contract: exported momentum buffers
    import back bit-for-bit, and import -> one step equals native state ->
    one step exactly (same params trajectory, no momentum restart)."""
    import jax.numpy as jnp

    from semi_supervised_semantic_segmentation_tpu.engine.state import (
        get_momentum_trees,
    )

    from .helpers import synthetic_batch

    cfg = tiny_cfg(method_name, crop=32)
    model = build_model(cfg)
    method = get_method(method_name)
    state = method.init_state(cfg, model, jax.random.key(1), total_steps=20)
    step_fn = jax.jit(method.make_train_step(cfg, model, 20))
    lab = {k: jnp.asarray(v) for k, v in synthetic_batch(4, 32, labeled=True).items()}
    unlab = {k: jnp.asarray(v) for k, v in synthetic_batch(4, 32, labeled=False, seed=1).items()}
    args = (lab, unlab) if method.uses_unlabeled else (lab,)
    for _ in range(3):
        state, _ = step_fn(state, *args)

    path = str(tmp_path / "opt_ckpt.pth")
    compat.export_reference_checkpoint(path, state, {"epoch": 0, "best_miou": 0.0}, cfg=cfg)

    other = method.init_state(cfg, model, jax.random.key(2), total_steps=20)
    restored = compat.import_reference_checkpoint(path, other)
    # Momentum buffers bit-identical (MaskedNode sentinels have no leaves,
    # so tree.leaves compares exactly the live buffers).
    for a, b in zip(
        jax.tree.leaves(get_momentum_trees(state.opt_state)),
        jax.tree.leaves(get_momentum_trees(restored.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The reference format carries no RNG; align it so the aug stream (not
    # the optimizer) is identical for the one-step comparison.
    restored = restored.replace(rng=state.rng)
    s_native, _ = step_fn(state, *args)
    s_import, _ = step_fn(restored, *args)
    for a, b in zip(jax.tree.leaves(s_native.params), jax.tree.leaves(s_import.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_dict_layout_matches_reference(tmp_path):
    """The file must contain the reference's keys: model, ema_model (or
    model2), epoch, best_miou."""
    import torch

    cfg = tiny_cfg("mean_teacher", crop=32)
    model = build_model(cfg)
    method = get_method("mean_teacher")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)
    path = str(tmp_path / "ckpt.pth")
    compat.export_reference_checkpoint(path, state, {"epoch": 1, "best_miou": 0.1})
    obj = torch.load(path, map_location="cpu", weights_only=True)
    assert {"model", "ema_model", "epoch", "best_miou"} <= set(obj)
    # Conv weights are torch-layout (O, I, H, W).
    w = obj["model"]["encoder.stem.Conv_0.weight"]
    assert w.shape == (64, 3, 7, 7)
    # BN stats present.
    assert "encoder.stem.Norm_0.BatchNorm_0.running_mean" in obj["model"]
