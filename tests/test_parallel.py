"""Data-parallel semantics on the fake 8-device CPU mesh (SURVEY §4.2
'Distributed (no cluster)'): the sharded step must equal the single-device
step on the gathered batch — the GSPMD psum IS DDP all-reduce + SyncBN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_semantic_segmentation_tpu.engine.evaluator import make_eval_step
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model
from semi_supervised_semantic_segmentation_tpu.ops import metrics as metrics_ops
from semi_supervised_semantic_segmentation_tpu.parallel import mesh as mesh_lib

from .helpers import synthetic_batch, tiny_cfg


def test_eight_cpu_devices_present():
    assert len(jax.devices()) == 8


def _max_param_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.slow
def test_dp_step_equals_single_device_step():
    cfg = tiny_cfg("supervised", crop=32)
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)
    step_fn = method.make_train_step(cfg, model, total_steps=10)
    batch = synthetic_batch(8, cfg.data.crop_size, seed=0)

    # Single device (default placement).
    s1 = jax.tree.map(jnp.copy, state)
    s1, m1 = jax.jit(step_fn)(s1, batch)

    # 8-device data-parallel: batch sharded, state replicated.
    mesh = mesh_lib.make_mesh()
    s8 = mesh_lib.replicate(jax.tree.map(jnp.copy, state), mesh)
    b8 = mesh_lib.shard_batch(batch, mesh)
    s8, m8 = jax.jit(step_fn)(s8, b8)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    assert _max_param_diff(s1.params, s8.params) < 1e-5
    # BN running stats must also match: GSPMD's stat reduction is global
    # (SyncBN semantics), same as the single-device batch computation.
    assert _max_param_diff(s1.batch_stats, s8.batch_stats) < 1e-5


def test_dp_eval_confmat_merge():
    cfg = tiny_cfg("supervised", crop=32)
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)
    eval_step = jax.jit(make_eval_step(cfg, model))
    batch = synthetic_batch(8, cfg.data.crop_size, seed=3)

    cm_single = np.asarray(eval_step(state.params, state.batch_stats, batch))

    mesh = mesh_lib.make_mesh()
    cm_sharded = np.asarray(
        eval_step(
            mesh_lib.replicate(state.params, mesh),
            mesh_lib.replicate(state.batch_stats, mesh),
            mesh_lib.shard_batch(batch, mesh),
        )
    )
    np.testing.assert_array_equal(cm_single, cm_sharded)


def test_mesh_shapes():
    mesh = mesh_lib.make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh4 = mesh_lib.make_mesh(data_parallel=4)
    assert mesh4.shape == {"data": 4, "model": 1}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(data_parallel=16)


@pytest.mark.slow
def test_ssl_step_runs_sharded():
    """FixMatch step (teacher + CutMix + student) compiles and runs under the
    8-device mesh with both batches sharded."""
    cfg = tiny_cfg("fixmatch_cutmix", crop=32)
    model = build_model(cfg)
    method = get_method("fixmatch_cutmix")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)
    step = jax.jit(method.make_train_step(cfg, model, total_steps=10))
    mesh = mesh_lib.make_mesh()
    s = mesh_lib.replicate(state, mesh)
    lab = mesh_lib.shard_batch(synthetic_batch(8, 32, seed=0), mesh)
    unlab = mesh_lib.shard_batch(synthetic_batch(8, 32, seed=1, labeled=False), mesh)
    s, m = step(s, lab, unlab)
    assert np.isfinite(float(m["loss"]))
    assert int(s.step) == 1
