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


@pytest.mark.slow
def test_staged_tta_eval_sharded_equals_unsharded():
    """The production eval path (staged per-scale TTA: sliding windows +
    flip + multi-scale, `make_staged_eval_step`) under the 8-device data
    mesh must produce the SAME confusion matrix as unsharded — the train
    step and fused confmat merge are already pinned above; this pins the
    user-facing eval.py route (VERDICT r4 item 7)."""
    from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
        make_staged_eval_step,
        use_staged,
    )

    cfg = tiny_cfg(
        "supervised", crop=32,
        **{
            "data.eval_mode": "sliding",
            "data.eval_stride": 24,
            "data.eval_flip": True,
            "data.eval_scales": [0.75, 1.0, 1.5],
        },
    )
    assert use_staged(cfg)  # this IS the route eval.py takes for config 4/5
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(4), 10)
    rng = np.random.RandomState(9)
    batch = {
        "image": (rng.rand(8, 48, 96, 3) * 255).astype(np.uint8),
        "label": rng.randint(0, 4, (8, 48, 96)).astype(np.int32),
        "size": np.tile(np.asarray([[48, 96]], np.int32), (8, 1)),
    }

    eval_step = make_staged_eval_step(cfg, model)
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
    assert cm_sharded.sum() == 8 * 48 * 96


def test_pallas_conv_shard_map_equals_unsharded():
    """conv3x3_bn_nchw under a data>1 mesh runs per-shard via shard_map
    (GSPMD cannot partition the opaque custom call) with the BN sums
    psummed — outputs, stats, AND all four gradients must equal the
    unsharded op.  SyncBN semantics of the fused branch path under DP."""
    from semi_supervised_semantic_segmentation_tpu.ops.pallas_conv import (
        conv3x3_bn_nchw,
    )

    rng = np.random.RandomState(11)
    c = 8
    x = jnp.asarray(rng.randn(8, c, 64, 16).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.1
    mul = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    add = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    co = jnp.asarray(rng.randn(8, c, 64, 16).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(2, c).astype(np.float32) * 0.1)

    mesh = mesh_lib.make_mesh()
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None, None, None)))

    def loss(fn, x, k, mul, add):
        y, s = fn(x, k, mul, add)
        return (jnp.vdot(y.astype(jnp.float32), co.astype(jnp.float32))
                + jnp.vdot(s, w))

    ref_f = lambda *a: conv3x3_bn_nchw(*a, interpret=True)
    sh_f = lambda *a: conv3x3_bn_nchw(*a, interpret=True, mesh=mesh)

    y0, s0 = jax.jit(ref_f)(x, k, mul, add)
    y1, s1 = jax.jit(sh_f)(xs, k, mul, add)
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-3)

    g0 = jax.jit(jax.grad(lambda *a: loss(ref_f, *a), (0, 1, 2, 3)))(
        x, k, mul, add)
    g1 = jax.jit(jax.grad(lambda *a: loss(sh_f, *a), (0, 1, 2, 3)))(
        xs, k, mul, add)
    for name, a, b in zip(("dx", "dk", "dmul", "dadd"), g1, g0):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.max(np.abs(a32 - b32)) / (np.max(np.abs(b32)) + 1e-6)
        assert rel < 1e-3, f"{name}: max-rel {rel}"


def test_hrmodule_pallas_dp_mesh_equals_unsharded():
    """HRModule with dp_mesh set (the multi-chip pallas path): sharded
    train-mode apply == unsharded apply, including the BatchNorm batch
    stats that now come from psummed kernel sums."""
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRModule

    rng = np.random.RandomState(12)
    xs = [
        jnp.asarray(rng.randn(8, 64, 16, 8).astype(np.float32), jnp.bfloat16),
        jnp.asarray(rng.randn(8, 32, 8, 16).astype(np.float32), jnp.bfloat16),
    ]
    mesh = mesh_lib.make_mesh()
    mod0 = HRModule(channels=(8, 16), num_blocks=2, branch_conv="pallas")
    mod1 = HRModule(channels=(8, 16), num_blocks=2, branch_conv="pallas",
                    dp_mesh=mesh)
    v = mod0.init(jax.random.PRNGKey(0), xs, True)
    out0, var0 = mod0.apply(v, xs, True, mutable=["batch_stats"])
    xsh = [
        jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None, None, None)))
        for x in xs
    ]
    out1, var1 = jax.jit(
        lambda v, xs: mod1.apply(v, xs, True, mutable=["batch_stats"])
    )(v, xsh)
    for a, b in zip(out1, out0):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-2, atol=1e-2)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(var1["batch_stats"]),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(var0["batch_stats"]),
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=str(pa))


def test_pallas_stem_shard_map_equals_unsharded():
    """stem_conv_bn_s2 under a data>1 mesh runs per-shard via shard_map
    with the [2, Co] BN sums psummed — outputs, stats, and the weight
    gradient must equal the unsharded op (ADVICE r4: the pallas stem must
    not force replication under DP)."""
    from semi_supervised_semantic_segmentation_tpu.ops import pallas_stem

    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.rand(8, 64, 256, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray((rng.rand(7, 7, 3, 64).astype(np.float32) - 0.5) * 0.2)
    co = jnp.asarray(rng.randn(8, 64, 32, 128).astype(np.float32))
    cs = jnp.asarray(rng.randn(2, 64).astype(np.float32) * 0.1)

    mesh = mesh_lib.make_mesh()
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None, None, None)))

    ref_f = lambda x_, w_: pallas_stem.stem_conv_bn_s2(x_, w_, True)
    sh_f = lambda x_, w_: pallas_stem.stem_conv_bn_s2(x_, w_, True, mesh)

    y0, s0 = jax.jit(ref_f)(x, w)
    y1, s1 = jax.jit(sh_f)(xs, w)
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-3)

    def loss(fn, x_, w_):
        y, s = fn(x_, w_)
        return jnp.vdot(y.astype(jnp.float32), co) + jnp.vdot(s, cs)

    g0 = jax.jit(jax.grad(lambda w_: loss(ref_f, x, w_)))(w)
    g1 = jax.jit(jax.grad(lambda w_: loss(sh_f, xs, w_)))(w)
    a32, b32 = np.asarray(g1, np.float32), np.asarray(g0, np.float32)
    rel = np.max(np.abs(a32 - b32)) / (np.max(np.abs(b32)) + 1e-6)
    assert rel < 1e-3, f"dW max-rel {rel}"
