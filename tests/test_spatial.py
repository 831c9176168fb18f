"""Spatial partitioning (halo exchange) semantics on the fake CPU mesh:
H-sharded conv == global conv, exactly (SURVEY §2.3 stretch mechanism)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semi_supervised_semantic_segmentation_tpu.parallel import spatial


def _mesh(data, model):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def _global_conv(x, kernel):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME", dimension_numbers=dn)


def test_spatial_conv_matches_global_8way():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    expected = _global_conv(x, k)

    mesh = _mesh(1, 8)  # H sharded 8-way
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model", None, None)))
    out = spatial.spatially_sharded_call(
        lambda xl, ax, n: spatial.spatial_conv2d_same(xl, k, ax, n), mesh, xs
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_spatial_conv_with_data_and_model_axes():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 3, 4, 6).astype(np.float32))  # 5-row halo=2
    expected = _global_conv(x, k)

    mesh = _mesh(2, 4)  # N on data, H 4-way
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model", None, None)))
    out = spatial.spatially_sharded_call(
        lambda xl, ax, n: spatial.spatial_conv2d_same(xl, k, ax, n), mesh, xs
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_conv_stack_composes():
    """Two chained haloed convs == two chained global convs."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 40, 8, 3).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))
    k2 = jnp.asarray(rng.randn(3, 3, 8, 2).astype(np.float32))
    expected = _global_conv(jax.nn.relu(_global_conv(x, k1)), k2)

    mesh = _mesh(1, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model", None, None)))

    def stack(xl, ax, n):
        h = jax.nn.relu(spatial.spatial_conv2d_same(xl, k1, ax, n))
        return spatial.spatial_conv2d_same(h, k2, ax, n)

    out = spatial.spatially_sharded_call(stack, mesh, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_stride2_spatial_conv_matches_global():
    """Torch-pad (1,1) 3x3 stride-2 conv, H-sharded == global (the stem
    shape wired by models/layers.py::SpatialConv)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    expected = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn
    )

    mesh = _mesh(2, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model", None, None)))
    out = spatial.spatially_sharded_call(
        lambda xl, ax, n: spatial.spatial_conv2d_stride2(xl, k, ax, n), mesh, xs
    )
    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_spatial_stem_hrnet_matches_plain():
    """A tiny HRNet with the H-sharded stem (spatial_mesh set) computes the
    same forward as the plain stem with identical params — the end-to-end
    wiring of the spatial escape hatch (VERDICT r2 item 7)."""
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNet

    mesh = _mesh(2, 4)
    kw = dict(width=8, stage_modules=(1, 1, 1), dtype=jnp.float32)
    plain = HRNet(**kw)
    sharded = HRNet(spatial_mesh=mesh, **kw)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = plain.init({"params": jax.random.key(0)}, x[:1], train=False)
    out_p = plain.apply(variables, x, train=False)
    out_s = sharded.apply(variables, x, train=False)
    for k in out_p:
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_p[k]), atol=2e-5,
            err_msg=f"tap {k}",
        )


@pytest.mark.slow
def test_spatial_train_step_runs_on_2d_mesh():
    """Full fixmatch train step with backbone hrnet_w48 and
    parallel.model_parallel=2 on a (4 data, 2 model) fake mesh: compiles,
    runs, finite loss — the opt-in config-5 spatial variant."""
    import jax.numpy as jnp_

    from semi_supervised_semantic_segmentation_tpu.methods import get_method
    from semi_supervised_semantic_segmentation_tpu.models import build_model
    from semi_supervised_semantic_segmentation_tpu.parallel import mesh as mesh_lib

    from .helpers import synthetic_batch, tiny_cfg

    cfg = tiny_cfg(
        "fixmatch_cutmix",
        crop=64,
        **{
            "model.backbone": "hrnet_w48",
            "model.decoder": "hrnet_head",
            "model.output_stride": 32,
            "parallel.model_parallel": 2,
            "parallel.data_parallel": 4,
            "train.labeled_batch_size": 4,
            "train.unlabeled_batch_size": 4,
        },
    )
    mesh = mesh_lib.make_mesh(4, 2)
    model = build_model(cfg, mesh=mesh)
    assert model.spatial_mesh is mesh
    method = get_method("fixmatch_cutmix")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)
    state = mesh_lib.replicate(state, mesh)
    step = jax.jit(method.make_train_step(cfg, model, 10), donate_argnums=0)
    lab = mesh_lib.shard_batch(
        {k: jnp_.asarray(v) for k, v in synthetic_batch(4, 64, labeled=True).items()},
        mesh,
    )
    unlab = mesh_lib.shard_batch(
        {k: jnp_.asarray(v) for k, v in synthetic_batch(4, 64, labeled=False, seed=1).items()},
        mesh,
    )
    state, metrics = step(state, lab, unlab)
    assert np.isfinite(float(metrics["loss"]))


def test_halo_exchange_single_device_is_zero_pad():
    x = jnp.ones((1, 4, 4, 1))
    mesh = _mesh(1, 1)
    with mesh:
        out = spatial.halo_exchange_h(x, 1, "model", 1)
    assert out.shape == (1, 6, 4, 1)
    assert float(out[0, 0].sum()) == 0.0 and float(out[0, -1].sum()) == 0.0
