"""Spatial partitioning (halo exchange) semantics on the fake CPU mesh:
H-sharded conv == global conv, exactly (SURVEY §2.3 stretch mechanism)."""

import jax
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


def test_halo_exchange_single_device_is_zero_pad():
    x = jnp.ones((1, 4, 4, 1))
    mesh = _mesh(1, 1)
    with mesh:
        out = spatial.halo_exchange_h(x, 1, "model", 1)
    assert out.shape == (1, 6, 4, 1)
    assert float(out[0, 0].sum()) == 0.0 and float(out[0, -1].sum()) == 0.0
