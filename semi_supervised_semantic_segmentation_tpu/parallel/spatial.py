"""Spatial (H-axis) activation partitioning with halo exchange — the
designed-for escape hatch of SURVEY §2.3/§5: if 1024² HRNet activations
ever outgrow HBM, shard the *height* dimension of activations over the
reserved 'model' mesh axis and exchange conv halos over ICI.

This module provides the mechanism (not wired into the trainers by
default — batch-DP is the reference's only strategy and fits HBM today):

  - ``halo_exchange_h``: ring-neighbor exchange of boundary rows via
    ``lax.ppermute`` (edge devices receive zeros == global zero padding).
  - ``spatial_conv2d_same``: a SAME conv over an H-sharded activation that
    is numerically identical to the unsharded conv.
  - ``spatially_sharded_call``: runs a stride-1 conv stack under
    ``shard_map`` with N on 'data' and H on 'model'.

The semantic contract is tested on the fake 8-device CPU mesh
(tests/test_spatial.py): sharded == unsharded, bit-for-bit in f32.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 top-level API; fall back for older versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_exchange_h(x: jnp.ndarray, halo: int, axis_name: str, axis_size: int) -> jnp.ndarray:
    """Exchange ``halo`` boundary rows with ring neighbors along sharded H.

    x: (N, H_local, W, C).  Returns (N, H_local + 2*halo, W, C); the first /
    last device's missing halo arrives as zeros (ppermute semantics), which
    equals the zero padding of a global SAME convolution.
    """
    if axis_size == 1:
        pad = [(0, 0), (halo, halo), (0, 0), (0, 0)]
        return jnp.pad(x, pad)
    top_rows = x[:, :halo]
    bot_rows = x[:, -halo:]
    # My bottom rows become the NEXT device's top halo.
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(axis_size - 1)]
    )
    # My top rows become the PREVIOUS device's bottom halo.
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(axis_size - 1)]
    )
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def spatial_conv2d_same(
    x: jnp.ndarray,
    kernel: jnp.ndarray,  # (kh, kw, Cin, Cout), odd kh/kw, stride 1
    axis_name: str,
    axis_size: int,
) -> jnp.ndarray:
    """SAME stride-1 conv on an H-sharded activation == global SAME conv."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    halo = kh // 2
    xp = halo_exchange_h(x, halo, axis_name, axis_size) if halo else x
    dn = jax.lax.conv_dimension_numbers(xp.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, kernel, (1, 1),
        padding=[(0, 0), (kw // 2, kw // 2)],  # H already haloed; SAME in W
        dimension_numbers=dn,
    )


def halo_pull_prev_h(x: jnp.ndarray, rows: int, axis_name: str, axis_size: int) -> jnp.ndarray:
    """Prepend ``rows`` boundary rows pulled from the PREVIOUS device along
    sharded H (device 0 receives zeros == global top zero padding).
    Returns (N, H_local + rows, W, C)."""
    if axis_size == 1:
        return jnp.pad(x, [(0, 0), (rows, 0), (0, 0), (0, 0)])
    from_prev = jax.lax.ppermute(
        x[:, -rows:], axis_name, [(i, i + 1) for i in range(axis_size - 1)]
    )
    return jnp.concatenate([from_prev, x], axis=1)


def spatial_conv2d_stride2(
    x: jnp.ndarray,
    kernel: jnp.ndarray,  # (3, kw, Cin, Cout)
    axis_name: str,
    axis_size: int,
) -> jnp.ndarray:
    """3xkw stride-2 conv with torch-style (1, 1) padding on an H-sharded
    activation — numerically identical to the global conv (the HRNet/ResNet
    stem shape).  With pad (1,1), k=3, s=2 and even local H, output row o of
    shard d reads global rows 2o-1..2o+1, so each shard needs exactly ONE
    top halo row from its predecessor and no bottom halo."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh != 3:
        raise ValueError(f"stride-2 spatial conv expects kh=3, got {kh}")
    if x.shape[1] % 2 != 0:
        raise ValueError("local H must be even for stride-2 spatial conv")
    xp = halo_pull_prev_h(x, 1, axis_name, axis_size)
    dn = jax.lax.conv_dimension_numbers(xp.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, kernel, (2, 2),
        padding=[(0, 0), ((kw - 1) // 2, (kw - 1) // 2)],
        dimension_numbers=dn,
    )


def spatially_sharded_call(
    fn: Callable,  # fn(x_local, axis_name, axis_size) -> y_local
    mesh: Mesh,
    x: jnp.ndarray,
    spatial_axis: str = "model",
):
    """Run ``fn`` under shard_map with N sharded on 'data' and H on
    ``spatial_axis``; returns the same sharding."""
    axis_size = mesh.shape[spatial_axis]
    spec = P("data", spatial_axis, None, None)

    def local(xl):
        return fn(xl, spatial_axis, axis_size)

    return shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
