"""Gradient parity for the vectorized MaxPool(3,2,1) backward
(ops/pooling.py) against XLA's reduce_window VJP AND the torch oracle —
including tie-heavy inputs (post-ReLU zeros make window ties the common
case, and the routing must pick the same first-max element)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from semi_supervised_semantic_segmentation_tpu.ops import pooling


def _xla_pool(x):
    from flax import linen as nn

    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


def _grads(fn, x, co):
    return jax.grad(lambda x_: jnp.sum(fn(x_).astype(jnp.float32) * co))(x)


def _cases():
    rng = np.random.RandomState(0)
    smooth = rng.randn(2, 16, 24, 8).astype(np.float32)
    # quantized -> frequent exact ties inside windows
    tied = np.round(rng.randn(2, 16, 24, 8) * 2).astype(np.float32) / 2
    relu = np.maximum(rng.randn(2, 16, 24, 8), 0).astype(np.float32)
    return {"smooth": smooth, "tied": tied, "relu_zeros": relu}


@pytest.mark.parametrize("case", sorted(_cases()))
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bwd_matches_xla_select_and_scatter(case, dtype):
    xin = _cases()[case]
    x = jnp.asarray(xin).astype(dtype)
    rng = np.random.RandomState(1)
    # Dyadic-rational cotangents in a small range: positions overlapped by
    # several windows SUM their routed dy, and the two implementations
    # associate that sum differently (1-2 ulp with arbitrary floats) —
    # exact values make bitwise equality a pure ROUTING check.
    co = jnp.asarray(
        rng.randint(-16, 17, (2, 8, 12, 8)).astype(np.float32) / 4.0
    )

    y_fast = pooling.max_pool_3x3s2(x)
    y_ref = _xla_pool(x)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_ref))

    g_fast = _grads(pooling.max_pool_3x3s2, x, co)
    g_ref = _grads(_xla_pool, x, co)
    np.testing.assert_array_equal(
        np.asarray(g_fast, np.float32), np.asarray(g_ref, np.float32)
    )


@pytest.mark.parametrize("case", sorted(_cases()))
def test_bwd_matches_torch(case):
    xin = _cases()[case]
    x = jnp.asarray(xin)
    rng = np.random.RandomState(2)
    co_np = rng.randn(2, 8, 12, 8).astype(np.float32)

    g_fast = _grads(pooling.max_pool_3x3s2, x, jnp.asarray(co_np))

    xt = torch.tensor(xin.transpose(0, 3, 1, 2), requires_grad=True)
    yt = F.max_pool2d(xt, 3, 2, 1)
    yt.backward(torch.tensor(co_np.transpose(0, 3, 1, 2)))
    gt = xt.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(g_fast), gt, atol=1e-6)


def test_module_path_uses_fast_pool_and_matches(monkeypatch):
    """max_pool_same_as_torch routes even shapes through the custom VJP only
    under the SSTPU_POOL_BWD=vect opt-in (the vectorized backward measured
    slower whole-step, ops/pooling.py); outputs identical either way."""
    from semi_supervised_semantic_segmentation_tpu.models.layers import (
        max_pool_same_as_torch,
    )
    from semi_supervised_semantic_segmentation_tpu.ops import pooling

    rng = np.random.RandomState(3)
    x_even = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    x_odd = jnp.asarray(rng.randn(1, 15, 17, 4).astype(np.float32))
    assert not pooling.supported(x_even.shape)  # default: reduce_window
    monkeypatch.setenv("SSTPU_POOL_BWD", "vect")
    assert pooling.supported(x_even.shape)
    assert not pooling.supported(x_odd.shape)
    np.testing.assert_array_equal(
        np.asarray(max_pool_same_as_torch(x_even)),
        np.asarray(_xla_pool(x_even)),
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool_same_as_torch(x_odd)),
        np.asarray(_xla_pool(x_odd)),
    )
