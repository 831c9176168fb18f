"""Parity tests for the im2col-stacked pallas stem conv (ops/pallas_stem.py).

Interpret mode on the CPU test backend; the on-TPU path is the same kernel
code compiled by Mosaic (TPU equality is covered by the smoke/bench runs).
Rebuild of the reference's cuDNN stem conv surface (SURVEY.md N1, C7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_semantic_segmentation_tpu.ops import pallas_stem


def _xla_conv(x, w, k):
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("k,h,w", [(7, 64, 256), (3, 64, 256), (7, 128, 512)])
def test_stem_fwd_matches_xla(k, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32)).astype(jnp.bfloat16)
    wt = jnp.asarray((rng.rand(k, k, 3, 64).astype(np.float32) - 0.5) * 0.2)
    assert pallas_stem.supported(x.shape, (k, k), (2, 2))
    yp = pallas_stem.stem_conv_s2(x, wt, True).astype(jnp.float32)
    yx = _xla_conv(x, wt, k).astype(jnp.float32)
    assert yp.shape == yx.shape == (2, h // 2, w // 2, 64)
    # bf16 accumulation-order spread only
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), atol=8e-3)


def test_stem_dw_matches_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 64, 256, 3).astype(np.float32)).astype(jnp.bfloat16)
    wt = jnp.asarray((rng.rand(7, 7, 3, 64).astype(np.float32) - 0.5) * 0.2)

    def loss(fn):
        return lambda w_: jnp.sum(fn(w_).astype(jnp.float32) ** 2)

    gp = jax.grad(loss(lambda w_: pallas_stem.stem_conv_s2(x, w_, True)))(wt)
    gx = jax.grad(loss(lambda w_: _xla_conv(x, w_, 7)))(wt)
    assert gp.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=5e-3 * scale)


def test_stem_x_cotangent_is_zero():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 64, 256, 3).astype(np.float32)).astype(jnp.bfloat16)
    wt = jnp.asarray(rng.rand(7, 7, 3, 64).astype(np.float32))
    dx = jax.grad(
        lambda x_: jnp.sum(pallas_stem.stem_conv_s2(x_, wt, True).astype(jnp.float32))
    )(x)
    assert dx.shape == x.shape
    assert float(jnp.max(jnp.abs(dx.astype(jnp.float32)))) == 0.0


def test_supported_gates_shapes():
    assert not pallas_stem.supported((2, 64, 128, 3), (7, 7), (2, 2))  # w2=64
    assert not pallas_stem.supported((2, 62, 256, 3), (7, 7), (2, 2))  # odd H
    assert not pallas_stem.supported((2, 64, 256, 4), (7, 7), (2, 2))  # Cin
    assert not pallas_stem.supported((2, 64, 256, 3), (7, 7), (1, 1))  # stride


def test_module_pallas_equals_conv():
    """ResNet stem path: ConvNormAct(pallas_stem) == plain conv, same params."""
    from semi_supervised_semantic_segmentation_tpu.models.layers import ConvNormAct

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 256, 3).astype(np.float32))
    ref = ConvNormAct(64, (7, 7), strides=(2, 2))
    pal = ConvNormAct(64, (7, 7), strides=(2, 2), pallas_stem=True)
    vars_ = ref.init({"params": jax.random.key(0)}, x, False)
    yr = ref.apply(vars_, x, False)
    yp = pal.apply(vars_, x, False)
    np.testing.assert_allclose(
        np.asarray(yp, np.float32), np.asarray(yr, np.float32), atol=2e-2
    )


def test_stem_segment_equals_plain_path():
    """PallasStemSegment (NCHW kernel + folded BN + NCHW maxpool) == the
    plain ConvNormAct+maxpool stem: outputs, c1 tap, and BN batch_stats."""
    from semi_supervised_semantic_segmentation_tpu.models.layers import (
        ConvNormAct, PallasStemSegment, max_pool_same_as_torch)

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 64, 256, 3).astype(np.float32))
    seg = PallasStemSegment(64, (7, 7))
    vars_ = seg.init({"params": jax.random.key(0)}, x, False)

    def plain(v, x, train):
        cna = ConvNormAct(64, (7, 7), strides=(2, 2))
        y, st = cna.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            x, train, mutable=["batch_stats"])
        return max_pool_same_as_torch(y), y, st

    (pp, pc1, pst) = plain(vars_, x, True)
    (sp_, sc1), sst = seg.apply(
        {"params": vars_["params"], "batch_stats": vars_["batch_stats"]},
        x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(sp_, np.float32),
                               np.asarray(pp, np.float32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sc1, np.float32),
                               np.asarray(pc1, np.float32), atol=2e-2)
    for k in ("mean", "var"):
        a = np.asarray(sst["batch_stats"]["Norm_0"]["BatchNorm_0"][k])
        b = np.asarray(pst["batch_stats"]["Norm_0"]["BatchNorm_0"][k])
        np.testing.assert_allclose(a, b, atol=1e-3)
    # eval mode (running stats) too
    (pe, _, _) = plain(vars_, x, False)
    (se, _), _ = seg.apply(
        {"params": vars_["params"], "batch_stats": vars_["batch_stats"]},
        x, False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(se, np.float32),
                               np.asarray(pe, np.float32), atol=2e-2)
