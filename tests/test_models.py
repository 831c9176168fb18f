"""Model zoo shape/structure tests: every (backbone, decoder) pair used by
the five configs builds, forwards at input resolution, and trains (BN stats
mutate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_semantic_segmentation_tpu.models.registry import SegModel
from semi_supervised_semantic_segmentation_tpu.models.resnet import ResNet


@pytest.mark.parametrize(
    "backbone,decoder,os_",
    [
        ("resnet18", "unet", 32),
        ("resnet50", "deeplabv3plus", 16),
        ("resnet101", "deeplabv3plus", 16),
        ("hrnet_w48", "unet", 32),
        ("hrnet_w48", "hrnet_head", 32),  # config 5's reference pairing
    ],
)
@pytest.mark.slow
def test_forward_shapes(backbone, decoder, os_):
    model = SegModel(
        backbone=backbone, decoder=decoder, num_classes=7,
        output_stride=os_, dtype=jnp.float32,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, x, train=False)
    )(jax.random.key(0))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 7)
    # Logits come back in the compute dtype (f32 here); losses upcast.
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_dilated_resnet_keeps_resolution():
    """output_stride 8/16 dilates instead of striding (DeepLab contract)."""
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for os_, expect in [(32, 2), (16, 4), (8, 8)]:
        enc = ResNet(arch="resnet50", output_stride=os_, dtype=jnp.float32)
        variables = jax.jit(
            lambda r, e=enc: e.init({"params": r}, x, train=False)
        )(jax.random.key(0))
        taps = enc.apply(variables, x, train=False)
        assert taps["c5"].shape[1] == expect, (os_, taps["c5"].shape)


def test_train_mode_updates_bn_stats():
    model = SegModel(backbone="resnet18", decoder="unet", num_classes=3,
                     output_stride=32, dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3), jnp.float32) * 0.5
    variables = jax.jit(
        lambda r: model.init({"params": r}, x, train=False)
    )(jax.random.key(0))
    _, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_deeplab_split_projection_equals_concat_formulation():
    """ASPP projection and decoder fuse1 are restructured as per-input convs
    summed (TPU: no 1280/304-channel concats).  Both are linear-algebra
    identities with the concat -> conv formulation; verify against a direct
    NumPy evaluation of the concat form built from the same kernels."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.deeplab import ASPP
    from semi_supervised_semantic_segmentation_tpu.models.layers import ConvNormAct

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    aspp = ASPP(features=16, dilations=(2, 4, 6), dtype=jnp.float32, dropout=0.0)
    variables = aspp.init(jax.random.key(0), x, False)
    got = np.asarray(aspp.apply(variables, x, False))

    p = variables["params"]

    def cna(name, inp, dilation=1):
        k = np.asarray(p[name]["Conv_0"]["kernel"])
        pad = (k.shape[0] // 2) * dilation
        out = jax.lax.conv_general_dilated(
            inp, jnp.asarray(k), (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bn = p[name]["Norm_0"]["BatchNorm_0"]
        out = out / np.sqrt(1.0 + 1e-5) * np.asarray(bn["scale"]) + np.asarray(
            bn["bias"]
        )
        return np.maximum(np.asarray(out), 0.0)

    branches = [cna("b0", x)]
    for i, d in enumerate((2, 4, 6)):
        branches.append(cna(f"b{i + 1}", x, dilation=d))
    pooled = np.asarray(x).mean(axis=(1, 2), keepdims=True)
    pooled = cna("pool", jnp.asarray(pooled))
    branches.append(np.broadcast_to(pooled, branches[0].shape))

    cat = np.concatenate(branches, axis=-1)
    w_cat = np.concatenate(
        [np.asarray(p[f"project{i}"]["kernel"])[0, 0] for i in range(4)]
        + [np.asarray(p["project_pool"]["kernel"])[0, 0]],
        axis=0,
    )
    pre = cat @ w_cat
    bn = p["project_norm"]["BatchNorm_0"]
    pre = pre / np.sqrt(1.0 + 1e-5) * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    want = np.maximum(pre, 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_branches_remat_matches_module_remat_gradients():
    """model.remat='branches' (checkpoint only the branch block chains)
    must be numerically identical to whole-module remat — remat never
    changes values, only what is stored vs recomputed."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNet

    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    )
    grads = []
    for scope in ("module", "branch_blocks"):
        m = HRNet(
            width=4, stage_modules=(1, 1, 1), remat_stages=(2, 3, 4),
            remat_scope=scope, dtype=jnp.float32,
        )
        v = m.init({"params": jax.random.key(0)}, x, train=False)

        def loss(p):
            taps, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return sum(jnp.sum(t ** 2) for t in taps.values())

        grads.append(jax.grad(loss)(v["params"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        grads[0], grads[1],
    )


def test_config_accepts_branches_remat():
    from semi_supervised_semantic_segmentation_tpu.config import (
        config_from_dict,
    )

    cfg = config_from_dict(
        {
            "name": "t",
            "data": {"dataset": "synthetic", "num_classes": 4, "crop_size": 64},
            "model": {"backbone": "hrnet_w48", "decoder": "hrnet_head",
                      "remat": "branches"},
            "method": {"name": "supervised"},
        }
    )
    assert cfg.model.remat == "branches"


def test_remat_plan_parsing_and_validation():
    """Plan strings map to (stages, scope) and bad plans are rejected."""
    import pytest
    from semi_supervised_semantic_segmentation_tpu.config import (
        config_from_dict,
    )
    from semi_supervised_semantic_segmentation_tpu.models.registry import (
        _remat_stages,
    )

    assert _remat_stages("stages:3") == (3,)
    assert _remat_stages("branches:3") == (3,)
    assert _remat_stages("branches:2,4") == (2, 4)
    assert _remat_stages("branches") == (1, 2, 3, 4)

    def mk(remat, backbone="hrnet_w48", decoder="hrnet_head"):
        return config_from_dict(
            {
                "name": "t",
                "data": {"dataset": "synthetic", "num_classes": 4,
                         "crop_size": 64},
                "model": {"backbone": backbone, "decoder": decoder,
                          "remat": remat},
                "method": {"name": "supervised"},
            }
        )

    assert mk("branches:3").model.remat == "branches:3"
    for bad in ("branches:", "branches:5", "stages:12", "bogus"):
        with pytest.raises(ValueError):
            mk(bad)
    # HRNet-only plans rejected for ResNet backbones (advisor r2 item).
    with pytest.raises(ValueError):
        mk("branches:3", backbone="resnet18", decoder="unet")


def test_s2d_stem_exactly_matches_plain_conv():
    """stem_impl='s2d' (space-to-depth stem) must match the plain stride-2
    conv stem — same params, same forward, same gradients (it is the same
    convolution with taps regrouped by phase)."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.layers import (
        ConvNormAct,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    for k in ((7, 7), (3, 3)):
        plain = ConvNormAct(8, k, strides=(2, 2), dtype=jnp.float32)
        s2d = ConvNormAct(8, k, strides=(2, 2), dtype=jnp.float32, s2d=True)
        v = plain.init(jax.random.key(0), x, False)
        # Same param tree shape -> reuse the plain init for the s2d module.
        out_a, out_b = (
            m.apply(v, x, True, mutable=["batch_stats"])[0] for m in (plain, s2d)
        )
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5
        )

        def loss(params, m):
            out, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        g_a = jax.grad(loss)(v["params"], plain)
        g_b = jax.grad(loss)(v["params"], s2d)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            ),
            g_a, g_b,
        )


def test_resnet_s2d_stem_end_to_end():
    """A full ResNet forward with stem_impl='s2d' equals the plain stem."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.resnet import ResNet

    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    )
    a = ResNet(arch="resnet18", dtype=jnp.float32)
    b = ResNet(arch="resnet18", dtype=jnp.float32, stem_impl="s2d")
    v = a.init({"params": jax.random.key(0)}, x, train=False)
    ta = a.apply(v, x, train=False)
    tb = b.apply(v, x, train=False)
    for key in ta:
        np.testing.assert_allclose(
            np.asarray(ta[key]), np.asarray(tb[key]), rtol=1e-5, atol=1e-5
        )


def test_s2d_conv_matches_for_wide_channels():
    """The s2d formulation is Cin-agnostic; verify at HRNet-branch widths
    (48 in) where it targets the profile's stride-2 relayout copies."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.layers import (
        ConvNormAct,
    )

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 12, 48).astype(np.float32))
    plain = ConvNormAct(96, (3, 3), strides=(2, 2), dtype=jnp.float32)
    s2d = ConvNormAct(96, (3, 3), strides=(2, 2), dtype=jnp.float32, s2d=True)
    v = plain.init(jax.random.key(0), x, False)
    out_a = plain.apply(v, x, True, mutable=["batch_stats"])[0]
    out_b = s2d.apply(v, x, True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5
    )


def test_hrnet_fuse_s2d_matches_plain():
    """fuse_impl='s2d' (space-to-depth fuse-down/transition convs) must be
    numerically identical to the plain formulation on the same params."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNet

    x = jnp.asarray(
        np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    )
    a = HRNet(width=8, stage_modules=(1, 1, 1), dtype=jnp.float32)
    b = HRNet(
        width=8, stage_modules=(1, 1, 1), dtype=jnp.float32, fuse_impl="s2d"
    )
    v = a.init({"params": jax.random.key(0)}, x, train=False)
    ta = a.apply(v, x, train=False)
    tb = b.apply(v, x, train=False)
    for key in ta:
        np.testing.assert_allclose(
            np.asarray(ta[key]), np.asarray(tb[key]), rtol=1e-4, atol=1e-4
        )


def test_hrnet_head_up_first_matches_conv_first():
    """fuse_order='up_first' (upsample branch taps, conv at base res) is the
    same linear map as 'conv_first' (1x1 conv commutes with per-channel
    bilinear resize); identical parameter tree, equal outputs."""
    import numpy as np
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import (
        HRNetV2Head,
    )

    rng = np.random.RandomState(7)
    taps = {
        k: jnp.asarray(rng.randn(1, s, s, c).astype(np.float32))
        for k, s, c in [
            ("c2", 16, 8), ("c3", 8, 16), ("c4", 4, 32), ("c5", 2, 64)
        ]
    }
    a = HRNetV2Head(num_classes=5, dtype=jnp.float32)
    b = HRNetV2Head(num_classes=5, dtype=jnp.float32, fuse_order="up_first")
    va = a.init(jax.random.key(0), taps, (64, 64), False)
    vb = b.init(jax.random.key(0), taps, (64, 64), False)
    assert jax.tree.map(lambda t: t.shape, va) == jax.tree.map(
        lambda t: t.shape, vb
    )
    oa = a.apply(va, taps, (64, 64), False)
    ob = b.apply(va, taps, (64, 64), False)  # SAME params
    np.testing.assert_allclose(
        np.asarray(oa), np.asarray(ob), rtol=1e-4, atol=1e-4
    )


def test_hrnet_stem_s2d_matches_conv_same_params():
    """HRNet stem_impl='s2d' (2x2 space-to-depth stem1/stem2) computes the
    SAME function with the SAME parameter tree as the plain conv stem —
    checkpoints and torch imports are formulation-independent."""
    from semi_supervised_semantic_segmentation_tpu.models.hrnet import HRNet

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32), jnp.bfloat16)
    m_conv = HRNet(width=8, stage_modules=(1, 1, 1), dtype=jnp.bfloat16)
    m_s2d = HRNet(width=8, stage_modules=(1, 1, 1), dtype=jnp.bfloat16,
                  stem_impl="s2d")
    v = m_conv.init(jax.random.PRNGKey(0), x, False)
    o1 = m_conv.apply(v, x, False)
    o2 = m_s2d.apply(v, x, False)  # SAME variables
    for k_ in o1:
        np.testing.assert_allclose(
            np.asarray(o1[k_], np.float32), np.asarray(o2[k_], np.float32),
            rtol=2e-2, atol=2e-2, err_msg=k_)
