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
