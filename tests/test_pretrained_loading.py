"""model.pretrained path: a torchvision-named ResNet state-dict file loads
into the encoder subtree at init (C7 ImageNet-init contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_supervised_semantic_segmentation_tpu.methods import common, get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

from .helpers import tiny_cfg
from .test_model_parity import TorchResNet18


def test_pretrained_state_dict_loads_into_encoder(tmp_path):
    torch.manual_seed(0)
    tmodel = TorchResNet18()
    sd_path = str(tmp_path / "r18_imagenet.pth")
    torch.save(tmodel.state_dict(), sd_path)

    cfg = tiny_cfg("supervised", crop=64, **{"model.pretrained": sd_path})
    model = build_model(cfg)
    method = get_method("supervised")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)

    # Stem conv kernel must equal the torch weights (OIHW -> HWIO).
    tv = tmodel.state_dict()["conv1.weight"].numpy()
    ours = np.asarray(state.params["encoder"]["stem"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(ours, np.transpose(tv, (2, 3, 1, 0)), atol=1e-6)
    # BN running stats landed in batch_stats.
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["encoder"]["stem"]["Norm_0"]["BatchNorm_0"]["mean"]),
        tmodel.state_dict()["bn1.running_mean"].numpy(),
        atol=1e-6,
    )
    # Decoder params stay randomly initialized (not all zero / not from sd).
    dec_leaves = jax.tree.leaves(state.params["decoder"])
    assert sum(float(jnp.sum(jnp.abs(x))) for x in dec_leaves) > 0

    # And the state still trains.
    from .helpers import synthetic_batch

    step = jax.jit(method.make_train_step(cfg, model, total_steps=10))
    state, metrics = step(state, synthetic_batch(2, 64))
    assert np.isfinite(float(metrics["loss"]))
