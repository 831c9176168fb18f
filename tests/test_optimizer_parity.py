"""Optimizer parity vs torch.optim.SGD (C16): weight decay -> momentum ->
poly LR with the 10x decoder param-group, trajectory-matched over steps."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_supervised_semantic_segmentation_tpu.config import config_from_dict
from semi_supervised_semantic_segmentation_tpu.engine.state import (
    head_label_tree,
    make_optimizer,
)
from semi_supervised_semantic_segmentation_tpu.ops.schedules import poly_lr

LR, MOM, WD, POWER, TOTAL = 0.1, 0.9, 1e-3, 0.9, 20


def _cfg(head_mult=10.0):
    return config_from_dict(
        {
            "optim": {
                "lr": LR, "momentum": MOM, "weight_decay": WD,
                "poly_power": POWER, "head_lr_mult": head_mult,
            }
        }
    )


def test_sgd_matches_torch_trajectory():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads_seq = [rng.randn(4, 3).astype(np.float32) for _ in range(6)]

    # torch: lr set per-step to the poly schedule.
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=LR, momentum=MOM, weight_decay=WD)
    for step, g in enumerate(grads_seq):
        for group in opt.param_groups:
            group["lr"] = float(poly_lr(step, LR, TOTAL, POWER))
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours: params live under 'encoder' (backbone label, mult 1).
    params = {"encoder": {"w": jnp.asarray(w0)}}
    tx = make_optimizer(_cfg(), TOTAL)
    opt_state = tx.init(params)
    for g in grads_seq:
        grads = {"encoder": {"w": jnp.asarray(g)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["encoder"]["w"]), wt.detach().numpy(), atol=1e-5
    )


def test_head_gets_lr_multiplier():
    params = {"encoder": {"w": jnp.ones((2, 2))}, "decoder": {"w": jnp.ones((2, 2))}}
    labels = head_label_tree(params)
    assert labels["encoder"]["w"] == "backbone"
    assert labels["decoder"]["w"] == "head"

    tx = make_optimizer(_cfg(head_mult=10.0), TOTAL)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    ratio = float(updates["decoder"]["w"][0, 0] / updates["encoder"]["w"][0, 0])
    np.testing.assert_allclose(ratio, 10.0, rtol=1e-6)


def test_cps_nets_both_labeled():
    params = {
        "net1": {"encoder": {"w": jnp.ones(2)}, "decoder": {"w": jnp.ones(2)}},
        "net2": {"encoder": {"w": jnp.ones(2)}, "decoder": {"w": jnp.ones(2)}},
    }
    labels = head_label_tree(params)
    assert labels["net1"]["decoder"]["w"] == "head"
    assert labels["net2"]["encoder"]["w"] == "backbone"
