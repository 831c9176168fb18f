"""Cross-pseudo-supervision (config 4, BASELINE.json:10; C15).

Two independently initialized networks live in one params pytree
{'net1', 'net2'}; each is CE-supervised on labeled data and supervises the
other with its hard argmax pseudo-labels on both labeled and unlabeled
views (the original CPS recipe applies L_cps on both sets):

  L = CE(p1, gt) + CE(p2, gt)
    + lambda_cps * [CPS(l1^l, l2^l) + CPS(l1^u, l2^u)]

Both nets' forwards/backwards live in ONE jitted step (SURVEY §3.5); a
single optimizer over the concatenated pytree replaces the reference's two
torch optimizers (identical math for SGD).

Two execution formulations (``method.cps_impl``), identical math:

- ``stacked`` (default): net1/net2 params are stacked on a leading axis and
  the model apply is ``jax.vmap``-ed over that axis.  JAX's conv batching
  rule lowers a vmapped conv (both activations and weights batched) to ONE
  ``conv_general_dilated`` with ``batch_group_count=2`` at doubled batch —
  each layer runs once at 2x work instead of twice at small work, which
  matters at config 4's 2+2 @768^2 where per-net batch under-fills the MXU.
- ``separate``: two sequential forwards/backwards (the round-1/2 layout,
  kept for A/B timing and as a fallback).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.engine.state import (
    TrainState,
    make_optimizer,
)
from semi_supervised_semantic_segmentation_tpu.methods import common
from semi_supervised_semantic_segmentation_tpu.ops import losses
from semi_supervised_semantic_segmentation_tpu.ops.schedules import poly_lr

uses_unlabeled = True
uses_ema = False


def init_state(cfg: Config, model, rng: jax.Array, total_steps: int) -> TrainState:
    k1, k2, kbase = jax.random.split(rng, 3)
    p1, bs1 = common.init_model_variables(cfg, model, k1)
    p2, bs2 = common.init_model_variables(cfg, model, k2)
    params = {"net1": p1, "net2": p2}
    batch_stats = {"net1": bs1, "net2": bs2}
    return common.base_state(cfg, params, batch_stats, total_steps, kbase, with_ema=False)


def make_train_step(cfg: Config, model, total_steps: int):
    tx = make_optimizer(cfg, total_steps)
    m = cfg.method
    ignore = cfg.data.ignore_index
    sup_fn = common.sup_loss_fn(cfg)

    stacked = cfg.method.cps_impl == "stacked"

    def train_step(state: TrainState, labeled, unlabeled):
        key = common.step_key(state)
        kl, ku, kd1, kd2 = jax.random.split(key, 4)
        xl01, y, lvalid = common.weak_view(cfg, labeled, kl)
        xu01, _, uvalid = common.weak_view(cfg, unlabeled, ku)
        xl = common.normalize(cfg, xl01, model.dtype)
        xu = common.normalize(cfg, xu01, model.dtype)
        x = jnp.concatenate([xl, xu], axis=0)
        nl = xl.shape[0]

        def apply_both(params):
            """(logits1, logits2, new_stats) for both nets — vmapped over a
            leading net axis (stacked) or two sequential applies."""
            if stacked:
                sp = jax.tree.map(
                    lambda a, b: jnp.stack([a, b]), params["net1"], params["net2"]
                )
                sbs = jax.tree.map(
                    lambda a, b: jnp.stack([a, b]),
                    state.batch_stats["net1"],
                    state.batch_stats["net2"],
                )
                keys = jnp.stack([kd1, kd2])
                logits_b, bs_b = jax.vmap(
                    lambda p, b, k: common.apply_train(model, p, b, x, k)
                )(sp, sbs, keys)
                new_stats = {
                    "net1": jax.tree.map(lambda t: t[0], bs_b),
                    "net2": jax.tree.map(lambda t: t[1], bs_b),
                }
                return logits_b[0], logits_b[1], new_stats
            logits1, bs1 = common.apply_train(
                model, params["net1"], state.batch_stats["net1"], x, kd1
            )
            logits2, bs2 = common.apply_train(
                model, params["net2"], state.batch_stats["net2"], x, kd2
            )
            return logits1, logits2, {"net1": bs1, "net2": bs2}

        def loss_fn(params):
            logits1, logits2, new_stats = apply_both(params)
            sup = sup_fn(logits1[:nl], y) + sup_fn(logits2[:nl], y)
            # Geometric validity masks keep mean-fill padding (fake content
            # outside the scaled image) out of the pseudo-supervision.
            cps = losses.cps_loss(
                logits1[:nl], logits2[:nl], ignore, valid_mask=lvalid
            ) + losses.cps_loss(logits1[nl:], logits2[nl:], ignore, valid_mask=uvalid)
            loss = sup + m.cps_weight * cps
            return loss, (new_stats, sup, cps)

        (loss, (new_stats, sup, cps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = {
            "loss": loss,
            "sup_loss": sup,
            "cps_loss": cps,
            "lr": poly_lr(state.step, cfg.optim.lr, total_steps, cfg.optim.poly_power),
        }
        return new_state, metrics

    return train_step
