"""Supervised-only method (config 1, BASELINE.json:7): weak aug -> CE.

The minimum end-to-end slice (SURVEY §3.2): one jitted step = on-device
weak aug + forward + CE(ignore=255) + backward + SGD/poly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.engine.state import TrainState, make_optimizer
from semi_supervised_semantic_segmentation_tpu.methods import common
from semi_supervised_semantic_segmentation_tpu.ops import losses
from semi_supervised_semantic_segmentation_tpu.ops.schedules import poly_lr

uses_unlabeled = False
uses_ema = False


def init_state(cfg: Config, model, rng: jax.Array, total_steps: int) -> TrainState:
    kinit, kbase = jax.random.split(rng)
    params, batch_stats = common.init_model_variables(cfg, model, kinit)
    return common.base_state(cfg, params, batch_stats, total_steps, kbase, with_ema=False)


def make_train_step(cfg: Config, model, total_steps: int):
    tx = make_optimizer(cfg, total_steps)
    ignore = cfg.data.ignore_index

    sup_fn = common.sup_loss_fn(cfg)

    def train_step(state: TrainState, labeled, unlabeled=None):
        key = common.step_key(state)
        kaug, kdrop = jax.random.split(key)
        x01, y, _ = common.weak_view(cfg, labeled, kaug)
        x = common.normalize(cfg, x01, model.dtype)

        def loss_fn(params):
            logits, new_stats = common.apply_train(
                model, params, state.batch_stats, x, kdrop
            )
            loss = sup_fn(logits, y)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
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
            "sup_loss": loss,
            "lr": poly_lr(state.step, cfg.optim.lr, total_steps, cfg.optim.poly_power),
        }
        return new_state, metrics

    return train_step
