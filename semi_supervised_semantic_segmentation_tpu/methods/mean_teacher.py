"""Mean-Teacher method (config 2, BASELINE.json:8): EMA teacher + softmax
MSE consistency with sigmoid ramp-up (C12/C13; PAPERS.md Mean-Teacher
lineage).

Per step (all one XLA program):
  labeled:    weak view -> student CE
  unlabeled:  weak view -> teacher (EMA params, running BN stats, no grad)
              strong view (same geometry, photometric noise) -> student
              loss_u = MSE(softmax(student_strong), softmax(teacher_weak))
  total = CE + lambda(t) * loss_u;  SGD;  EMA update.
Student runs labeled+strong-unlabeled as a single batched forward
(BASELINE.json:5 "single batched pjit forward").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.engine.state import (
    TrainState,
    ema_update,
    make_optimizer,
)
from semi_supervised_semantic_segmentation_tpu.methods import common
from semi_supervised_semantic_segmentation_tpu.ops import losses
from semi_supervised_semantic_segmentation_tpu.ops.schedules import (
    consistency_weight,
    poly_lr,
)

uses_unlabeled = True
uses_ema = True


def init_state(cfg: Config, model, rng: jax.Array, total_steps: int) -> TrainState:
    kinit, kbase = jax.random.split(rng)
    params, batch_stats = common.init_model_variables(cfg, model, kinit)
    return common.base_state(cfg, params, batch_stats, total_steps, kbase, with_ema=True)


def make_train_step(cfg: Config, model, total_steps: int):
    tx = make_optimizer(cfg, total_steps)
    m = cfg.method
    ignore = cfg.data.ignore_index
    sup_fn = common.sup_loss_fn(cfg)

    def train_step(state: TrainState, labeled, unlabeled):
        key = common.step_key(state)
        kl, ku, ks, kdrop = jax.random.split(key, 4)
        xl01, y, _ = common.weak_view(cfg, labeled, kl)
        xu01, _, uvalid = common.weak_view(cfg, unlabeled, ku)
        xu_strong01 = common.strong_view(cfg, xu01, ks)

        xl = common.normalize(cfg, xl01, model.dtype)
        xu_w = common.normalize(cfg, xu01, model.dtype)
        xu_s = common.normalize(cfg, xu_strong01, model.dtype)

        # Teacher forward: EMA params, running stats, no gradient.
        teacher_logits = jax.lax.stop_gradient(
            common.apply_eval(model, state.ema_params, state.ema_batch_stats, xu_w)
        )

        nl = xl.shape[0]
        lam = consistency_weight(
            state.step, m.consistency_weight, m.rampup_iters, m.rampup_kind
        )

        def loss_fn(params):
            x = jnp.concatenate([xl, xu_s], axis=0)
            logits, new_stats = common.apply_train(
                model, params, state.batch_stats, x, kdrop
            )
            sup = sup_fn(logits[:nl], y)
            # valid_mask: mean-fill padding pixels (outside the scaled
            # content) carry no real signal — exclude them from consistency.
            unsup = losses.mse_consistency(
                logits[nl:],
                teacher_logits,
                valid_mask=uvalid,
                reduction=m.consistency_reduction,
            )
            return sup + lam * unsup, (new_stats, sup, unsup)

        (loss, (new_stats, sup, unsup)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        alpha = jnp.asarray(m.ema_alpha, jnp.float32)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            ema_params=ema_update(state.ema_params, new_params, alpha),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_stats, alpha),
            opt_state=new_opt,
        )
        metrics = {
            "loss": loss,
            "sup_loss": sup,
            "unsup_loss": unsup,
            "consistency_weight": lam,
            "lr": poly_lr(state.step, cfg.optim.lr, total_steps, cfg.optim.poly_power),
        }
        return new_state, metrics

    return train_step
