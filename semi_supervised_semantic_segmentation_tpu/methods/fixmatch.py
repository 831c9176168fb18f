"""FixMatch-style pseudo-labeling with CutMix (config 3, BASELINE.json:9;
C14/C4; PAPERS.md UniMatch/PseudoSeg lineage).

Per step (one XLA program, zero host round-trips):
  teacher (EMA) on weak unlabeled view -> softmax -> (argmax, maxprob > tau)
  strong view of the same geometry; CutMix mixes strong images AND their
  pseudo-label/confidence maps with the roll-by-1 partner
  student forward on [labeled ; mixed strong] in ONE batch
  loss = CE_sup + lambda * masked-CE(pseudo);  SGD;  EMA update.
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
from semi_supervised_semantic_segmentation_tpu.ops import augment, losses
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
        kl, ku, ks, kmix, kdrop = jax.random.split(key, 5)
        xl01, y, _ = common.weak_view(cfg, labeled, kl)
        xu01, _, uvalid = common.weak_view(cfg, unlabeled, ku)
        xu_strong01 = common.strong_view(cfg, xu01, ks)

        # Teacher pseudo-labels on the weak view (argmax + confidence mask).
        xu_w = common.normalize(cfg, xu01, model.dtype)
        teacher_logits = jax.lax.stop_gradient(
            common.apply_eval(model, state.ema_params, state.ema_batch_stats, xu_w)
        )
        pseudo, conf = losses.pseudo_labels_from_logits(teacher_logits, m.conf_thresh)
        # Mean-fill padding outside the scaled content is fake imagery; the
        # teacher would pseudo-label it confidently.  Mark it ignore BEFORE
        # CutMix so mixed-in padding stays excluded (numerator and
        # denominator) from the unsupervised loss.
        pseudo = jnp.where(uvalid, pseudo, ignore)

        # CutMix: same box cuts image + pseudo-label + confidence mask.
        xl = common.normalize(cfg, xl01, model.dtype)
        if cfg.data.cutmix_impl == "pallas":
            # Single-pass fused CutMix+normalize kernel (ops.pallas_aug):
            # box drawn by the on-chip PRNG, partner mix and ImageNet
            # normalize in one HBM read/write.  Same box distribution as the
            # XLA path, different random stream (documented in the module).
            from semi_supervised_semantic_segmentation_tpu.ops import pallas_aug

            seed = jax.random.randint(kmix, (), 0, jnp.iinfo(jnp.int32).max)
            if jax.default_backend() != "tpu":
                # Off-TPU the kernel runs under the Mosaic TPU interpreter
                # (plain interpret=True lacks the pltpu PRNG primitives).
                from jax.experimental.pallas import tpu as pltpu

                interpret = pltpu.InterpretParams()
            else:
                interpret = False
            xu_s, pseudo, conf = pallas_aug.cutmix_normalize_pallas(
                xu_strong01, pseudo, conf, seed,
                mean=tuple(cfg.data.mean), std=tuple(cfg.data.std),
                prob=m.cutmix_prob, out_dtype=model.dtype,
                interpret=interpret,
            )
        else:
            xu_mix01, pseudo, conf = augment.cutmix_batch(
                xu_strong01, pseudo, conf, kmix, prob=m.cutmix_prob
            )
            xu_s = common.normalize(cfg, xu_mix01, model.dtype)
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
            unsup = losses.confidence_masked_ce(
                logits[nl:], pseudo, conf, ignore, normalize="all"
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
            "mask_ratio": jnp.mean(conf.astype(jnp.float32)),
            "consistency_weight": lam,
            "lr": poly_lr(state.step, cfg.optim.lr, total_steps, cfg.optim.poly_power),
        }
        return new_state, metrics

    return train_step
