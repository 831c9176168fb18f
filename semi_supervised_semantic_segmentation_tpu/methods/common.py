"""Shared plumbing for SSL methods: on-device aug invocation, model apply
helpers, and state initialization.  Methods are pure loss-builders over the
same engine (SURVEY §7 step 7): each module exposes

  init_state(cfg, model, rng)                      -> TrainState
  make_train_step(cfg, model, total_steps)         -> step(state, lab, unlab)

and ``step`` is a pure jittable function: ONE XLA program containing aug,
teacher+student forwards, losses, backward, psum (inserted by GSPMD), SGD,
and the EMA update (BASELINE.json:5 "no host round-trips").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.engine.state import (
    TrainState,
    make_optimizer,
)
from semi_supervised_semantic_segmentation_tpu.ops import augment

Batch = Dict[str, jnp.ndarray]


def step_key(state: TrainState) -> jax.Array:
    """Deterministic per-step key: fold the step counter into the base key
    (same seed => same augmentation stream regardless of mesh or resume)."""
    return jax.random.fold_in(jax.random.wrap_key_data(state.rng), state.step)


def weak_view(cfg: Config, batch: Batch, key: jax.Array):
    """uint8 canvas batch -> ([0,1] f32 crop view, int32 labels, bool valid).

    ``valid`` is the geometric content mask from the scale-crop: False where
    the view is mean-fill padding.  Labeled views already carry this as
    ``labels == ignore_index``; unlabeled views have no labels, so SSL
    methods must use ``valid`` to keep padded pixels out of pseudo-label /
    consistency losses (they are fake content the teacher would otherwise
    supervise confidently)."""
    d = cfg.data
    return augment.weak_augment_batch(
        batch["image"],
        batch["label"],
        batch["size"],
        key,
        crop_size=d.crop_size,
        scale_min=d.scale_min,
        scale_max=d.scale_max,
        hflip_prob=d.hflip_prob,
        fill_rgb=tuple(d.mean),
        ignore_index=d.ignore_index,
        impl=d.aug_impl,
    )


def strong_view(cfg: Config, images01: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    d = cfg.data
    return augment.strong_augment_batch(
        images01,
        key,
        jitter_prob=d.jitter_prob,
        brightness=d.jitter_brightness,
        contrast=d.jitter_contrast,
        saturation=d.jitter_saturation,
        hue=d.jitter_hue,
        grayscale_prob=d.grayscale_prob,
        blur_prob=d.blur_prob,
        blur_kernel=augment.blur_kernel_size(d.crop_size),
    )


def normalize(cfg: Config, images01: jnp.ndarray, dtype) -> jnp.ndarray:
    return augment.normalize_images(images01, tuple(cfg.data.mean), tuple(cfg.data.std), dtype)


def sup_loss_fn(cfg: Config):
    """Supervised pixel-loss selected by method.sup_loss: plain CE-255 or
    OHEM (hard-pixel mining, the Cityscapes CPS/HRNet recipe)."""
    from semi_supervised_semantic_segmentation_tpu.ops import losses

    m, ignore = cfg.method, cfg.data.ignore_index
    if m.sup_loss == "ohem":
        def fn(logits, labels):
            return losses.ohem_cross_entropy(
                logits, labels, ignore, m.ohem_thresh, m.ohem_min_kept
            )
        return fn
    def fn(logits, labels):
        return losses.cross_entropy(logits, labels, ignore)
    return fn


def model_dtype(model) -> Any:
    return model.dtype


def apply_train(model, params, batch_stats, x, dropout_key):
    """Student forward with BN batch-stat update; returns (logits, new_stats)."""
    out, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": dropout_key},
    )
    return out, updates["batch_stats"]


def apply_eval(model, params, batch_stats, x):
    """Inference forward (running BN stats, no dropout)."""
    return model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )


def init_model_variables(cfg: Config, model, rng: jax.Array):
    x = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3), model.dtype)
    # jit the init: eager flax init dispatches each op separately (minutes on
    # a remote-tunneled TPU); one compiled program takes seconds.
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(rng, x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if cfg.model.pretrained:
        # ImageNet-pretrained encoder init from a torch(vision) state-dict
        # (C7; OIHW->HWIO + BN mapping via the compat layer).
        from semi_supervised_semantic_segmentation_tpu.engine import compat

        params, batch_stats = compat.load_pretrained_encoder(
            cfg.model.pretrained, params, batch_stats
        )
    return params, batch_stats


def base_state(
    cfg: Config,
    params: Any,
    batch_stats: Any,
    total_steps: int,
    rng: jax.Array,
    with_ema: bool,
) -> TrainState:
    tx = make_optimizer(cfg, total_steps)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats) if with_ema else None,
        opt_state=tx.init(params),
        rng=jax.random.key_data(rng),
    )
