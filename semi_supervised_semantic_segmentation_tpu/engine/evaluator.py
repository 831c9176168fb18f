"""Evaluator (rebuilds C18 + §3.3 eval stack).

Jitted eval step returns a per-batch (C, C) confusion matrix computed on
device; with the batch sharded over the data mesh, GSPMD's reduction merge
IS the cross-replica confmat psum.  The host accumulates one small (C, C)
array per batch and derives per-class IoU / mIoU at epoch end.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import Config
from semi_supervised_semantic_segmentation_tpu.methods import common
from semi_supervised_semantic_segmentation_tpu.ops import augment, metrics


def make_eval_step(cfg: Config, model):
    num_classes = cfg.data.num_classes
    mean, std = tuple(cfg.data.mean), tuple(cfg.data.std)

    def eval_step(params, batch_stats, batch):
        x = augment.canvas_normalize_eval(batch["image"], mean, std, model.dtype)
        logits = common.apply_eval(model, params, batch_stats, x)
        pred = jnp.argmax(logits, axis=-1)
        return metrics.confusion_matrix(
            pred, batch["label"], num_classes, cfg.data.ignore_index
        )

    return eval_step


def inference_variables(state, method_module):
    """Pick the inference branch: EMA teacher when the method has one
    (Mean-Teacher/FixMatch convention), net1 for CPS, else the student."""
    if getattr(method_module, "uses_ema", False) and state.ema_params is not None:
        return state.ema_params, state.ema_batch_stats
    params, stats = state.params, state.batch_stats
    if isinstance(params, dict) and "net1" in params:
        return params["net1"], stats["net1"]
    return params, stats


def run_eval(eval_step_jit, params, batch_stats, loader, epoch: int = 0):
    """Iterate the val loader, accumulate the confusion matrix, return
    (per-class IoU, mIoU, pixel accuracy)."""
    total = None
    for batch in loader.epoch(epoch):
        cm = eval_step_jit(params, batch_stats, batch)
        total = cm if total is None else total + cm
    cm_host = np.asarray(jax.device_get(total))
    iou, miou = metrics.iou_from_confusion(cm_host)
    acc = metrics.pixel_accuracy(cm_host)
    return iou, miou, acc
