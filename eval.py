#!/usr/bin/env python
"""Evaluation entry point (rebuilds the reference's eval.py, L7).

Usage:
  python eval.py --config configs/....yaml --checkpoint runs/<exp>/checkpoints
"""

import argparse
import os

import jax

if os.environ.get("SSTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SSTPU_PLATFORM"])
import numpy as np
import yaml

from semi_supervised_semantic_segmentation_tpu.config import load_config
from semi_supervised_semantic_segmentation_tpu.data.datasets import build_dataset
from semi_supervised_semantic_segmentation_tpu.data.pipeline import Loader
from semi_supervised_semantic_segmentation_tpu.engine.checkpoint import CheckpointManager
from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
    inference_variables,
    make_evaluator,
    run_eval,
)
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model
from semi_supervised_semantic_segmentation_tpu.parallel import mesh as mesh_lib


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True, help="checkpoint dir (or dir:step)")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    p.add_argument(
        "--save_preds", default=None, metavar="DIR",
        help="write palette PNG predictions for every val image",
    )
    p.add_argument(
        "--export_torch", default=None, metavar="OUT.pth",
        help="export the restored state as a reference-layout torch checkpoint",
    )
    args = p.parse_args()

    overrides = {}
    for pair in args.set:
        k, v = pair.split("=", 1)
        parsed = yaml.safe_load(v)
        if isinstance(parsed, int) and "_" in v:  # '1_16' != 116 (YAML 1.1)
            parsed = v
        overrides[k] = parsed
    cfg = load_config(args.config, overrides)

    mesh = mesh_lib.make_mesh(cfg.parallel.data_parallel, cfg.parallel.model_parallel)
    model = build_model(cfg)
    method = get_method(cfg.method.name)

    step = None
    ckpt_dir = args.checkpoint
    if ":" in ckpt_dir and ckpt_dir.rsplit(":", 1)[-1].isdigit():
        ckpt_dir, s = ckpt_dir.rsplit(":", 1)
        step = int(s)
    total_steps = max(cfg.train.epochs, 1)
    template = method.init_state(cfg, model, jax.random.key(0), total_steps)
    if ckpt_dir.endswith((".pth", ".pt")):
        # Reference-format interop: evaluate a torch.save checkpoint directly
        # (BASELINE.json:5 "same checkpoint format").
        from semi_supervised_semantic_segmentation_tpu.engine import compat

        state = compat.import_reference_checkpoint(ckpt_dir, jax.device_get(template))
        meta = {}
    else:
        state, meta = CheckpointManager(ckpt_dir).restore(template, step)
    state = mesh_lib.replicate(state, mesh)

    if args.export_torch:
        from semi_supervised_semantic_segmentation_tpu.engine import compat

        compat.export_reference_checkpoint(
            args.export_torch, jax.device_get(state), meta, cfg=cfg
        )
        print(f"reference-layout checkpoint written to {args.export_torch}")

    val = Loader(
        build_dataset(cfg, "val"), cfg.train.eval_batch_size, shuffle=False,
        drop_last=False, pad_mode="blank", num_workers=cfg.data.num_workers,
    )
    eval_step = make_evaluator(cfg, model)
    params, stats = inference_variables(state, method)
    if args.save_preds:
        from semi_supervised_semantic_segmentation_tpu.engine.evaluator import (
            make_predict_step,
            save_predictions,
        )

        predict = jax.jit(make_predict_step(cfg, model))
        ds = val.dataset
        for batch in val.epoch(0):
            preds = predict(params, stats, mesh_lib.shard_batch(batch, mesh))
            save_predictions(preds, batch, ds, args.save_preds)
        print(f"predictions written to {args.save_preds}")
    iou, miou, acc = run_eval(
        lambda p_, s_, b: eval_step(p_, s_, mesh_lib.shard_batch(b, mesh)),
        params, stats, val,
    )
    from semi_supervised_semantic_segmentation_tpu.ops.metrics import (
        class_names,
        format_iou_table,
    )

    print(format_iou_table(iou, class_names(cfg.data.dataset, cfg.data.num_classes)))
    print(f"mIoU: {miou:.4f}  pixel-acc: {acc:.4f}")


if __name__ == "__main__":
    main()
