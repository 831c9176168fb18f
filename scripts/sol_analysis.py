"""Speed-of-light analysis for a config's train step (VERDICT r1 item 2).

Computes the compiled step's total FLOPs from XLA cost analysis, divides by
the chip's peak to get the pure-MXU floor, applies a utilization ceiling
from the model's channel structure (output channels < 128 underfill the MXU
lanes), and compares with the measured step time to report headroom.

Runs on CPU (lowering/compile only, no execution), so it can run while the
chip is busy:

  JAX_PLATFORMS=cpu python scripts/sol_analysis.py configs/5_*.yaml \
      --bl 2 --bu 2 --measured-ms 589
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import load_config, update_config
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

PEAK = float(os.environ.get("SSTPU_PEAK_FLOPS", 197e12))  # v5e bf16
HBM_BW = float(os.environ.get("SSTPU_HBM_BW", 819e9))  # v5e bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--bl", type=int, default=2)
    ap.add_argument("--bu", type=int, default=2)
    ap.add_argument("--measured-ms", type=float, default=0.0)
    args = ap.parse_args()

    cfg = load_config(args.config)
    cfg = update_config(
        cfg,
        {
            "data.dataset": "synthetic",
            "model.pretrained": "",
            "train.labeled_batch_size": args.bl,
            "train.unlabeled_batch_size": max(args.bu, 1),
        },
    )
    crop, nc = cfg.data.crop_size, cfg.data.num_classes
    rng = np.random.RandomState(0)

    def mk(b, labeled):
        return {
            "image": jnp.asarray((rng.rand(b, crop, crop, 3) * 255).astype(np.uint8)),
            "label": jnp.asarray(
                rng.randint(0, nc, (b, crop, crop)).astype(np.int32)
                if labeled
                else np.full((b, crop, crop), 255, np.int32)
            ),
            "size": jnp.asarray(np.full((b, 2), crop, np.int32)),
        }

    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    lab = mk(args.bl, True)
    a = (lab, mk(args.bu, False)) if method.uses_unlabeled else (lab,)
    lowered = step.lower(state, *a)
    # Pre-compile estimate when available (seconds); full HRNet/R101 CPU
    # compiles take >15 min on this 1-core host.
    ca = None
    try:
        ca = lowered.cost_analysis()
    except Exception:
        pass
    if not ca or not float((ca[0] if isinstance(ca, (list, tuple)) else ca).get("flops", 0.0)):
        ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    floor_flops_ms = flops / PEAK * 1e3
    bw_upper_ms = bytes_accessed / HBM_BW * 1e3
    print(f"config              : {cfg.name}  ({args.bl}+{args.bu} @ {crop}^2)")
    print(f"program FLOPs       : {flops / 1e12:.2f} TF/step (incl. remat recompute)")
    print(f"bytes accessed      : {bytes_accessed / 1e9:.2f} GB/step (HLO-level, PRE-fusion — an upper bound on HBM traffic, not a floor)")
    print(f"MXU floor @100%     : {floor_flops_ms:.1f} ms")
    print(f"HBM time IF unfused : {bw_upper_ms:.1f} ms (fusion removes most of it; shown for scale)")
    if args.measured_ms:
        eff = floor_flops_ms / args.measured_ms
        print(f"measured            : {args.measured_ms:.1f} ms -> {eff:.1%} of MXU peak")
        print(f"headroom to MXU SOL : {args.measured_ms / floor_flops_ms:.2f}x")


if __name__ == "__main__":
    main()
