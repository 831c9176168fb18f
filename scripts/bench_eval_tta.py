"""Production-scale TTA eval benchmark (VERDICT r3 item 3 / r4 item 2):
run the SHIPPED eval protocol — sliding windows + flip + 6-scale
probability averaging — on the real chip at the real Cityscapes canvas
(1024x2048) through the staged evaluator, and record per-scale compile
time, steady-state ms/image, and peak HBM.

Usage:
    python scripts/bench_eval_tta.py --config 5 [--window-batch N] [--n 1]
    python scripts/bench_eval_tta.py --config 4

Timing: compile time = first-call wall (includes trace+compile+run);
steady ms/image = mean of --iters timed full-protocol evals, synchronized
by fetching the confusion-matrix sum (a device_get; block_until_ready is
not a fence on the axon relay — BASELINE.md methodology).
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import load_config, update_config
from semi_supervised_semantic_segmentation_tpu.engine import evaluator as ev
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

CONFIGS = {
    4: "configs/4_cps_dlv3p_r101_cityscapes_768.yaml",
    5: "configs/5_hrnet_w48_1024_full_ssl.yaml",
}


def hbm_peak_gb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return st.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5, choices=sorted(CONFIGS))
    ap.add_argument("--window-batch", type=int, default=-1,
                    help="-1 = config default (0 = all windows one forward)")
    ap.add_argument("--n", type=int, default=1, help="eval canvas batch")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--canvas", type=str, default="1024x2048")
    args = ap.parse_args()

    h, w = (int(v) for v in args.canvas.split("x"))
    over = {
        "data.dataset": "synthetic",
        "model.pretrained": "",
        "data.eval_impl": "staged",
    }
    if args.window_batch >= 0:
        over["data.eval_window_batch"] = args.window_batch
    cfg = update_config(load_config(_os.path.join(REPO, CONFIGS[args.config])), over)
    nc = cfg.data.num_classes
    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=10)
    params, bstats = ev.inference_variables(state, method)

    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            (rng.rand(args.n, h, w, 3) * 255).astype(np.uint8)),
        "label": jax.device_put(
            rng.randint(0, nc, (args.n, h, w)).astype(np.int32)),
    }

    # Build the staged evaluator but drive its per-scale programs one at a
    # time so compile time and steady-state can be attributed per scale.
    step = ev.make_staged_eval_step(cfg, model)
    # reach inside: step closes over scale_fns/normalize/finish — re-create
    # the same structure here for per-scale attribution.
    print(f"canvas {h}x{w} n={args.n} window_batch="
          f"{cfg.data.eval_window_batch} scales={cfg.data.eval_scales} "
          f"flip={cfg.data.eval_flip} crop={cfg.data.crop_size} "
          f"stride={cfg.data.eval_stride}", flush=True)

    t0 = time.perf_counter()
    cm = step(params, bstats, batch)
    float(np.asarray(cm).sum())
    t_compile = time.perf_counter() - t0
    print(f"full protocol first call (all compiles): {t_compile:.1f} s; "
          f"peak HBM {hbm_peak_gb():.2f} GiB", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        cm = step(params, bstats, batch)
        s = float(np.asarray(cm).sum())
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"steady: {dt * 1e3:.0f} ms/eval-call = {dt * 1e3 / args.n:.0f} "
        f"ms/image ({args.n / dt:.3f} img/s); confmat sum {s:.0f}; "
        f"peak HBM {hbm_peak_gb():.2f} GiB",
        flush=True,
    )


if __name__ == "__main__":
    main()
