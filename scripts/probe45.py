"""Scratch probe for config 4/5 perf work: time one config's step with
config-dict overrides from the CLI, e.g.

  python scripts/probe45.py configs/5_hrnet_w48_1024_full_ssl.yaml \
      --set model.remat= --bl 2 --bu 2 [--profile /tmp/trace]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.config import load_config, update_config
from semi_supervised_semantic_segmentation_tpu.methods import get_method
from semi_supervised_semantic_segmentation_tpu.models import build_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--set", action="append", default=[])
    ap.add_argument("--bl", type=int, default=2)
    ap.add_argument("--bu", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile", default="")
    ap.add_argument(
        "--per-dispatch", action="store_true",
        help="print the wall time of each step() call (dispatch latency) and "
        "of the final loss materialization, to separate host/relay dispatch "
        "cost from device compute",
    )
    ap.add_argument(
        "--fetch-each", action="store_true",
        help="materialize the loss after EVERY step (execution queue depth "
        "1) instead of once at the end — isolates queue-depth-dependent "
        "relay stalls (observed on the CPS config)",
    )
    args = ap.parse_args()

    overrides = {"data.dataset": "synthetic", "model.pretrained": "",
                 "train.labeled_batch_size": args.bl,
                 "train.unlabeled_batch_size": max(args.bu, 1)}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = v
    cfg = load_config(args.config)
    cfg = update_config(cfg, overrides)
    crop, nc = cfg.data.crop_size, cfg.data.num_classes

    rng = np.random.RandomState(0)

    def mk(b, labeled):
        return {
            "image": jnp.asarray((rng.rand(b, crop, crop, 3) * 255).astype(np.uint8)),
            "label": jnp.asarray(
                rng.randint(0, nc, (b, crop, crop)).astype(np.int32)
                if labeled else np.full((b, crop, crop), 255, np.int32)),
            "size": jnp.asarray(np.full((b, 2), crop, np.int32)),
        }

    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    lab = mk(args.bl, True)
    a = (lab, mk(args.bu, False)) if method.uses_unlabeled else (lab,)
    state, m = step(state, *a)
    state, m = step(state, *a)
    # Materialize (device_get) in warmup: the relay's one-time first-result
    # cost for large programs (~74 s observed on the CPS config) must land
    # here, not in the timed window; block_until_ready does not drain.
    float(m["loss"])
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for it in range(args.iters):
        td = time.perf_counter()
        state, m = step(state, *a)
        if args.per_dispatch:
            print(f"  dispatch[{it}] {1e3 * (time.perf_counter() - td):.1f} ms", flush=True)
        if args.fetch_each:
            tq = time.perf_counter()
            float(m["loss"])
            print(f"  fetch[{it}] {1e3 * (time.perf_counter() - tq):.1f} ms", flush=True)
    # Materialize the final loss VALUE on the host: on the axon-relayed
    # backend both block_until_ready(loss) and block_until_ready(full tree)
    # returned before the enqueued programs finished (wall-clock said
    # 12-29 ms/step for the CPS config while the profiler trace showed
    # 188 ms/step of device time).  An actual device_get cannot lie.
    tf = time.perf_counter()
    loss_val = float(m["loss"])
    if args.per_dispatch:
        print(f"  final device_get {1e3 * (time.perf_counter() - tf):.1f} ms", flush=True)
    dt = (time.perf_counter() - t0) / args.iters
    if args.profile:
        jax.profiler.stop_trace()
        print(f"trace -> {args.profile}")
    n = args.bl + (args.bu if method.uses_unlabeled else 0)
    print(
        f"{dt * 1e3:.1f} ms/step  {n / dt:.2f} img/s  loss={loss_val:.4f}  "
        f"(overrides={overrides})"
    )


if __name__ == "__main__":
    main()
