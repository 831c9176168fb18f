"""One profiling entry point (folds the round-1/2 probe scratch:
perf_probe.py, probe45.py, trace_summary.py, compile_bisect.py).

Subcommands:

  step        Time one config's full train step with CLI overrides:
                python scripts/profiler.py step configs/5_hrnet_w48_1024_full_ssl.yaml \
                    --set model.remat= --bl 2 --bu 2 [--profile /tmp/trace]
                [--per-dispatch] [--fetch-each]
  components  Time the step's pieces on the 512^2 bench shape (aug cores,
              teacher fwd, per-method steps; --scale for batch scaling,
              --cutmix for XLA-vs-Pallas CutMix).
  compile     Bisect trace/lower/compile time of the bench step's components.
  trace       Summarize a jax.profiler xplane trace (per-HLO-op device time):
                PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
                python scripts/profiler.py trace /tmp/trace5 [--top 40]

Timing methodology (BASELINE.md): warmup materializes a loss VALUE
(``float(loss)``) because on the axon-relayed chip ``block_until_ready`` can
return before enqueued programs execute, and the relay charges a one-time
first-result cost for large programs that must land outside the timed window.
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import re
import sys
import time

import numpy as np


# ----------------------------------------------------------------------------
# shared helpers
# ----------------------------------------------------------------------------

def _mk_batch(b, crop, nc, labeled, rng):
    import jax.numpy as jnp

    return {
        "image": jnp.asarray((rng.rand(b, crop, crop, 3) * 255).astype(np.uint8)),
        "label": jnp.asarray(
            rng.randint(0, nc, (b, crop, crop)).astype(np.int32)
            if labeled else np.full((b, crop, crop), 255, np.int32)),
        "size": jnp.asarray(np.full((b, 2), crop, np.int32)),
    }


def _bench_cfg(method="fixmatch_cutmix", aug_impl="matmul", b=8, cutmix_impl="xla"):
    from semi_supervised_semantic_segmentation_tpu.config import config_from_dict

    return config_from_dict(
        {
            "name": "probe",
            "data": {
                "dataset": "synthetic", "num_classes": 21, "crop_size": 512,
                "split": "1_4", "aug_impl": aug_impl, "cutmix_impl": cutmix_impl,
            },
            "model": {
                "backbone": "resnet50", "decoder": "deeplabv3plus",
                "output_stride": 16, "compute_dtype": "bfloat16",
            },
            "method": {"name": method},
            "train": {"labeled_batch_size": b, "unlabeled_batch_size": b, "epochs": 1},
        }
    )


def _bench_step(name, cfg, method_name, b=8, iters=10, profile=False):
    import jax

    from semi_supervised_semantic_segmentation_tpu.methods import get_method
    from semi_supervised_semantic_segmentation_tpu.models import build_model

    rng = np.random.RandomState(0)
    crop, nc = cfg.data.crop_size, cfg.data.num_classes
    model = build_model(cfg)
    method = get_method(method_name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    lab, unlab = _mk_batch(b, crop, nc, True, rng), _mk_batch(b, crop, nc, False, rng)
    args = (lab, unlab) if method.uses_unlabeled else (lab,)
    state, m = step(state, *args)
    state, m = step(state, *args)
    float(m["loss"])
    if profile:
        jax.profiler.start_trace("/tmp/sstpu_profile")
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, *args)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    if profile:
        jax.profiler.stop_trace()
        print("profile written to /tmp/sstpu_profile", flush=True)
    n_img = 2 * b if method.uses_unlabeled else b
    print(f"{name}: {dt * 1e3:.1f} ms/step  {n_img / dt:.1f} img/s", flush=True)
    return dt


# ----------------------------------------------------------------------------
# step: config-driven full-step timing
# ----------------------------------------------------------------------------

def cmd_step(argv):
    ap = argparse.ArgumentParser(prog="profiler.py step")
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
        "cost from device compute")
    ap.add_argument(
        "--fetch-each", action="store_true",
        help="materialize the loss after EVERY step (execution queue depth 1) "
        "instead of once at the end — isolates queue-depth-dependent relay "
        "stalls (observed on the CPS config)")
    args = ap.parse_args(argv)

    import jax

    from semi_supervised_semantic_segmentation_tpu.config import (
        load_config,
        update_config,
    )
    from semi_supervised_semantic_segmentation_tpu.methods import get_method
    from semi_supervised_semantic_segmentation_tpu.models import build_model

    overrides = {"data.dataset": "synthetic", "model.pretrained": "",
                 "train.labeled_batch_size": args.bl,
                 "train.unlabeled_batch_size": max(args.bu, 1)}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = v
    cfg = update_config(load_config(args.config), overrides)
    crop, nc = cfg.data.crop_size, cfg.data.num_classes

    rng = np.random.RandomState(0)
    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    lab = _mk_batch(args.bl, crop, nc, True, rng)
    a = (lab, _mk_batch(args.bu, crop, nc, False, rng)) if method.uses_unlabeled else (lab,)
    state, m = step(state, *a)
    state, m = step(state, *a)
    float(m["loss"])  # one-time relay first-result cost lands here
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
    tf = time.perf_counter()
    loss_val = float(m["loss"])
    if args.per_dispatch:
        print(f"  final device_get {1e3 * (time.perf_counter() - tf):.1f} ms", flush=True)
    dt = (time.perf_counter() - t0) / args.iters
    if args.profile:
        jax.profiler.stop_trace()
        print(f"trace -> {args.profile}")
    n = args.bl + (args.bu if method.uses_unlabeled else 0)
    print(f"{dt * 1e3:.1f} ms/step  {n / dt:.2f} img/s  loss={loss_val:.4f}  "
          f"(overrides={overrides})")


# ----------------------------------------------------------------------------
# components: piecewise timing on the 512^2 bench shape
# ----------------------------------------------------------------------------

def cmd_components(argv):
    ap = argparse.ArgumentParser(prog="profiler.py components")
    ap.add_argument("--scale", action="store_true", help="batch scaling 4/8/16")
    ap.add_argument("--cutmix", action="store_true", help="XLA vs Pallas CutMix")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from semi_supervised_semantic_segmentation_tpu.methods import common
    from semi_supervised_semantic_segmentation_tpu.models import build_model

    if args.scale:
        for b in (4, 8, 16):
            _bench_step(f"fixmatch(b={b}+{b})", _bench_cfg(b=b), "fixmatch_cutmix",
                        b=b, profile=(b == 16))
        return
    if args.cutmix:
        _bench_step("fixmatch_cutmix_xla(8+8)", _bench_cfg(cutmix_impl="xla"),
                    "fixmatch_cutmix")
        _bench_step("fixmatch_cutmix_pallas(8+8)", _bench_cfg(cutmix_impl="pallas"),
                    "fixmatch_cutmix")
        return

    B, CROP = 8, 512
    rng = np.random.RandomState(0)

    def bench_fn(name, fn, *fargs):
        f = jax.jit(fn)
        out = f(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(*fargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt * 1e3:.1f} ms", flush=True)

    cfg = _bench_cfg()
    key = jax.random.key(1)
    lab = _mk_batch(B, CROP, 21, True, rng)
    bench_fn("weak_aug_matmul", lambda b_, k: common.weak_view(cfg, b_, k), lab, key)
    cfg_g = _bench_cfg(aug_impl="gather")
    bench_fn("weak_aug_gather", lambda b_, k: common.weak_view(cfg_g, b_, k), lab, key)
    x01 = jnp.zeros((B, CROP, CROP, 3), jnp.float32)
    bench_fn("strong_aug", lambda x, k: common.strong_view(cfg, x, k), x01, key)

    model = build_model(cfg)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.key(0), jnp.zeros((1, CROP, CROP, 3), jnp.bfloat16))
    xb = jnp.zeros((B, CROP, CROP, 3), jnp.bfloat16)
    bench_fn(
        "teacher_fwd(8)",
        lambda p, x: common.apply_eval(model, p, variables["batch_stats"], x),
        variables["params"], xb)

    _bench_step("supervised_step(8)", _bench_cfg("supervised"), "supervised")
    _bench_step("fixmatch_matmul(8+8)", _bench_cfg(), "fixmatch_cutmix")
    _bench_step("fixmatch_gather(8+8)", _bench_cfg(aug_impl="gather"), "fixmatch_cutmix")


# ----------------------------------------------------------------------------
# compile: trace/lower/compile time bisect
# ----------------------------------------------------------------------------

def cmd_compile(argv):
    argparse.ArgumentParser(prog="profiler.py compile").parse_args(argv)

    import jax
    import jax.numpy as jnp

    from semi_supervised_semantic_segmentation_tpu.methods import common, get_method
    from semi_supervised_semantic_segmentation_tpu.models import build_model
    from semi_supervised_semantic_segmentation_tpu.ops import augment

    B, CROP = 8, 512
    cfg = _bench_cfg()

    def timeit(name, fn, *fargs):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*fargs)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        print(f"{name}: trace/lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    img_u8 = jnp.asarray((rng.rand(B, CROP, CROP, 3) * 255).astype(np.uint8))
    lab = jnp.asarray(rng.randint(0, 21, (B, CROP, CROP)).astype(np.int32))
    sizes = jnp.asarray(np.full((B, 2), CROP, np.int32))
    key = jax.random.key(0)

    timeit("weak_aug",
           lambda i, l, s, k: common.weak_view(cfg, {"image": i, "label": l, "size": s}, k),
           img_u8, lab, sizes, key)
    x01 = jnp.zeros((B, CROP, CROP, 3), jnp.float32)
    timeit("strong_aug", lambda x, k: common.strong_view(cfg, x, k), x01, key)
    timeit("color_jitter_only",
           lambda x, k: jax.vmap(augment.color_jitter_single)(x, jax.random.split(k, B)),
           x01, key)
    timeit("blur_only", lambda x: augment.gaussian_blur(x, jnp.full((B,), 1.0), 51), x01)

    model = build_model(cfg)
    xbf = jnp.zeros((2 * B, CROP, CROP, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.key(0)}, xbf[:1], train=False)

    def fwd_bwd(params, x):
        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.grad(loss)(params)

    timeit("model_fwd_bwd", fwd_bwd, variables["params"], xbf)

    method = get_method("fixmatch_cutmix")
    state = method.init_state(cfg, model, jax.random.key(0), total_steps=100)
    step = method.make_train_step(cfg, model, total_steps=100)
    labb = {"image": img_u8, "label": lab, "size": sizes}
    unlabb = {"image": img_u8, "label": jnp.full_like(lab, 255), "size": sizes}
    timeit("full_step", step, state, labb, unlabb)


# ----------------------------------------------------------------------------
# trace: xplane summary (per-HLO-op device time)
# ----------------------------------------------------------------------------

_NUM = re.compile(r"\.\d+")


def _bucket(name: str) -> str:
    # 'fusion.123' -> 'fusion'; '.remat' suffixes grouped separately.
    remat = ".remat" in name
    base = _NUM.sub("", name).replace(".remat2", "").replace(".remat", "")
    return f"{base}(remat)" if remat else base


def cmd_trace(argv):
    ap = argparse.ArgumentParser(prog="profiler.py trace")
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true", help="don't bucket op names")
    ap.add_argument("--lines", action="store_true", help="list plane line names")
    ap.add_argument(
        "--line", default="",
        help="aggregate ONLY events on plane lines whose name contains this "
        "substring (e.g. 'XLA Ops' = the synchronous critical-path ops; "
        "async DMA lines overlap compute and double-count the step)")
    args = ap.parse_args(argv)

    # The tensorboard profile plugin's native converter is incompatible with
    # the installed TF wheel, so read the XSpace proto directly.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{args.logdir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        sys.exit(f"no xplane.pb under {args.logdir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())

    per_op = collections.Counter()
    per_line = collections.Counter()
    n = collections.Counter()
    for p in xs.planes:
        if "/device:TPU" not in p.name:
            continue
        for line in p.lines:
            if args.line and line.name != args.line:
                continue
            for ev in line.events:
                meta = p.event_metadata[ev.metadata_id]
                key = meta.name if args.raw else _bucket(meta.name)
                per_op[key] += ev.duration_ps
                n[key] += 1
                per_line[line.name] += ev.duration_ps

    if args.lines:
        for k, v in per_line.most_common():
            print(f"{v / 1e12 * 1e3:10.2f} ms  {k}")
        print()
    grand = sum(per_op.values())
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for k, v in per_op.most_common(args.top):
        print(f"{v / 1e12 * 1e3:10.2f} {100 * v / grand:6.2f} {n[k]:7d}  {k}")
    print(f"{grand / 1e12 * 1e3:10.2f} total-summed "
          "(all lines; overlapping lines double-count)")


# ----------------------------------------------------------------------------
# copies: rank copy ops in a config's compiled step HLO by shape class
# ----------------------------------------------------------------------------

def cmd_copies(argv):
    """Compile one config's train step and classify every `copy` instruction
    in the optimized HLO by its operand shape (weight-shaped = no batch dim /
    small, activation-shaped = batch-leading).  Distinguishes whether the
    config-5 copy tax is weight-layout processing (batch-independent) or
    activation relayouts (batch-scaling) — see BASELINE.md round-3 notes."""
    ap = argparse.ArgumentParser(prog="profiler.py copies")
    ap.add_argument("config")
    ap.add_argument("--set", action="append", default=[])
    ap.add_argument("--bl", type=int, default=2)
    ap.add_argument("--bu", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)

    import jax

    from semi_supervised_semantic_segmentation_tpu.config import (
        load_config,
        update_config,
    )
    from semi_supervised_semantic_segmentation_tpu.methods import get_method
    from semi_supervised_semantic_segmentation_tpu.models import build_model

    overrides = {"data.dataset": "synthetic", "model.pretrained": "",
                 "train.labeled_batch_size": args.bl,
                 "train.unlabeled_batch_size": max(args.bu, 1)}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = v
    cfg = update_config(load_config(args.config), overrides)
    crop, nc = cfg.data.crop_size, cfg.data.num_classes
    rng = np.random.RandomState(0)
    model = build_model(cfg)
    method = get_method(cfg.method.name)
    state = method.init_state(cfg, model, jax.random.key(0), 1000)
    lab = _mk_batch(args.bl, crop, nc, True, rng)
    a = (lab, _mk_batch(args.bu, crop, nc, False, rng)) if method.uses_unlabeled else (lab,)
    step = jax.jit(method.make_train_step(cfg, model, 1000), donate_argnums=0)
    txt = step.lower(state, *a).compile().as_text()

    # HLO text: `%name = bf16[4,256,256,48]{3,2,1,0:T(8,128)(2,1)S(1)} copy(...)`
    shape_re = re.compile(
        r"=\s*(\w+)\[([\d,]*)\](\{[^}]*\})?\s+(copy|copy-start)\(")
    batch = args.bl + max(args.bu, 1)
    counts = collections.Counter()
    bytes_by = collections.Counter()
    kind_bytes = collections.Counter()
    space = collections.Counter()
    DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "u8": 1,
          "f16": 2, "s8": 1}
    for m in shape_re.finditer(txt):
        dt, dims_s, layout, op = m.group(1), m.group(2), m.group(3) or "", m.group(4)
        dims = [int(d) for d in dims_s.split(",") if d] or [1]
        nbytes = DT.get(dt, 4)
        for d in dims:
            nbytes *= d
        key = f"{op} {dt}[{dims_s}]{layout}"
        counts[key] += 1
        bytes_by[key] += nbytes
        sp = re.search(r"S\((\d+)\)", layout)
        space[f"S({sp.group(1)})" if sp else "default"] += 1
        # classification: leading dim == step batch (or 2x for concat views)
        # -> activation; else weight/layout constant
        is_act = dims and dims[0] in (batch, args.bl, max(args.bu, 1), 2 * batch)
        kind_bytes["activation" if is_act else "weight/other"] += nbytes
    total = sum(bytes_by.values())
    print(f"copies: {sum(counts.values())} instructions, "
          f"{total / 1e6:.1f} MB total copied")
    for kind, b in kind_bytes.most_common():
        print(f"  {kind}: {b / 1e6:.1f} MB")
    for sp, c in space.most_common():
        print(f"  dest space {sp}: {c} copies")
    print(f"{'count':>6} {'MB':>9}  shape")
    for key, b in bytes_by.most_common(args.top):
        print(f"{counts[key]:6d} {b / 1e6:9.2f}  {key}")


COMMANDS = {
    "step": cmd_step,
    "components": cmd_components,
    "compile": cmd_compile,
    "trace": cmd_trace,
    "copies": cmd_copies,
}


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        sys.exit(f"usage: profiler.py {{{'|'.join(COMMANDS)}}} ...")
    COMMANDS[sys.argv[1]](sys.argv[2:])
