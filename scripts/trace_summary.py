"""Summarize a jax.profiler xplane trace: per-HLO-op time on the TPU plane.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python scripts/trace_summary.py /tmp/trace5 [--top 40] [--by-prefix]

The tensorboard profile plugin's native converter is incompatible with the
installed TF wheel, so this reads the XSpace proto directly (TPU device
plane, XEvent durations aggregated by event name) — enough to rank where
the step time actually goes.
"""

import argparse
import collections
import glob
import re
import sys


def load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        sys.exit(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    return xs


def tpu_events(xs):
    """Yield (name, duration_ps, line_name) for every event on TPU planes."""
    for p in xs.planes:
        if "/device:TPU" not in p.name:
            continue
        for line in p.lines:
            for ev in line.events:
                meta = p.event_metadata[ev.metadata_id]
                yield meta.name, ev.duration_ps, line.name


# Strip fusion/op-instance suffixes to group repeated ops: 'fusion.123' ->
# 'fusion', 'convolution.45.remat2' -> 'convolution(remat)'.
_NUM = re.compile(r"\.\d+")


def bucket(name: str) -> str:
    remat = ".remat" in name
    base = _NUM.sub("", name)
    base = base.replace(".remat2", "").replace(".remat", "")
    return f"{base}(remat)" if remat else base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true", help="don't bucket op names")
    ap.add_argument("--lines", action="store_true", help="list plane line names")
    args = ap.parse_args()

    xs = load_xspace(args.logdir)
    per_op = collections.Counter()
    per_line = collections.Counter()
    n = collections.Counter()
    for name, dur, line_name in tpu_events(xs):
        key = name if args.raw else bucket(name)
        per_op[key] += dur
        n[key] += 1
        per_line[line_name] += dur

    if args.lines:
        for k, v in per_line.most_common():
            print(f"{v / 1e12 * 1e3:10.2f} ms  {k}")
        print()
    total = sum(per_line.values()) / max(len(per_line), 1)  # per-line ~ total
    grand = sum(per_op.values())
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for k, v in per_op.most_common(args.top):
        print(f"{v / 1e12 * 1e3:10.2f} {100 * v / grand:6.2f} {n[k]:7d}  {k}")
    print(f"{grand / 1e12 * 1e3:10.2f} total-summed (all lines; overlapping lines double-count)")


if __name__ == "__main__":
    main()
