"""Capture a jax.profiler trace of a hot path (fused CycleGAN-256 train
step or the V-Net sliding-window call) and print per-op and per-category
time breakdowns from the xplane proto.

Usage:
  python tools/profile.py train                      # capture + dump
  python tools/profile.py sw --variant "x:sw_batch=14"
  python tools/profile.py agg /tmp/trace_sw_123      # re-dump an old trace

Subjects, variant spec, and builders are shared with tools/ab.py (one
TAG[:key=val,...] with perf flags from ganslate_tpu/flags.py + subject
knobs). The deeper HLO-join attribution (per-fusion categories matched to
compiled HLO text) lives in tools/attribute_train.py.
"""

import argparse
import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab import SUBJECTS, parse_variants  # noqa: E402

# Spatial grids of the BRaTS V-Net levels / CycleGAN-256 stages, used to
# bucket op names in the category table.
_GRIDS = ("32,176,176", "16,88,88", "8,44,44", "4,22,22", "2,11,11",
          "256,256", "128,128", "64,64")


def capture(subject, variant, reps):
    from ganslate_tpu import flags
    builder, knob_defaults, _ = SUBJECTS[subject]
    [(tag, flag_over, knobs)] = parse_variants([variant], knob_defaults)
    trace_dir = f"/tmp/trace_{subject}_{tag}_{int(time.time())}"
    with flags.override(**flag_over):
        run_once, fence, _ = builder(knobs)
        for _ in range(3):
            run_once()
        fence()
    import jax
    jax.profiler.start_trace(trace_dir)
    for _ in range(reps):
        run_once()
    fence()
    jax.profiler.stop_trace()
    return trace_dir, reps


def dump(trace_dir, reps=1, top=40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no xplane under {trace_dir}")
    xplane = max(files, key=os.path.getmtime)
    print("xplane:", xplane)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "TensorCore" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name or "Async" in line.name:
                continue
            per_op = defaultdict(float)
            op_cnt = defaultdict(int)
            cat = defaultdict(float)
            cat_cnt = defaultdict(int)
            total = 0.0
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                ms = ev.duration_ps / 1e9 / reps
                total += ms
                per_op[name] += ms
                op_cnt[name] += 1
                kind = re.match(r"%?([a-zA-Z_\-]+)", name).group(1)
                grid = next((g for g in _GRIDS if g in name), "?")
                cat[(kind, grid)] += ms
                cat_cnt[(kind, grid)] += 1
            if total < 0.5:
                continue
            print(f"\n=== plane {plane.name} line {line.name}: "
                  f"total {total:.1f} ms/call (/{reps} reps)")
            print("-- by (op kind, grid):")
            for (kind, grid), ms in sorted(cat.items(), key=lambda kv: -kv[1]):
                if ms < total * 0.005:
                    continue
                print(f"  {ms:9.2f} ms x{cat_cnt[(kind, grid)]:<4d} "
                      f"{kind:28s} grid {grid}")
            print(f"-- top {top} ops:")
            for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ms:9.2f} ms x{op_cnt[name]:<4d} {name[:110]}")


def main():
    from ganslate_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("subject", choices=[*SUBJECTS, "agg"])
    ap.add_argument("trace_dir", nargs="?",
                    help="existing trace dir (subject 'agg')")
    ap.add_argument("--variant", default="base", help="TAG[:key=val,...]")
    ap.add_argument("--reps", type=int, default=3,
                    help="calls inside the trace window")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if args.subject == "agg":
        if not args.trace_dir:
            raise SystemExit("agg needs a trace dir")
        dump(args.trace_dir, reps=1, top=args.top)
        return
    trace_dir, reps = capture(args.subject, args.variant, args.reps)
    print("trace dir:", trace_dir)
    dump(trace_dir, reps=reps, top=args.top)


if __name__ == "__main__":
    main()
