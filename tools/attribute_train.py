"""Train-step attribution: join a jax.profiler trace of the fused
CycleGAN-256 step with the compiled HLO, categorize every fusion by what it
computes (conv / conv-grad / stats / copy / elementwise / ...), and print a
per-category + per-op table in ms/step. This is the train-side counterpart
of the sliding-window trace attribution in docs/benchmarks.md.

Usage: python tools/attribute_train.py [--steps 3]
"""

import glob
import os
import re
import sys
import time
from collections import defaultdict

# Run as a script from anywhere; PYTHONPATH must stay untouched (it breaks
# the axon PJRT plugin registration in this environment).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 3


def build_model():
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    conf = make_cyclegan_conf(batch_size=16, image_size=256,
                              mixed_precision=True, n_iters=10_000)
    conf.train.gan.generator.use_cells_boundary = True
    rng = np.random.default_rng(0)
    batch = {k: rng.uniform(-1, 1, (16, 256, 256, 3)).astype(np.float32)
             for k in ("A", "B")}
    model = build_gan(conf)
    model.setup(example_batch=batch)
    model.set_input(batch)
    return model


def dump_hlo(model, path):
    import jax
    compiled = jax.jit(model.make_train_step()).lower(
        model.state, model._batch).compile()
    text = compiled.as_text()
    with open(path, "w") as f:
        f.write(text)
    return text


def capture(model, trace_dir):
    import jax
    for _ in range(3):
        model.optimize_parameters()
    [float(jax.device_get(v)) for v in model.losses.values()]
    jax.profiler.start_trace(trace_dir)
    for _ in range(STEPS):
        model.optimize_parameters()
    [float(jax.device_get(v)) for v in model.losses.values()]
    jax.profiler.stop_trace()


def parse_fusion_bodies(hlo_text):
    """Map computation name -> set of interesting op kinds inside it, plus
    fusion instruction name -> (computation, output shape string)."""
    comp_ops = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"%?([\w.\-]+)\s*(\([^)]*\))?\s*->.*{$", line.strip())
        mm = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s*\(", line.strip())
        if line.rstrip().endswith("{") and mm:
            cur = mm.group(2)
            comp_ops[cur] = set()
            continue
        if cur is None:
            continue
        if line.strip().startswith("}"):
            cur = None
            continue
        om = re.search(r"=\s*[\w\[\],{}():/#\s]*?\b"
                       r"(convolution|dot|copy|transpose|reduce-window|"
                       r"reduce|select|compare|scatter|gather|reverse|pad|"
                       r"dynamic-update-slice|dynamic-slice|concatenate|"
                       r"broadcast|iota|rng|sort|exponential|divide|"
                       r"multiply|add|subtract|maximum|minimum)\(", line)
        if om:
            comp_ops[cur].add(om.group(1))

    fusion_info = {}
    for line in hlo_text.splitlines():
        # Output type is either a single shape or a TUPLE "(shape, shape)" —
        # tuple types contain spaces, so match them explicitly.
        fm = re.search(r"%([\w.\-]+) = (.+?) fusion\(.*"
                       r"calls=%?([\w.\-]+)", line)
        if fm:
            fusion_info[fm.group(1)] = (fm.group(3), fm.group(2))
    return comp_ops, fusion_info


CATEGORY_ORDER = ["conv", "conv+stats", "dot", "copy/transpose", "pad-bwd",
                  "stats/reduce", "select/elementwise", "dus/slice",
                  "gather/scatter", "rng", "other"]


def categorize(ops):
    if "convolution" in ops:
        if "reduce" in ops or "divide" in ops:
            return "conv+stats"
        return "conv"
    if "dot" in ops:
        return "dot"
    if "copy" in ops or "transpose" in ops:
        return "copy/transpose"
    if "reverse" in ops:
        return "pad-bwd"
    if "scatter" in ops or "gather" in ops:
        return "gather/scatter"
    if "dynamic-update-slice" in ops or "dynamic-slice" in ops:
        return "dus/slice"
    if "reduce" in ops:
        return "stats/reduce"
    if "rng" in ops:
        return "rng"
    if "select" in ops or "compare" in ops or "multiply" in ops \
            or "add" in ops or "divide" in ops:
        return "select/elementwise"
    return "other"


def attribute(trace_dir, hlo_text, top=45):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    xs = xplane_pb2.XSpace()
    with open(max(files, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())

    comp_ops, fusion_info = parse_fusion_bodies(hlo_text)

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9 / STEPS  # ms/step
                cnt[name] += 1
            total = sum(per_op.values())
            print(f"== XLA Ops: {total:.1f} ms/step over {len(per_op)} ops")

            cats = defaultdict(float)
            rows = []
            for name, ms in per_op.items():
                m = re.match(r"%?([\w.\-]+)", name)
                short = m.group(1) if m else name
                kind = re.match(r"([a-zA-Z_\-]+)", short).group(1)
                if short in fusion_info:
                    comp, out_shape = fusion_info[short]
                    cat = categorize(comp_ops.get(comp, set()))
                else:
                    out_m = re.search(r"= (\S+?) ", name)
                    out_shape = out_m.group(1) if out_m else "?"
                    cat = {"convolution": "conv", "copy": "copy/transpose",
                           "transpose": "copy/transpose",
                           "reverse": "pad-bwd", "select": "select/elementwise",
                           "reduce": "stats/reduce",
                           "dynamic-update-slice": "dus/slice",
                           }.get(kind, "other")
                cats[cat] += ms
                rows.append((ms, short, cat, out_shape, cnt[name]))

            print("\n-- by category (ms/step):")
            for cat in sorted(cats, key=lambda c: -cats[c]):
                print(f"  {cats[cat]:8.2f} ms  {100 * cats[cat] / total:5.1f}%  {cat}")

            print(f"\n-- top {top} ops (ms/step):")
            for ms, short, cat, out_shape, c in sorted(rows)[::-1][:top]:
                print(f"  {ms:7.2f} ms  x{c//STEPS:<3d} {cat:18s} {short:32s} {out_shape[:60]}")
            return


if __name__ == "__main__":
    if "--agg-only" in sys.argv:
        trace_dir, hlo_path = sys.argv[2], sys.argv[3]
        attribute(trace_dir, open(hlo_path).read())
        sys.exit(0)
    from ganslate_tpu.utils import compile_cache
    compile_cache.enable()
    model = build_model()
    hlo_text = dump_hlo(model, "/tmp/train_step_hlo.txt")
    trace_dir = f"/tmp/attr_train_{int(time.time())}"
    capture(model, trace_dir)
    print("trace:", trace_dir, " hlo: /tmp/train_step_hlo.txt")
    attribute(trace_dir, hlo_text)
