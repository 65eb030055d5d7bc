"""Interleaved A/B harness for the two hot paths (train step, sliding
window). Build all variants up-front, then time them in round-robin
segments so slow drift in the relay/chip (observed ±3x over tens of
minutes) cancels out of the comparison; report per-variant medians.

Usage:
  python tools/ab.py train --variant base --variant "nobias:bias_inert=False"
  python tools/ab.py sw --variant base --variant "nocache:kcache=False"
  python tools/ab.py sw --variant "v1:vols=1" --variant "v2:vols=2"

Variant spec: ``TAG[:key=val,key=val...]`` (values are Python literals).
Keys naming perf flags (see ganslate_tpu/flags.py) are applied via
``flags.override`` around that variant's BUILD + compile — flags are read
at trace time, so each compiled variant keeps its own program. Other keys
are subject knobs:

  train: batch=16  size=256  cells=True (use_cells_boundary)
         k=1 (steps_per_dispatch)
  sw:    vols=2  sw_batch=28  s2d=True (s2d execution space)
         kcache=True (precomputed s2d kernels)  memsave=False
         overlap=0.25

This replaces the per-experiment ab_* forks that accumulated through
rounds 1-3 (one file per flag); their measured results live in
docs/benchmarks.md and ganslate_tpu/flags.py.
"""

import argparse
import ast
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_KNOBS = {"batch": 16, "size": 256, "cells": True, "k": 1}
SW_KNOBS = {"vols": 2, "sw_batch": 28, "s2d": True, "kcache": True,
            "memsave": False, "overlap": 0.25}


def parse_variants(specs, subject_knobs):
    from ganslate_tpu import flags
    flag_names = {f.name for f in __import__("dataclasses").fields(flags.PerfFlags)}
    variants = []
    for spec in specs:
        tag, _, body = spec.partition(":")
        flag_over, knobs = {}, dict(subject_knobs)
        if body:
            for kv in body.split(","):
                key, _, val = kv.partition("=")
                key, val = key.strip(), ast.literal_eval(val.strip())
                if key in flag_names:
                    flag_over[key] = val
                elif key in subject_knobs:
                    knobs[key] = val
                else:
                    raise SystemExit(
                        f"unknown key {key!r}; perf flags: {sorted(flag_names)}; "
                        f"subject knobs: {sorted(subject_knobs)}")
        variants.append((tag, flag_over, knobs))
    return variants


# ------------------------------------------------------------------ subjects


def build_train(knobs):
    """Fused CycleGAN-256 train step; returns (run_once, fence)."""
    import jax
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    b, s = knobs["batch"], knobs["size"]
    conf = make_cyclegan_conf(batch_size=b, image_size=s,
                              mixed_precision=True, n_iters=10_000)
    conf.train.gan.generator.use_cells_boundary = knobs["cells"]
    conf.train.steps_per_dispatch = knobs["k"]
    rng = np.random.default_rng(0)
    batches = [{key: rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
                for key in ("A", "B")} for _ in range(knobs["k"])]
    model = build_gan(conf)
    model.setup(example_batch=batches[0])
    if knobs["k"] > 1:
        model.set_input_multi(batches)
    else:
        model.set_input(batches[0])

    def fence():
        [float(jax.device_get(v)) for v in model.losses.values()]

    # images per run_once call (for the report rate)
    return model.optimize_parameters, fence, b * knobs["k"]


def build_sw(knobs):
    """V-Net BRaTS sliding-window call; returns (run_once, fence, vols)."""
    import jax
    import jax.numpy as jnp
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

    roi = (32, 176, 176)
    model = Vnet3D(in_channels=1, out_channels=1,
                   down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                   use_memory_saving=knobs["memsave"], use_inverse=False,
                   use_s2d_exec=knobs["s2d"])
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, *roi, 1), jnp.bfloat16))["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    if knobs["kcache"] and knobs["s2d"]:
        from ganslate_tpu.nn.layers import precompute_s2d_kernels
        cache = precompute_s2d_kernels(model, params,
                                       jnp.zeros((1, *roi, 1), jnp.bfloat16))
        pc = {"params": params, "s2d_kernels": cache}

        def network(p, x):
            return model.apply({"params": p["params"],
                                "s2d_kernels": p["s2d_kernels"]},
                               x.astype(jnp.bfloat16))
    else:
        pc = params

        def network(p, x):
            return model.apply({"params": p}, x.astype(jnp.bfloat16))

    inferer = SlidingWindowInferer(roi_size=roi,
                                   sw_batch_size=knobs["sw_batch"],
                                   overlap=knobs["overlap"], mode="gaussian")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(
        -1, 1, (knobs["vols"], 155, 240, 240, 1)).astype(np.float32))

    state = {}

    def run_once():
        state["out"] = inferer(vol, network, pc)

    def fence():
        float(jax.device_get(state["out"].ravel()[0]))

    return run_once, fence, knobs["vols"]


SUBJECTS = {"train": (build_train, TRAIN_KNOBS, "img/s"),
            "sw": (build_sw, SW_KNOBS, "vols/s")}


def main():
    from ganslate_tpu.utils import compile_cache
    compile_cache.enable()
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("subject", choices=SUBJECTS)
    ap.add_argument("--variant", action="append", default=[],
                    help="TAG[:key=val,...] — repeatable; default 'base'")
    ap.add_argument("--iters", type=int, default=10,
                    help="calls per segment")
    ap.add_argument("--rounds", type=int, default=5,
                    help="round-robin segments")
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from ganslate_tpu import flags
    builder, knob_defaults, unit = SUBJECTS[args.subject]
    variants = parse_variants(args.variant or ["base"], knob_defaults)

    built = []
    for tag, flag_over, knobs in variants:
        t0 = time.perf_counter()
        with flags.override(**flag_over):
            run_once, fence, per_call = builder(knobs)
            for _ in range(args.warmup):   # compile inside the override
                run_once()
            fence()
        print(f"built {tag} in {time.perf_counter() - t0:.0f}s "
              f"(flags={flag_over or '{}'} knobs={ {k: v for k, v in knobs.items() if v != knob_defaults[k]} or '{}'})",
              flush=True)
        built.append((tag, run_once, fence, per_call))

    times = {tag: [] for tag, *_ in built}
    for r in range(args.rounds):
        for tag, run_once, fence, per_call in built:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                run_once()
            fence()
            times[tag].append((time.perf_counter() - t0) / args.iters)
        print(f"round {r}: " + "  ".join(
            f"{tag}={per_call / times[tag][-1]:.2f}"
            for tag, _, _, per_call in built), flush=True)

    print(f"--- medians over {args.rounds} rounds ({unit}):")
    for tag, _, _, per_call in built:
        dt = float(np.median(times[tag]))
        spread = (max(times[tag]) - min(times[tag])) / dt * 100
        print(f"{tag}: {per_call / dt:.2f} {unit} ({dt * 1e3:.1f} ms/call, "
              f"spread {spread:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
