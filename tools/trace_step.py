"""Capture a jax.profiler trace of the fused CycleGAN-256 train step (or the
sliding-window forward with --sw) and dump the per-op time breakdown.

Parses the xplane proto with tensorboard_plugin_profile if it can; otherwise
prints the trace dir for offline analysis.
"""

import glob
import os
import sys
import time

import numpy as np


def capture_train(trace_dir):
    import jax
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
    for _ in range(3):
        model.optimize_parameters()
    [float(jax.device_get(v)) for v in model.losses.values()]
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        model.optimize_parameters()
    [float(jax.device_get(v)) for v in model.losses.values()]
    jax.profiler.stop_trace()


def capture_sw(trace_dir):
    import jax
    import jax.numpy as jnp
    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

    roi = (32, 176, 176)
    model = Vnet3D(in_channels=1, out_channels=1,
                   down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                   use_memory_saving=False, use_inverse=False,
                   use_s2d_exec=True)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, *roi, 1), jnp.bfloat16))["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    # Mirror bench.py exactly: serving-time s2d kernel cache + raw bf16
    # predictions (the blend casts to fp32 at its weighted reads).
    from ganslate_tpu.nn.layers import precompute_s2d_kernels
    cache = precompute_s2d_kernels(model, params,
                                   jnp.zeros((1, *roi, 1), jnp.bfloat16))
    pc = {"params": params, "s2d_kernels": cache}

    def network(p, x):
        return model.apply(
            {"params": p["params"], "s2d_kernels": p["s2d_kernels"]},
            x.astype(jnp.bfloat16))

    inferer = SlidingWindowInferer(roi_size=roi, sw_batch_size=28,
                                   overlap=0.25, mode="gaussian")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(-1, 1, (2, 155, 240, 240, 1)).astype(np.float32))
    out = inferer(vol, network, pc)
    float(jax.device_get(out.ravel()[0]))
    jax.profiler.start_trace(trace_dir)
    out = inferer(vol, network, pc)
    float(jax.device_get(out.ravel()[0]))
    jax.profiler.stop_trace()


def dump_op_stats(trace_dir, top=40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print(f"no xplane under {trace_dir}; contents:")
        for f in glob.glob(os.path.join(trace_dir, "**"), recursive=True):
            print(" ", f)
        return
    xplane = max(files, key=os.path.getmtime)
    print("xplane:", xplane)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        print(f"--- plane: {plane.name}, lines={len(plane.lines)}")
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        # Aggregate event durations by event name per line.
        from collections import defaultdict
        for line in plane.lines:
            agg = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
            total = sum(agg.values())
            if total < 1.0:
                continue
            print(f"  line {line.name}: total {total:.1f} ms")
            for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                print(f"    {ms:9.2f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    mode = "sw" if "--sw" in sys.argv else "train"
    trace_dir = f"/tmp/trace_{mode}_{int(time.time())}"
    (capture_sw if mode == "sw" else capture_train)(trace_dir)
    dump_op_stats(trace_dir)
