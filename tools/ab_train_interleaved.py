"""Interleaved A/B for the fused CycleGAN-256 step: build all variants
up-front, then time them in round-robin segments so slow drift in the
relay/chip (observed ±3x over tens of minutes) cancels out of the
comparison. Reports per-variant medians over all segments."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = [
    # (tag, {module flag overrides applied at BUILD time})
    ("stopgrad-bias", {}),
    ("full-bias    ", {"bias_inert": False}),
]


def build(overrides):
    import jax
    from ganslate_tpu.nn import layers
    from ganslate_tpu.ops import s2d_space as sp
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    from ganslate_tpu.ops import transpose_grad as tg
    sp.TO_CELLS_CELL_GRAD = overrides.get("cellgrad", True)
    layers.POLYPHASE_2D_DEFAULT = overrides.get("poly2d", False)
    tg.TRANSPOSE_CUSTOM_GRAD = overrides.get("tgrad",
                                             tg.TRANSPOSE_CUSTOM_GRAD)
    layers.BIAS_INERT = overrides.get("bias_inert", True)
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
    sp.TO_CELLS_CELL_GRAD = True
    layers.POLYPHASE_2D_DEFAULT = False
    layers.BIAS_INERT = True
    return model


def main(iters=10, rounds=5):
    import jax

    models = [(tag, build(ov)) for tag, ov in VARIANTS]
    times = {tag: [] for tag, _ in models}
    for r in range(rounds):
        for tag, model in models:
            t0 = time.perf_counter()
            for _ in range(iters):
                model.optimize_parameters()
            [float(jax.device_get(v)) for v in model.losses.values()]
            times[tag].append((time.perf_counter() - t0) / iters)
        print(f"round {r}: " + "  ".join(
            f"{tag.strip()}={16 / times[tag][-1]:.1f}" for tag, _ in models),
            flush=True)
    print("--- medians over rounds:")
    for tag, _ in models:
        dt = float(np.median(times[tag]))
        spread = (max(times[tag]) - min(times[tag])) / dt * 100
        print(f"{tag}: {16 / dt:.1f} img/s ({dt * 1e3:.1f} ms/step, "
              f"spread {spread:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
