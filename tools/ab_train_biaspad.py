"""A/B the inert-bias skip (layers.BIAS_INERT) and the one-pass pad
backward (layers.PAD_BWD_ONEPASS) inside the fused CycleGAN-256 train step.
All variants in one process (relay warm-up cancels); the hand-rolled
reflect pad forward is active in every variant (compare the 'off' row with
the pre-change baseline for its isolated effect)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(tag, bias_inert, pad_onepass, iters=10, segments=3):
    import jax
    from ganslate_tpu.nn import layers
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    layers.BIAS_INERT = bias_inert
    layers.PAD_BWD_ONEPASS = pad_onepass
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
    losses = {k: float(jax.device_get(v)) for k, v in model.losses.items()}
    times = []
    for _ in range(segments):
        t0 = time.perf_counter()
        for _ in range(iters):
            model.optimize_parameters()
        [float(jax.device_get(v)) for v in model.losses.values()]
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    print(f"{tag}: {16 / dt:.1f} img/s ({dt * 1e3:.1f} ms/step) "
          f"D_B={losses['D_B']:.4f}", flush=True)


if __name__ == "__main__":
    run("off     #1", False, False)
    run("pad     #2", False, True)
    run("bias    #3", True, False)
    run("both    #4", True, True)
    run("both    #5", True, True)
    run("off     #6", False, False)
