"""A/B the paired-symmetric network execution (BaseGAN.apply_paired:
G_AB/G_BA and D_A/D_B as ONE vmapped pass over stacked weights) inside the
fused CycleGAN-256 train step. Both orders in one process so relay warm-up
cancels (docs/benchmarks.md measurement notes). Median-of-segments timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(tag, paired, iters=10, segments=3):
    import jax
    from ganslate_tpu.nn.gans import base as gan_base
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    gan_base.PAIRED_APPLY = paired
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
          f"D_B={losses['D_B']:.4f} G={losses.get('G_AB', 0):.4f}", flush=True)


if __name__ == "__main__":
    run("unpaired#1", False)
    run("paired  #2", True)
    run("paired  #3", True)
    run("unpaired#4", False)
