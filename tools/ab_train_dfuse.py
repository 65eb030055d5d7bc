"""A/B the batched real/fake D forward (BaseGAN.apply_batched) inside the
fused CycleGAN-256 train step. Both orders in one process (relay warm-up
cancels, docs/benchmarks.md)."""

import time

import numpy as np


def run(tag, fused, iters=15):
    import jax
    from ganslate_tpu.nn.gans import base as gan_base
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    gan_base.FUSED_D_FORWARD = fused
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
    t0 = time.perf_counter()
    for _ in range(iters):
        model.optimize_parameters()
    [float(jax.device_get(v)) for v in model.losses.values()]
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {16 / dt:.1f} img/s ({dt * 1e3:.1f} ms/step) "
          f"D_B={losses['D_B']:.4f}", flush=True)


if __name__ == "__main__":
    run("unfused#1", False)
    run("fused  #2", True)
    run("fused  #3", True)
    run("unfused#4", False)
