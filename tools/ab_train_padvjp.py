"""A/B the custom pad_spatial VJP inside the fused CycleGAN-256 train step.
Both orders in one process (relay warm-up cancels, docs/benchmarks.md)."""

import time

import numpy as np


def run(tag, custom, iters=15):
    import jax
    from ganslate_tpu.nn import layers
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    layers.PAD_CUSTOM_VJP = custom
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
          f"G_AB={losses['G_AB']:.4f}", flush=True)


if __name__ == "__main__":
    run("autodiff#1", False)
    run("custom  #2", True)
    run("custom  #3", True)
    run("autodiff#4", False)
