"""A/B the fused CycleGAN-256 train step with use_cells_boundary on/off.

The boundary-cells mode re-expresses the three lane-starved network-edge
convs (stem c7s1-64, down0, head c7s1-3) as stride-2 cell-space convs
(ops/s2d_space.py to-cells/from-cells) — measured 3x on the convs in
isolation (tools/profile_train8.py); this measures the real fused step.
"""

import time

import numpy as np


def run(use_cells_boundary: bool, batch_size=16, image_size=256,
        warmup=3, iters=20):
    import jax

    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    conf = make_cyclegan_conf(batch_size=batch_size, image_size=image_size,
                              mixed_precision=True, n_iters=10_000)
    conf.train.gan.generator.use_cells_boundary = use_cells_boundary

    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (batch_size, image_size, image_size, 3)).astype(np.float32),
        "B": rng.uniform(-1, 1, (batch_size, image_size, image_size, 3)).astype(np.float32),
    }
    model = build_gan(conf)
    model.setup(example_batch=batch)
    model.set_input(batch)
    for _ in range(warmup):
        model.optimize_parameters()
    [float(jax.device_get(v)) for v in model.losses.values()]
    start = time.perf_counter()
    for _ in range(iters):
        model.optimize_parameters()
    losses = [float(jax.device_get(v)) for v in model.losses.values()]
    elapsed = time.perf_counter() - start
    step = elapsed / iters
    print(f"cells_boundary={use_cells_boundary}: {step * 1e3:.1f} ms/step, "
          f"{batch_size / step:.2f} img/s  losses={[round(v, 4) for v in losses]}",
          flush=True)
    return step


if __name__ == "__main__":
    a = run(False)
    b = run(True)
    print(f"speedup: {a / b:.3f}x", flush=True)
