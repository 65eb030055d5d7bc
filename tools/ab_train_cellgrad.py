"""A/B the cell-space to-cells data gradient (s2d_space.TO_CELLS_CELL_GRAD)
and the multi-step dispatch (train.steps_per_dispatch) on the fused
CycleGAN-256 train step. All variants in one process (relay warm-up
cancels). BIAS_INERT / PAD_BWD_ONEPASS stay at their defaults (on)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(tag, cell_grad, k_dispatch=1, pad_fwd=True, iters=12, segments=3):
    import jax
    from ganslate_tpu.nn import layers
    from ganslate_tpu.ops import s2d_space as sp
    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    sp.TO_CELLS_CELL_GRAD = cell_grad
    layers.PAD_FWD_ONEPASS = pad_fwd
    conf = make_cyclegan_conf(batch_size=16, image_size=256,
                              mixed_precision=True, n_iters=10_000)
    conf.train.gan.generator.use_cells_boundary = True
    conf.train.steps_per_dispatch = k_dispatch
    rng = np.random.default_rng(0)
    batch = {k: rng.uniform(-1, 1, (16, 256, 256, 3)).astype(np.float32)
             for k in ("A", "B")}
    model = build_gan(conf)
    model.setup(example_batch=batch)

    def step_chunk():
        if k_dispatch > 1:
            model.set_input_multi([batch] * k_dispatch)
        else:
            model.set_input(batch)
        model.optimize_parameters()

    for _ in range(3):
        step_chunk()
    losses = {k: float(jax.device_get(v)) for k, v in model.losses.items()}
    times = []
    n_chunks = max(1, iters // k_dispatch)
    for _ in range(segments):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            step_chunk()
        [float(jax.device_get(v)) for v in model.losses.values()]
        times.append((time.perf_counter() - t0) / (n_chunks * k_dispatch))
    dt = float(np.median(times))
    print(f"{tag}: {16 / dt:.1f} img/s ({dt * 1e3:.1f} ms/step) "
          f"D_B={losses['D_B']:.4f}", flush=True)


if __name__ == "__main__":
    run("all-on     #1", True)
    run("nocellgrad #2", False)
    run("nopadfwd   #3", True, pad_fwd=False)
    run("all-on     #4", True)
    run("k4         #5", True, k_dispatch=4)
    run("k8         #6", True, k_dispatch=8)
