"""Benchmark: CycleGAN-256 training throughput (images/sec/chip).

The reference publishes no numbers (BASELINE.md); the driver's north star is
">= 2x A100 images/sec/chip" for CycleGAN-256 (horse2zebra config: Resnet2D
9 blocks + 70x70 PatchGAN, LSGAN). We take 15 images/sec as a generous
estimate of the reference's eager PyTorch pipeline on A100 (its iteration is
6 G + 4 D conv forwards + 2 backwards dispatched op-by-op from Python,
/root/reference/ganslate/nn/gans/unpaired/cyclegan.py:92-214), so
vs_baseline = images_per_sec / 30.0 means 1.0 == the 2x-A100 target.

Runs the REAL fused train step (G+D updates, pools, metrics) in bf16 on
synthetic data — pure device throughput, no IO.
"""

import json
import time

import numpy as np


def main():
    import jax

    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    batch_size = 16  # best measured throughput on v5e (batch sweep 8/16/32)
    image_size = 256
    warmup, iters = 3, 20

    conf = make_cyclegan_conf(batch_size=batch_size, image_size=image_size,
                              mixed_precision=True, n_iters=10_000)

    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (batch_size, image_size, image_size, 3)).astype(np.float32),
        "B": rng.uniform(-1, 1, (batch_size, image_size, image_size, 3)).astype(np.float32),
    }

    model = build_gan(conf)
    model.setup(example_batch=batch)
    model.set_input(batch)

    def fence():
        # Host read of a value that depends on the full step: the only
        # reliable execution fence on relay-backed PJRT transports
        # (block_until_ready can return early there).
        return [float(jax.device_get(v)) for v in model.losses.values()]

    for _ in range(warmup):
        model.optimize_parameters()
    fence()

    start = time.perf_counter()
    for _ in range(iters):
        model.optimize_parameters()
    fence()
    elapsed = time.perf_counter() - start

    n_chips = jax.device_count()
    images_per_sec = batch_size * iters / elapsed / n_chips
    print(json.dumps({
        "metric": "cyclegan256_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
