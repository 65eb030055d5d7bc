"""End-to-end sliding-window SERVING benchmark: volumes start and end as
host numpy arrays (the reference's Inferer loop pays the same transfers,
/root/reference/ganslate/engines/inferer.py:35-62). Measures:

1. device-resident (the bench.py number — upper bound),
2. naive serial host-in/host-out (put -> compute -> get per volume),
3. pipelined host-in/host-out: JAX dispatch is async, so enqueueing
   volume i+1's H2D+compute while volume i's D2H drains overlaps
   transfer with compute without threads —
   in BOTH wire formats: bf16 (the serving default,
   engines/base.py:_to_wire — the network computes bf16 anyway, so the
   input down-cast is bit-identical and only sub-bf16 bits of the fp32
   blend are lost on the way back) and fp32 (full-precision wire).

Prints a JSON line with all vols/s plus measured H2D/D2H rates so the
transfer share is auditable (this environment reaches the chip through
a remote relay; on-host TPU serving pays PCIe-class rates instead).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_vols=8, pipeline_depth=2):
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from ganslate_tpu.nn.generators import Vnet3D
    from ganslate_tpu.nn.layers import precompute_s2d_kernels
    from ganslate_tpu.utils import compile_cache
    from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

    compile_cache.enable()

    roi = (32, 176, 176)
    vol_shape = (2, 155, 240, 240, 1)   # 2 volumes per call (bench.py)

    model = Vnet3D(in_channels=1, out_channels=1,
                   down_blocks=(2, 2, 3), up_blocks=(3, 3, 3),
                   use_memory_saving=False, use_inverse=False,
                   use_s2d_exec=True)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, *roi, 1), jnp.bfloat16))["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
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
    host_f32 = [rng.uniform(-1, 1, vol_shape).astype(np.float32)
                for _ in range(n_vols)]
    host_bf16 = [v.astype(ml_dtypes.bfloat16) for v in host_f32]
    vols_per_call = vol_shape[0]

    def run_pipelined(host_vols, out_cast):
        t0 = time.perf_counter()
        inflight, results = [], []
        for hv in host_vols:
            res = inferer(jax.device_put(hv), network, pc)
            inflight.append(out_cast(res))
            if len(inflight) > pipeline_depth:
                results.append(np.asarray(inflight.pop(0)))
        while inflight:
            results.append(np.asarray(inflight.pop(0)))
        per_call = (time.perf_counter() - t0) / len(host_vols)
        return vols_per_call / per_call, results

    # Compile + warm BOTH input-dtype programs (the inferer caches compiled
    # programs keyed on input dtype; an unwarmed fp32 program would put its
    # compile/cache-load inside the fp32 timed region and inflate the
    # bf16-vs-fp32 comparison).
    dev0 = jax.device_put(host_bf16[0])
    out = inferer(dev0, network, pc)
    float(jax.device_get(out.ravel()[0]))
    out_f32_warm = inferer(jax.device_put(host_f32[0]), network, pc)
    float(jax.device_get(out_f32_warm.ravel()[0]))
    del out_f32_warm

    # --- transfer rate probes (through whatever transport backs the chip),
    # at the bf16 wire sizes.
    nbytes = host_bf16[0].nbytes
    t0 = time.perf_counter()
    d = jax.device_put(host_bf16[1])
    d.block_until_ready()
    h2d_s = time.perf_counter() - t0
    out_bf = out.astype(jnp.bfloat16)
    t0 = time.perf_counter()
    _ = np.asarray(out_bf)
    d2h_s = time.perf_counter() - t0
    out_bytes = out_bf.size * 2

    # --- mode 1: device-resident (what bench.py times).
    t0 = time.perf_counter()
    for _ in range(n_vols):
        out = inferer(dev0, network, pc)
        float(jax.device_get(out.ravel()[0]))
    dev_s = (time.perf_counter() - t0) / n_vols
    dev_vps = vols_per_call / dev_s

    # --- mode 2: serial host->host (bf16 wire).
    t0 = time.perf_counter()
    for hv in host_bf16:
        res = np.asarray(
            inferer(jax.device_put(hv), network, pc).astype(jnp.bfloat16))
    serial_s = (time.perf_counter() - t0) / n_vols
    serial_vps = vols_per_call / serial_s
    del res

    # --- mode 3: pipelined host->host, both wire formats.
    bf16_vps, bf16_results = run_pipelined(
        host_bf16, lambda r: r.astype(jnp.bfloat16))
    f32_vps, f32_results = run_pipelined(host_f32, lambda r: r)
    assert len(bf16_results) == n_vols
    assert bf16_results[0].shape[0] == vols_per_call
    # Wire-format parity: the bf16-wire prediction must match the fp32-wire
    # one to bf16 tolerance (the networks' compute is bf16 either way).
    np.testing.assert_allclose(
        bf16_results[0].astype(np.float32), f32_results[0],
        rtol=2e-2, atol=2e-2)

    print(json.dumps({
        "device_resident_vols_per_sec": round(dev_vps, 3),
        "serial_host_vols_per_sec": round(serial_vps, 3),
        "pipelined_host_vols_per_sec_bf16_wire": round(bf16_vps, 3),
        "pipelined_host_vols_per_sec_fp32_wire": round(f32_vps, 3),
        "pipeline_depth": pipeline_depth,
        "h2d_gbps": round(nbytes / h2d_s / 1e9, 3),
        "d2h_gbps": round(out_bytes / d2h_s / 1e9, 3),
        "in_mb_per_call_bf16": round(nbytes / 1e6, 1),
        "out_mb_per_call_bf16": round(out_bytes / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
