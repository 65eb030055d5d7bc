"""Minimal repro for the sliding-window conv+stat TUPLE-FUSION layout
conflict (docs/benchmarks.md, sliding-window roofline item 5).

The claim under test: in the s2d V-Net's level-0 layers, XLA fuses the conv
with its instance-norm stat reductions into ONE tuple fusion whose layout
assignment prefers the reduction-friendly activation layout; the NEXT conv
prefers spatial sublanes, so XLA materializes a full-activation layout
round-trip per layer (~5.5 ms on the (56,16,88,88,128) cell activations).
The conflict lives inside XLA's layout assignment for tuple fusions — it is
not reachable from JAX program structure except by FORBIDDING the fusion
(jax.lax.optimization_barrier between the conv output and the stat sums,
`flags.s2d_stat_split`), which trades the round-trip write+read for one
extra full read of the activations from the conv's own layout.

This script measures exactly that trade at the real shapes, in isolation:

    layer(x) = prelu(group_instance_norm(conv3^3(x)))   repeated L times

slope-timed (T(L2) - T(L1)) / (L2 - L1) with distinct weights per layer (no
CSE), fused vs split, and dumps per-variant compiled-HLO fusion/copy
statistics so the layout copies are visible in the artifact, not just the
wall clock.

Usage:  python tools/repro_layout_conflict.py [--windows 56] [--l1 2 --l2 4]
Writes: /tmp/layout_conflict_{fused,split}.hlo.txt and prints the table.
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_chain(n_layers, channels, rn, key0=0):
    import jax
    import jax.numpy as jnp

    from ganslate_tpu.ops.s2d_space import group_instance_norm

    lanes = channels * rn

    def chain(x, weights, slopes):
        for w, s in zip(weights, slopes):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
            y = jax.lax.conv_general_dilated(x, w, (1, 1, 1),
                                             [(1, 1)] * 3,
                                             dimension_numbers=dn)
            x = group_instance_norm(y, channels, rn, activation="prelu",
                                    prelu_slope=s).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    rng = np.random.default_rng(key0)
    weights = [jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, lanes, lanes))
                           .astype(np.float32), jnp.bfloat16)
               for _ in range(n_layers)]
    slopes = [jnp.asarray(rng.uniform(0.1, 0.3, (channels,))
                          .astype(np.float32)) for _ in range(n_layers)]
    return chain, weights, slopes


def hlo_stats(text):
    """Fusion-level statistics of a compiled HLO dump: counts and total
    bytes of copy/transpose fusions touching the big activation shape."""
    copies = re.findall(r"(copy|transpose)[^\n]*bf16\[(\d+(?:,\d+)+)\]", text)
    tuple_fusions = len(re.findall(r"fusion[^\n]*tuple\(", text))
    big_bytes = 0
    for _, dims in copies:
        n = int(np.prod([int(d) for d in dims.split(",")]))
        big_bytes += 2 * n
    return {"copy/transpose sites": len(copies),
            "copied bytes (MB)": round(big_bytes / 1e6, 1),
            "tuple fusions": tuple_fusions}


def run_variant(tag, split, windows, l1, l2, channels=16, rn=8):
    import jax
    import jax.numpy as jnp

    from ganslate_tpu import flags

    shape = (windows, 16, 88, 88, channels * rn)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32), jnp.bfloat16)

    results = {}
    with flags.override(s2d_stat_split=split):
        for n_layers in (l1, l2):
            chain, weights, slopes = build_chain(n_layers, channels, rn)
            fn = jax.jit(lambda x, w, s: chain(x, w, s))
            lowered = fn.lower(x, weights, slopes)
            compiled = lowered.compile()
            if n_layers == l2:
                hlo = compiled.as_text()
                path = f"/tmp/layout_conflict_{tag}.hlo.txt"
                with open(path, "w") as f:
                    f.write(hlo)
                results["hlo"] = hlo_stats(hlo)
                results["hlo_path"] = path
            # Fence with a scalar read (relay transport; see bench.py).
            float(jax.device_get(fn(x, weights, slopes)))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jax.device_get(fn(x, weights, slopes)))
                times.append(time.perf_counter() - t0)
            results[n_layers] = float(np.median(times))
    per_layer = (results[l2] - results[l1]) / (l2 - l1)
    results["per_layer_ms"] = per_layer * 1e3
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=56)
    ap.add_argument("--l1", type=int, default=2)
    ap.add_argument("--l2", type=int, default=4)
    args = ap.parse_args()

    for tag, split in (("fused", False), ("split", True)):
        r = run_variant(tag, split, args.windows, args.l1, args.l2)
        print(f"-- {tag} (s2d_stat_split={split}):")
        print(f"   per-layer slope: {r['per_layer_ms']:.2f} ms "
              f"(T({args.l1})={r[args.l1]*1e3:.1f} ms, "
              f"T({args.l2})={r[args.l2]*1e3:.1f} ms)")
        print(f"   HLO ({r['hlo_path']}): {r['hlo']}")


if __name__ == "__main__":
    main()
