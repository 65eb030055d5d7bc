"""Model summaries: per-layer parameter tables for each network of a GAN.

Reference parity: /root/reference/ganslate/utils/summary.py (a vendored
torchsummary producing per-layer shape/param tables + `gan_summary`). The JAX
version walks the parameter pytree — no forward pass needed, so it works for
any input size and costs nothing.
"""

from typing import Any, Dict

import numpy as np

import jax


def _format_count(n: int) -> str:
    return f"{n:,}"


def network_summary(name: str, params: Dict[str, Any]) -> str:
    """Per-layer table of one network's parameters."""
    lines = [
        "-" * 72,
        f"Network: {name}",
        "-" * 72,
        f"{'Layer (path)':<44}{'Shape':<18}{'Params':>10}",
        "=" * 72,
    ]
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        path_str = "/".join(str(getattr(k, 'key', k)) for k in path)
        count = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += count
        lines.append(f"{path_str[:43]:<44}{str(tuple(leaf.shape)):<18}"
                     f"{_format_count(count):>10}")
    lines.append("=" * 72)
    size_mb = total * 4 / (1024 ** 2)
    lines.append(f"Total params: {_format_count(total)}  "
                 f"({size_mb:.2f} MB fp32)")
    lines.append("-" * 72)
    return "\n".join(lines)


def gan_summary(model) -> str:
    """Summaries for every network of a GAN model (one per unique class)."""
    if model.state is None:
        return "(model state not initialized; call setup() first)"
    seen_classes = set()
    parts = []
    totals = {}
    for name, params in model.state.params.items():
        totals[name] = sum(int(np.prod(p.shape))
                           for p in jax.tree_util.tree_leaves(params))
        cls = type(model.networks[name]).__name__
        if cls not in seen_classes:
            seen_classes.add(cls)
            parts.append(network_summary(f"{name} ({cls})", params))
    parts.append("Per-network parameter counts: " +
                 ", ".join(f"{k}: {_format_count(v)}" for k, v in totals.items()))
    return "\n".join(parts)
