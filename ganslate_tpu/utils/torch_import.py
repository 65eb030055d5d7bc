"""Torch-checkpoint importer: load reference (PyTorch) ganslate checkpoints
into this framework's parameter trees.

The reference saves `checkpoints/{iter}.pth` holding one `state_dict` per
network plus optimizer state (/root/reference/ganslate/nn/gans/base.py:226-251,
e.g. `{"G_AB": sd, "G_BA": sd, "D_A": sd, "D_B": sd, "optimizer_G": ...}`).
This module maps those onto `GANState.params` so fidelity parity
(SSIM/PSNR vs reference checkpoints) can be evaluated directly on TPU.

Design: a GENERIC order-based matcher instead of per-architecture key maps.
Both frameworks create parameters in forward order — torch's `state_dict`
preserves module-registration order (construction order == forward order in
every reference network), and on the flax side the true creation order is
recorded by intercepting `Module.param` during an abstract `eval_shape` init
(flax's params dict itself iterates alphabetically, which is NOT forward
order). So the k-th torch parameter corresponds to the k-th flax parameter,
and only the LAYOUT differs:

- Conv weight:            torch (O, I, *k)  -> flax (*k, I, O)
- ConvTranspose weight:   torch (I, O, *k)  -> spatial-flip + (*k, I, O)
  (torch's transposed conv correlates the input-dilated signal with the
  spatially flipped kernel; our `nn.layers.ConvTranspose` correlates with
  the kernel as stored, so the flip moves into the import)
- Linear weight:          torch (O, I)      -> flax (I, O)
- biases / PReLU slopes / norm affine: copied as-is

Norm running-stat buffers (`running_mean/var`, `num_batches_tracked`) are
skipped, and tensors registered under multiple names (the reference Resnet
aliases its encoder layers as both `encoder.*` and `model.*`,
resnet2d.py:46) are deduplicated by storage identity, keeping first
occurrence. Every conversion is shape-checked against the flax template.
"""

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")

Path = Tuple[str, ...]


# ----------------------------------------------------- flax parameter order


class SpecEntry:
    """One torch-importable parameter group.

    Simple entry: `inner` is None, `node` is a single flax leaf matching one
    torch tensor. Stacked entry (a whole coupling sequence created as ONE
    dict-valued flax param with blocks stacked on a leading axis, see
    nn/invertible.py): `node` is the params subtree and `inner` lists one
    block's leaf subpaths in creation order — the entry consumes
    n_blocks * len(inner) consecutive torch tensors (torch registers each
    block's modules separately, block-major)."""

    def __init__(self, path: Path, node, inner: Optional[List[Path]] = None,
                 transpose: bool = False,
                 inner_transpose: Optional[Dict[Path, bool]] = None):
        self.path = path
        self.node = node
        self.inner = inner
        self.transpose = transpose
        self.inner_transpose = inner_transpose or {}

    def groups(self) -> List[str]:
        """Per-block coupling branches in dict (creation) order, e.g. F, G."""
        return list(self.node.keys())

    def n_blocks(self) -> int:
        return int(self._inner_leaf(self.groups()[0], self.inner[0]).shape[0])

    def n_torch_tensors(self) -> int:
        if self.inner is None:
            return 1
        return self.n_blocks() * len(self.groups()) * len(self.inner)

    def _inner_leaf(self, group: str, subpath: Path):
        node = self.node[group]
        for part in subpath:
            node = node[part]
        return node


def flax_param_spec(module, dummy_input, **call_kwargs) -> List[SpecEntry]:
    """Parameter groups in torch-matching order.

    Runs an abstract init (`jax.eval_shape` — zero compute/memory) with
    `flax.linen.Module.param` and `Module.init` patched to record (a) each
    parameter's scope path as it is first created and (b) the leaf order of
    NESTED inits (invertible sequences initialize their per-block template
    through an inner `block.init`, then store the stacked result as one
    dict-valued param — the nested records supply that dict's leaf order).

    If the module defines `torch_param_order_rank(path)`, entries are
    stable-sorted by it — needed when torch registers modules in a different
    order than the flax forward creates them (e.g. V-Net registers its
    out-block right after the in-block, vnet3d.py:65-69)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as fnn

    order: List[Tuple[Path, Optional[List[Path]]]] = []
    seen = set()
    transpose_paths = set()
    depth = [0]
    nested_groups: List[List[Path]] = []   # completed nested-init leaf orders
    original_param = fnn.Module.param
    original_init = fnn.Module.init

    def recording_param(self, name, *args, **kwargs):
        path = tuple(self.scope.path) + (name,)
        value = original_param(self, name, *args, **kwargs)
        # Fractionally-strided convs own their kernel directly and need the
        # spatial-flip import transform; identify them by module type here
        # (the path alone cannot distinguish them from plain nn.Conv).
        if name == "kernel" and type(self).__name__ == "ConvTranspose":
            transpose_paths.add(path)
        if depth[0] > 1:
            if nested_groups and path not in nested_groups[-1]:
                nested_groups[-1].append(path)
            return value
        if path not in seen:
            seen.add(path)
            if isinstance(value, dict) or (hasattr(value, "items")
                                           and not hasattr(value, "shape")):
                inner = nested_groups[-1] if nested_groups else None
                order.append((path, list(inner) if inner else None))
            else:
                order.append((path, None))
            nested_groups.clear()
        return value

    def recording_init(self, *args, **kwargs):
        depth[0] += 1
        if depth[0] > 1:
            nested_groups.append([])
        try:
            return original_init(self, *args, **kwargs)
        finally:
            depth[0] -= 1

    fnn.Module.param = recording_param
    fnn.Module.init = recording_init
    try:
        # dummy_input may be a pytree (e.g. CUT's mlp takes a LIST of
        # per-level feature matrices) — build zeros leaf-wise.
        zeros = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, getattr(a, "dtype", jnp.float32)),
            dummy_input)
        variables = jax.eval_shape(
            lambda: module.init(jax.random.key(0), zeros, **call_kwargs))
    finally:
        fnn.Module.param = original_param
        fnn.Module.init = original_init

    params = variables["params"]
    spec = []
    for path, inner in order:
        # flax's param() also fires on READS inside nested `block.apply`
        # calls (invertible cores apply their template under the sequence
        # scan) — those record scope-RELATIVE paths that do not exist in the
        # final tree; drop them.
        node = params
        for part in path:
            if not hasattr(node, "keys") or part not in node:
                node = None
                break
            node = node[part]
        if node is None:
            continue
        inner_transpose = None
        if inner is not None:
            inner_transpose = {sub: sub in transpose_paths for sub in inner}
        spec.append(SpecEntry(path, node, inner,
                              transpose=path in transpose_paths,
                              inner_transpose=inner_transpose))

    # Canonicalize to torch's state_dict DFS order: a module's DIRECT
    # parameters come before anything nested under its child modules (e.g.
    # SAGAN's `gamma` is registered last but serialized first,
    # nn/attention.py:23), while sibling order stays creation order.
    first_seen: Dict[Path, int] = {}
    for idx, entry in enumerate(spec):
        for i in range(len(entry.path)):
            first_seen.setdefault(entry.path[:i + 1], idx)

    def torch_dfs_key(path: Path):
        key = []
        for i in range(len(path)):
            prefix = path[:i + 1]
            is_param = i == len(path) - 1
            key.append((0 if is_param else 1, first_seen[prefix]))
        return tuple(key)

    spec = sorted(spec, key=lambda e: torch_dfs_key(e.path))

    rank = getattr(module, "torch_param_order_rank", None)
    if rank is not None:
        spec = sorted(spec, key=lambda e: rank(e.path))
    return spec


# ------------------------------------------------------- torch param order


def ordered_torch_params(state_dict) -> List[Tuple[str, np.ndarray]]:
    """(key, array) in registration order, buffers skipped, aliased tensors
    (same underlying storage) deduplicated keeping the first occurrence."""
    items = []
    seen = set()
    for key, value in state_dict.items():
        if key.split(".")[-1] in _BUFFER_SUFFIXES:
            continue
        if hasattr(value, "untyped_storage"):        # torch tensor
            ident = (value.untyped_storage().data_ptr(), tuple(value.shape))
            arr = value.detach().cpu().numpy()
        elif hasattr(value, "data_ptr"):             # older torch tensor
            ident = (value.data_ptr(), tuple(value.shape))
            arr = value.detach().cpu().numpy()
        else:                                        # numpy (tests)
            ident = (id(value), np.shape(value))
            arr = np.asarray(value)
        if ident in seen:
            continue
        seen.add(ident)
        items.append((key, arr))
    return items


# -------------------------------------------------------------- conversions


def _convert_leaf(torch_key: str, arr: np.ndarray,
                  flax_path: Path, flax_shape: Tuple[int, ...],
                  transpose: bool = False) -> np.ndarray:
    name = flax_path[-1]
    if name == "kernel" and arr.ndim >= 3:
        spatial = tuple(range(2, arr.ndim))
        if not transpose:
            # Plain conv: (O, I, *k) -> (*k, I, O).
            converted = np.transpose(arr, (*spatial, 1, 0))
        else:
            # Our ConvTranspose (fractionally-strided correlation):
            # (I, O, *k) -> flip spatial -> (*k, I, O).
            converted = np.transpose(np.flip(arr, axis=spatial),
                                     (*spatial, 0, 1))
    elif name == "kernel" and arr.ndim == 2:
        converted = arr.T
    else:
        converted = arr            # bias / slope / norm affine / misc
    if tuple(converted.shape) != tuple(flax_shape):
        raise ValueError(
            f"torch param `{torch_key}` {tuple(arr.shape)} converts to "
            f"{tuple(converted.shape)}, but flax param "
            f"`{'/'.join(flax_path)}` expects {tuple(flax_shape)} — "
            f"parameter orders diverge or architectures differ.")
    return converted


def _set_path(tree: Dict[str, Any], path: Path, value):
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def convert_state_dict(state_dict, param_spec: List[SpecEntry]
                       ) -> Dict[str, Any]:
    """Convert one torch `state_dict` into a params tree following
    `param_spec` (from `flax_param_spec`)."""
    torch_items = ordered_torch_params(state_dict)
    expected = sum(e.n_torch_tensors() for e in param_spec)
    if expected != len(torch_items):
        flax_desc = [("/".join(e.path), e.n_torch_tensors()) for e in param_spec]
        torch_desc = [(k, tuple(a.shape)) for k, a in torch_items]
        raise ValueError(
            f"parameter count mismatch: torch has {len(torch_items)} "
            f"(after buffer/alias removal), flax expects {expected}.\n"
            f"torch: {torch_desc}\nflax: {flax_desc}")

    result: Dict[str, Any] = {}
    cursor = 0
    for entry in param_spec:
        if entry.inner is None:
            torch_key, arr = torch_items[cursor]
            cursor += 1
            converted = _convert_leaf(torch_key, arr, entry.path,
                                      tuple(entry.node.shape),
                                      transpose=entry.transpose)
            dtype = getattr(entry.node, "dtype", np.float32)
            _set_path(result, entry.path, converted.astype(dtype))
            continue

        # Stacked coupling sequence: torch registers block-major
        # (block0: F leaves, G leaves; block1: ...), flax stores each leaf
        # stacked over blocks on a leading axis.
        groups = entry.groups()
        n_blocks = entry.n_blocks()
        collected = {(g, sub): [] for g in groups for sub in entry.inner}
        for _ in range(n_blocks):
            for g in groups:
                for sub in entry.inner:
                    torch_key, arr = torch_items[cursor]
                    cursor += 1
                    leaf = entry._inner_leaf(g, sub)
                    converted = _convert_leaf(
                        torch_key, arr, entry.path + (g,) + sub,
                        tuple(leaf.shape[1:]),
                        transpose=entry.inner_transpose.get(sub, False))
                    collected[(g, sub)].append(converted)
        for (g, sub), arrs in collected.items():
            leaf = entry._inner_leaf(g, sub)
            dtype = getattr(leaf, "dtype", np.float32)
            _set_path(result, entry.path + (g,) + sub,
                      np.stack(arrs).astype(dtype))
    return result


# ---------------------------------------------------------- checkpoint load


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """Read a reference `.pth` checkpoint (dict of per-network state_dicts)."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)


def import_torch_checkpoint(path, model, example_batch: Dict[str, Any]):
    """Load a reference PyTorch checkpoint into a BaseGAN's state.

    `model` is a constructed GAN (networks declared; `setup()` not required).
    `example_batch` provides input shapes (`{"A": array, "B": array}`) used
    to trace each network's parameter creation order abstractly.
    """
    import jax
    import jax.numpy as jnp

    from ganslate_tpu.nn.gans.base import GANState
    from ganslate_tpu.parallel import replicate_to_mesh

    checkpoint = load_torch_checkpoint(path)
    if not any(model.networks.values()):
        model.init_networks()
    batch_spec = {k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
                  for k, v in example_batch.items()
                  if hasattr(v, "shape") or isinstance(v, np.ndarray)}

    params = {}
    for name, module in model.networks.items():
        assert name in checkpoint, \
            f"checkpoint has no entry for network `{name}`; keys: {list(checkpoint)}"
        dummy = model._dummy_input(name, batch_spec)
        # Pytree-valued dummies (e.g. CUT's mlp takes a LIST of per-level
        # feature matrices) map leaf-wise to abstract shapes.
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.float32), dummy)
        spec = flax_param_spec(module, abstract)
        params[name] = convert_state_dict(checkpoint[name], spec)
        logger.info(f"Imported torch weights for network {name}.")

    params = replicate_to_mesh(params, model.mesh)
    if model.state is None:
        model.state = GANState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state={}, pools={}, rng=jax.random.key(0))
    else:
        model.state = model.state.replace(params=params)
    return model


def _synthetic_example_batch(conf, model):
    """Shape-only batch for parameter tracing, derived from the config (conv
    parameter shapes are independent of spatial size; use one big enough for
    the deepest zoo net)."""
    gan_conf = conf.train.gan if conf.get("train") else conf[conf.mode].gan
    ch_a, ch_b = (int(c) for c in gan_conf.generator.in_out_channels.AB)
    any_g = next(m for n, m in model.networks.items() if n.startswith("G"))
    spatial_dims = getattr(any_g, "spatial_dims", 2)
    spatial = (256, 256) if spatial_dims == 2 else (32, 32, 32)
    return {"A": np.zeros((1, *spatial, ch_a), np.float32),
            "B": np.zeros((1, *spatial, ch_b), np.float32)}


def convert_checkpoint_to_native(checkpoint_path, conf, iter_idx=None) -> str:
    """Convert a reference PyTorch `.pth` checkpoint into a native orbax
    checkpoint at `<output_dir>/checkpoints/<iter>` so every engine can
    `load_iter` it. Returns the written path.

    The converted checkpoint carries `{params, step, rng}` (torch optimizer
    moments are not portable); `BaseGAN.load_networks` detects the missing
    optimizer state and starts optimizers fresh when resuming training."""
    import jax
    import orbax.checkpoint as ocp
    from pathlib import Path as _P

    from ganslate_tpu.utils.builders import build_gan

    if conf.get("train"):
        conf.mode = "train"   # all networks (G+D) exist -> full import
    model = build_gan(conf)
    model.init_networks()
    import_torch_checkpoint(checkpoint_path, model,
                            example_batch=_synthetic_example_batch(conf, model))

    if iter_idx is None:
        stem = _P(str(checkpoint_path)).stem
        iter_idx = int(stem) if stem.isdigit() else 0

    path = (model._checkpoint_dir() / str(iter_idx)).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "params": model.state.params,
            "step": model.state.step + iter_idx,
            "rng": jax.random.key_data(model.state.rng),
        }, force=True)
    logger.info(f"Converted {checkpoint_path} -> {path}")
    return str(path)
