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


def flax_param_spec(module, dummy_input, **call_kwargs
                    ) -> List[Tuple[Path, Any]]:
    """(path, ShapeDtypeStruct)-like pairs in CREATION (forward) order.

    Runs an abstract init (`jax.eval_shape` — zero compute/memory) with
    `flax.linen.Module.param` patched to record each parameter's scope path
    as it is first created."""
    import jax
    import jax.numpy as jnp
    from flax import linen as fnn

    order: List[Path] = []
    seen = set()
    original = fnn.Module.param

    def recording_param(self, name, *args, **kwargs):
        path = tuple(self.scope.path) + (name,)
        if path not in seen:
            seen.add(path)
            order.append(path)
        return original(self, name, *args, **kwargs)

    fnn.Module.param = recording_param
    try:
        variables = jax.eval_shape(
            lambda: module.init(jax.random.key(0),
                                jnp.zeros(dummy_input.shape,
                                          getattr(dummy_input, "dtype",
                                                  jnp.float32)),
                                **call_kwargs))
    finally:
        fnn.Module.param = original

    params = variables["params"]
    spec = []
    for path in order:
        node = params
        for part in path:
            node = node[part]
        spec.append((path, node))
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
                  flax_path: Path, flax_shape: Tuple[int, ...]) -> np.ndarray:
    name = flax_path[-1]
    parent = flax_path[-2] if len(flax_path) > 1 else ""
    if name == "kernel" and arr.ndim >= 3:
        spatial = tuple(range(2, arr.ndim))
        if parent == "conv":
            # nn.Conv child module: plain conv, (O, I, *k) -> (*k, I, O).
            converted = np.transpose(arr, (*spatial, 1, 0))
        else:
            # Our ConvTranspose owns its "kernel" directly:
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


def convert_state_dict(state_dict, param_spec: List[Tuple[Path, Any]]
                       ) -> Dict[str, Any]:
    """Convert one torch `state_dict` into a params tree following
    `param_spec` (from `flax_param_spec`: forward-ordered (path, leaf))."""
    torch_items = ordered_torch_params(state_dict)
    if len(param_spec) != len(torch_items):
        flax_desc = [("/".join(p), tuple(l.shape)) for p, l in param_spec]
        torch_desc = [(k, tuple(a.shape)) for k, a in torch_items]
        raise ValueError(
            f"parameter count mismatch: torch has {len(torch_items)} "
            f"(after buffer/alias removal), flax expects {len(param_spec)}.\n"
            f"torch: {torch_desc}\nflax: {flax_desc}")

    result: Dict[str, Any] = {}
    for (flax_path, leaf), (torch_key, arr) in zip(param_spec, torch_items):
        converted = _convert_leaf(torch_key, arr, flax_path, tuple(leaf.shape))
        dtype = getattr(leaf, "dtype", np.float32)
        node = result
        for part in flax_path[:-1]:
            node = node.setdefault(part, {})
        node[flax_path[-1]] = converted.astype(dtype)
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
    from ganslate_tpu.parallel import replicated_sharding

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
        spec = flax_param_spec(module, jax.ShapeDtypeStruct(dummy.shape,
                                                            jnp.float32))
        params[name] = convert_state_dict(checkpoint[name], spec)
        logger.info(f"Imported torch weights for network {name}.")

    params = jax.device_put(params, replicated_sharding(model.mesh))
    if model.state is None:
        model.state = GANState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state={}, pools={}, rng=jax.random.key(0))
    else:
        model.state = model.state.replace(params=params)
    return model
