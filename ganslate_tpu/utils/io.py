"""File discovery, dynamic imports, batch decollation.

Reference parity: `/root/reference/ganslate/utils/io.py`. The decollate here is
a torch-free reimplementation over numpy/JAX arrays.

`import_attr` additionally resolves the compatibility alias ``ganslate.*`` ->
``ganslate_tpu.*`` so reference experiment YAMLs (whose `_target_` strings name
the original package) resolve to the TPU implementations.
"""

import importlib
import json
from pathlib import Path

import numpy as np

# `_target_` prefixes rewritten to this package (reference-YAML compatibility).
_IMPORT_ALIASES = {
    "ganslate.": "ganslate_tpu.",
}


def mkdirs(*paths):
    for path in paths:
        Path(path).mkdir(parents=True, exist_ok=True)


def make_dataset_of_files(root, extensions):
    """The dataset root contains files of the given extension(s)."""
    root = Path(root).resolve()
    assert root.is_dir(), f"{root} is not a valid directory"
    paths = [root / f for f in root.iterdir() if has_extension(f, extensions)]
    return sorted(paths)


def make_recursive_dataset_of_files(root, extensions):
    root = Path(root).resolve()
    assert root.is_dir(), f"{root} is not a valid directory"
    paths = []
    for ext in extensions:
        paths.extend(list(root.rglob(f"*{ext}")))
    return sorted(paths)


def has_extension(file, extensions):
    # Join suffixes so multi-part extensions like ".nii.gz" match.
    suffix = "".join(Path(file).suffixes)
    return any(ext in suffix for ext in extensions)


def make_dataset_of_directories(root, extensions):
    """Dataset root contains one folder per data point; each folder must hold
    at least one file with the specified extension."""
    root = Path(root).resolve()
    assert root.is_dir(), f"{root} is not a valid directory"
    paths = [root / d for d in root.iterdir() if (root / d).is_dir()]
    paths = [d for d in paths if has_files_with_extension(d, extensions)]
    return sorted(paths)


def make_recursive_dataset_of_directories(root, extensions):
    files = make_recursive_dataset_of_files(root, extensions)
    return list({f.parent for f in files})


def has_files_with_extension(folder, extensions):
    for ext in extensions:
        if not ext.startswith("."):
            ext = "." + ext
        if list(Path(folder).glob(f"*{ext}")):
            return True
    return False


def find_paths_containing_pattern(path, pattern, recursive=False):
    path = Path(path)
    return list(path.rglob(pattern) if recursive else path.glob(pattern))


def load_json(file):
    with open(file, 'r') as f:
        return json.load(f)


def import_attr(module_attr: str):
    """Import a dotted attribute path, applying package aliases.

    ``ganslate.nn.generators.Resnet2D`` ALWAYS resolves to
    ``ganslate_tpu.nn.generators.Resnet2D`` — reference experiment YAMLs keep
    their `_target_` strings, and a PyTorch `ganslate` installation on the
    path must never shadow the TPU implementations (its torch modules cannot
    run inside the jitted train steps).
    """
    for prefix, replacement in _IMPORT_ALIASES.items():
        if module_attr.startswith(prefix):
            module_attr = replacement + module_attr[len(prefix):]
            break
    module_name, attr = module_attr.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def issequenceiterable(obj) -> bool:
    """True if obj is a non-string iterable sequence (0-d arrays excluded)."""
    if isinstance(obj, np.ndarray) or hasattr(obj, "ndim"):
        return getattr(obj, "ndim", 0) > 0
    import collections.abc
    return isinstance(obj, collections.abc.Iterable) and not isinstance(obj, str)


def decollate(data: dict, batch_size=None):
    """Split a batched dict into a list of per-sample dicts.

    Arrays stored as (B, ...) are returned as (...). Lists are indexed per
    batch element; nested dicts are recursed. Single-element arrays collapse
    to Python scalars (reference parity: io.py:96-159).
    """
    if not isinstance(data, dict):
        raise RuntimeError("decollate is only implemented for dict data.")
    if batch_size is None:
        for v in data.values():
            if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
                batch_size = v.shape[0]
                break
    if batch_size is None:
        raise RuntimeError("Couldn't determine batch size, please specify as argument.")

    def to_single(d):
        return d if getattr(d, "size", 2) > 1 else d.item()

    def _decollate(value, idx):
        if isinstance(value, dict):
            return {k: _decollate(v, idx) for k, v in value.items()}
        if hasattr(value, "shape") and getattr(value, "ndim", 0) > 0:
            return to_single(value[idx])
        if isinstance(value, list):
            if len(value) == 0:
                return value
            if hasattr(value[0], "shape"):
                return [to_single(d[idx]) for d in value]
            if issequenceiterable(value[0]):
                return [_decollate(d, idx) for d in value]
            return value[idx]
        raise TypeError(f"Not sure how to de-collate type: {type(value)}")

    return [{key: _decollate(data[key], idx) for key in data} for idx in range(batch_size)]
