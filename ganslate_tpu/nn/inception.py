"""InceptionV3 (torchvision-compatible) for standard FID.

A channels-last flax reimplementation of torchvision's `inception_v3`
module tree — submodule names match torchvision attribute names exactly
(`Conv2d_1a_3x3`, `Mixed_5b.branch5x5_2`, ...) so a torchvision state_dict
maps by NAME through `load_torch_inception` (no ordering heuristics).
BatchNorm is the eval-mode affine form using the imported running
statistics (FID always evaluates in eval mode).

Getting the standard weights into this environment (no network egress —
run where torchvision is installed, then copy the file):

    import torch, torchvision
    net = torchvision.models.inception_v3(
        weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1)
    torch.save(net.state_dict(), "inception_v3.pth")

then `fid_feature_fn(params_from("inception_v3.pth"))` below, or through
config: `val.metrics.fid_weights: /path/inception_v3.pth`.

Reference parity note: the reference framework has no FID at all; this
closes BASELINE.md's "SSIM/PSNR/FID parity" north star. The architecture
follows the published InceptionV3 (Szegedy et al., CVPR 2016) as realized
by torchvision; FID uses the 2048-d pre-logits pooled features
(pytorch-fid's pool3 convention, inputs in [-1, 1] resized to 299x299).
"""

from functools import partial
from typing import Any, Dict, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm: y = (x - mean) * weight / sqrt(var + eps) + bias,
    with all four tensors imported parameters (torch bn.eval() semantics)."""
    features: int
    epsilon: float = 1e-3  # torchvision BasicConv2d uses eps=0.001

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        weight = self.param("weight", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, shape,
                          jnp.float32)
        var = self.param("running_var", nn.initializers.ones, shape,
                         jnp.float32)
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        return (x.astype(jnp.float32) - mean) * scale + bias


class BasicConv2d(nn.Module):
    """conv(bias=False) -> BN(eps=1e-3) -> relu (torchvision BasicConv2d)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        p = _pair(self.padding)
        h = nn.Conv(self.features, k, strides=_pair(self.strides),
                    padding=[(p[0], p[0]), (p[1], p[1])], use_bias=False,
                    name="conv")(x)
        h = FrozenBatchNorm(self.features, name="bn")(h)
        return nn.relu(h)


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avg_pool3s1p1(x):
    # torch avg_pool2d(count_include_pad=True): divide by the full window.
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return (s / 9.0).astype(x.dtype)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, 1, name="branch1x1")(x)
        b5 = BasicConv2d(48, 1, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, 5, padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, 1, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, 1,
                         name="branch_pool")(_avg_pool3s1p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, 3, strides=2, name="branch3x3")(x)
        bd = BasicConv2d(64, 1, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, 3, padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, 3, strides=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, 1, name="branch1x1")(x)
        b7 = BasicConv2d(c7, 1, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, 1, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, 1, name="branch_pool")(_avg_pool3s1p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, 1, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, 3, strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, 1, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, 3, strides=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, 1, name="branch1x1")(x)
        b3 = BasicConv2d(384, 1, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, 1, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, 3, padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, 1, name="branch_pool")(_avg_pool3s1p1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """`__call__(x)` -> (features_2048, logits). x: (N, H, W, 3) channels-
    last. `transform_input` replicates torchvision's ImageNet re-scaling of
    [-1,1] inputs (kept False for FID, pytorch-fid convention)."""
    num_classes: int = 1000
    transform_input: bool = False

    @nn.compact
    def __call__(self, x):
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)

        h = BasicConv2d(32, 3, strides=2, name="Conv2d_1a_3x3")(x)
        h = BasicConv2d(32, 3, name="Conv2d_2a_3x3")(h)
        h = BasicConv2d(64, 3, padding=1, name="Conv2d_2b_3x3")(h)
        h = _max_pool3s2(h)
        h = BasicConv2d(80, 1, name="Conv2d_3b_1x1")(h)
        h = BasicConv2d(192, 3, name="Conv2d_4a_3x3")(h)
        h = _max_pool3s2(h)
        h = InceptionA(32, name="Mixed_5b")(h)
        h = InceptionA(64, name="Mixed_5c")(h)
        h = InceptionA(64, name="Mixed_5d")(h)
        h = InceptionB(name="Mixed_6a")(h)
        h = InceptionC(128, name="Mixed_6b")(h)
        h = InceptionC(160, name="Mixed_6c")(h)
        h = InceptionC(160, name="Mixed_6d")(h)
        h = InceptionC(192, name="Mixed_6e")(h)
        h = InceptionD(name="Mixed_7a")(h)
        h = InceptionE(name="Mixed_7b")(h)
        h = InceptionE(name="Mixed_7c")(h)
        feats = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)  # adaptive avgpool
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


# ------------------------------------------------------------ weight import


def load_torch_inception(state_dict) -> Dict[str, Any]:
    """torchvision `inception_v3().state_dict()` -> flax params for
    `InceptionV3` (name-keyed: `Mixed_5b.branch1x1.conv.weight` ->
    params['Mixed_5b']['branch1x1']['conv']['kernel'], OIHW->HWIO).
    AuxLogits.* (absent from `aux_logits=False` nets) is skipped — FID
    never uses it."""
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value

    for key, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)().numpy()
                         if hasattr(tensor, "numpy") else tensor,
                         dtype=np.float32)
        parts = key.split(".")
        if parts[0] == "AuxLogits" or parts[-1] == "num_batches_tracked":
            continue
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(parts[:-1] + ["kernel"], arr.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            put(parts, arr)
        elif parts[-2] == "fc":
            if parts[-1] == "weight":
                put(["fc", "kernel"], arr.T)
            else:
                put(["fc", "bias"], arr)
        else:
            raise ValueError(f"unrecognized inception key: {key}")
    return params


def load_torch_inception_file(path) -> Dict[str, Any]:
    import torch
    return load_torch_inception(
        torch.load(path, map_location="cpu", weights_only=True))


def save_inception_npz(params: Dict[str, Any], path) -> None:
    """Write flax InceptionV3 params as a flat `.npz` ('/'-joined keys) —
    the framework-native weight format: serving/eval loads it without a
    torch runtime (`ganslate convert-fid-weights` does the one-time
    .pth -> .npz conversion)."""
    flat = {}

    def walk(node, prefix):
        for key, value in node.items():
            p = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, p)
            else:
                flat[p] = np.asarray(value, np.float32)

    walk(params, "")
    np.savez(path, **flat)


def load_inception_npz(path) -> Dict[str, Any]:
    """Inverse of `save_inception_npz`."""
    params: Dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = params
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = data[key]
    return params


def load_inception_weights(path) -> Dict[str, Any]:
    """Load InceptionV3 FID weights by extension: `.npz` is the native
    torch-free format; `.pth`/`.pt` go through the torch importer (one-time —
    convert with `ganslate convert-fid-weights` to drop torch from the
    serving path)."""
    p = str(path)
    if p.endswith(".npz"):
        return load_inception_npz(p)
    return load_torch_inception_file(p)


# ------------------------------------------------------------- FID features


def fid_feature_fn(params, resize_to: int = 299):
    """Returns `feature_fn(batch) -> (N, 2048)` for `utils.metrics.fid.FID`:
    batch is (N, H, W, C) in [-1, 1] (the framework's visual range; the
    pytorch-fid convention feeds [0,1]*2-1 = the same range), bilinearly
    resized to 299x299; grayscale is repeated to 3 channels."""
    model = InceptionV3()

    @jax.jit
    def run(x):
        x = x.astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = jax.image.resize(
            x, (x.shape[0], resize_to, resize_to, x.shape[-1]), "bilinear")
        feats, _ = model.apply({"params": params}, x)
        return feats

    return run
