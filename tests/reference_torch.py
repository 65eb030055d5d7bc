"""Import the REFERENCE PyTorch networks (/root/reference/ganslate) for
golden-parity testing of the torch-checkpoint importer.

The reference's heavy deps (omegaconf, memcnn, loguru, monai) are not
installed; minimal functional stand-ins are injected into sys.modules before
the reference package is imported. The stand-ins only implement what the
reference networks touch: omegaconf.MISSING/II (config dataclasses),
memcnn's additive coupling forward/inverse math (invertible.py:8-24),
loguru.logger, and monai's RandSpatialCrop signature."""

import logging
import sys
import types

_REFERENCE_ROOT = "/root/reference"


class RefConf(dict):
    """Attribute+item dict standing in for an OmegaConf DictConfig in the
    reference's code paths (conf.a.b, conf['a'], dict(node), iteration).
    Registered as `omegaconf.dictconfig.DictConfig` so the reference
    builders' isinstance checks (builders.py:117,126) route dict-valued
    `in_out_channels`/`in_channels` through the per-direction branch."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def create(cls, tree):
        if isinstance(tree, dict):
            return cls({k: cls.create(v) for k, v in tree.items()})
        return tree


def _install_stubs():
    if "omegaconf" not in sys.modules:
        from ganslate_tpu.configs import omega
        fake = types.ModuleType("omegaconf")
        fake.MISSING = omega.MISSING
        fake.II = omega.II
        sys.modules["omegaconf"] = fake
    fake = sys.modules["omegaconf"]
    if not hasattr(fake, "dictconfig"):
        dictconfig = types.ModuleType("omegaconf.dictconfig")
        dictconfig.DictConfig = RefConf
        fake.dictconfig = dictconfig
        fake.DictConfig = RefConf
        fake.OmegaConf = type("OmegaConf", (), {})
        sys.modules["omegaconf.dictconfig"] = dictconfig

    import torch
    import torch.nn as nn

    if "memcnn" not in sys.modules:
        memcnn = types.ModuleType("memcnn")

        class AdditiveCoupling(nn.Module):
            """y1 = x1 + Fm(x2); y2 = x2 + Gm(y1) — memcnn's channel-split
            additive coupling (used by reference invertible.py:13-16)."""

            def __init__(self, Fm, Gm=None, implementation_fwd=-1,
                         implementation_bwd=-1):
                super().__init__()
                import copy
                # memcnn semantics: Gm defaults to a copy of Fm (the
                # reference always constructs with Fm only, invertible.py:15).
                self.Fm = Fm
                self.Gm = copy.deepcopy(Fm) if Gm is None else Gm

            def forward(self, x):
                x1, x2 = torch.chunk(x, 2, dim=1)
                y1 = x1 + self.Fm(x2)
                y2 = x2 + self.Gm(y1)
                return torch.cat([y1, y2], dim=1)

            def inverse(self, y):
                y1, y2 = torch.chunk(y, 2, dim=1)
                x2 = y2 - self.Gm(y1)
                x1 = y1 - self.Fm(x2)
                return torch.cat([x1, x2], dim=1)

        class InvertibleModuleWrapper(nn.Module):
            def __init__(self, fn=None, keep_input=False,
                         keep_input_inverse=False, **kwargs):
                super().__init__()
                self._fn = fn

            def forward(self, x):
                return self._fn(x)

            def inverse(self, y):
                return self._fn.inverse(y)

        memcnn.AdditiveCoupling = AdditiveCoupling
        memcnn.InvertibleModuleWrapper = InvertibleModuleWrapper
        sys.modules["memcnn"] = memcnn

    if "torchvision" not in sys.modules:
        # Not installed here; only reached through the reference data plane's
        # module-level imports (data/utils/transforms.py:4-5), which the
        # network/GAN parity tests never execute.
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv_t.functional = tv_f
        tv.transforms = tv_t
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f

    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")
        loguru.logger = logging.getLogger("loguru")
        sys.modules["loguru"] = loguru

    if "monai" not in sys.modules:
        monai = types.ModuleType("monai")
        monai_t = types.ModuleType("monai.transforms")

        class RandSpatialCrop:
            """Deterministic CENTER-crop stand-in for MONAI's random crop —
            matches the flax MultiScalePatchGAN3D's no-rng eval behavior so
            forward parity is checkable. Keeps dim 0 (treated as channel by
            MONAI; here the batch), crops the remaining dims to roi_size."""

            def __init__(self, roi_size, random_center=True,
                         random_size=False):
                self.roi_size = roi_size

            def __call__(self, x):
                slices = [slice(None)]
                for dim, target in enumerate(self.roi_size, start=1):
                    start = (x.shape[dim] - int(target)) // 2
                    slices.append(slice(start, start + int(target)))
                return x[tuple(slices)]

        monai_t.RandSpatialCrop = RandSpatialCrop
        monai.transforms = monai_t
        sys.modules["monai"] = monai
        sys.modules["monai.transforms"] = monai_t


class _lenient_dataclasses:
    """Context manager: the reference targets Python 3.7 dataclasses, which
    allowed mutable (nested-dataclass) class-attribute defaults; 3.12 raises.
    While active, `dataclasses.dataclass` rewrites such defaults to
    deepcopy default_factories, so the reference config modules import
    unchanged."""

    def __enter__(self):
        import copy
        import dataclasses as dc
        self._dc, self._orig = dc, dc.dataclass

        def lenient(cls=None, **kw):
            def wrap(c):
                for name in getattr(c, "__annotations__", {}):
                    if name in c.__dict__:
                        v = c.__dict__[name]
                        if v.__class__.__hash__ is None:
                            setattr(c, name, dc.field(
                                default_factory=lambda v=v: copy.deepcopy(v)))
                return self._orig(c, **kw)
            return wrap if cls is None else wrap(cls)

        dc.dataclass = lenient
        return self

    def __exit__(self, *exc):
        self._dc.dataclass = self._orig


def load_reference_gans():
    """Returns the reference GAN training algorithms (CycleGAN, Pix2Pix) —
    the REAL `optimize_parameters` code paths
    (/root/reference/ganslate/nn/gans/unpaired/cyclegan.py:92-123,
    paired/pix2pix.py:76-143) — importable with the stubs installed, for
    lockstep training-dynamics parity tests."""
    _install_stubs()
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    with _lenient_dataclasses():
        from ganslate.nn.gans.paired.pix2pix import Pix2PixConditionalGAN
        from ganslate.nn.gans.unpaired.cyclegan import CycleGAN
        from ganslate.nn.gans.unpaired.cut import CUT
        from ganslate.nn.gans.unpaired.revgan import RevGAN
    return {"CycleGAN": CycleGAN, "Pix2Pix": Pix2PixConditionalGAN,
            "RevGAN": RevGAN, "CUT": CUT}


def load_reference_nn():
    """Returns the reference `ganslate.nn` generator/discriminator modules
    (dict of classes), importing the reference package with stubs."""
    _install_stubs()
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    import ganslate.configs.base  # noqa: F401  (resolves configs.base attr)
    from ganslate.nn.discriminators.patchgan.multiscale_patchgan3d import \
        MultiScalePatchGAN3D
    from ganslate.nn.discriminators.patchgan.patchgan2d import PatchGAN2D
    from ganslate.nn.discriminators.patchgan.patchgan3d import PatchGAN3D
    from ganslate.nn.discriminators.patchgan.selfattention_patchgan3d import \
        SelfAttentionPatchGAN3D
    from ganslate.nn.generators.resnet.piresnet3d import Piresnet3D
    from ganslate.nn.generators.resnet.resnet2d import Resnet2D
    from ganslate.nn.generators.resnet.resnet3d import Resnet3D
    from ganslate.nn.generators.unet.unet2d import Unet2D
    from ganslate.nn.generators.unet.unet3d import Unet3D
    from ganslate.nn.generators.vnet.selfattention_vnet3d import \
        SelfAttentionVnet3D
    from ganslate.nn.generators.vnet.vnet3d import Vnet3D
    return {
        "Resnet2D": Resnet2D, "Resnet3D": Resnet3D, "Piresnet3D": Piresnet3D,
        "Unet2D": Unet2D, "Unet3D": Unet3D, "Vnet3D": Vnet3D,
        "SelfAttentionVnet3D": SelfAttentionVnet3D,
        "PatchGAN2D": PatchGAN2D, "PatchGAN3D": PatchGAN3D,
        "SelfAttentionPatchGAN3D": SelfAttentionPatchGAN3D,
        "MultiScalePatchGAN3D": MultiScalePatchGAN3D,
    }
