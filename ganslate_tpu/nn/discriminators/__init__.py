from ganslate_tpu.nn.discriminators.patchgan.multiscale_patchgan3d import (
    MultiScalePatchGAN3D, MultiScalePatchGAN3DConfig)
from ganslate_tpu.nn.discriminators.patchgan.patchgan2d import PatchGAN2D, PatchGAN2DConfig
from ganslate_tpu.nn.discriminators.patchgan.patchgan3d import PatchGAN3D, PatchGAN3DConfig
from ganslate_tpu.nn.discriminators.patchgan.selfattention_patchgan3d import (
    SelfAttentionPatchGAN3D, SelfAttentionPatchGAN3DConfig)
