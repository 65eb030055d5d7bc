from ganslate_tpu.nn.generators.resnet.piresnet3d import Piresnet3D, Piresnet3DConfig
from ganslate_tpu.nn.generators.resnet.resnet2d import Resnet2D, Resnet2DConfig
from ganslate_tpu.nn.generators.resnet.resnet3d import Resnet3D, Resnet3DConfig
from ganslate_tpu.nn.generators.unet.unet2d import Unet2D, Unet2DConfig
from ganslate_tpu.nn.generators.unet.unet3d import Unet3D, Unet3DConfig
from ganslate_tpu.nn.generators.vnet.selfattention_vnet3d import (
    SelfAttentionVnet3D, SelfAttentionVnet3DConfig)
from ganslate_tpu.nn.generators.vnet.vnet2d import Vnet2D, Vnet2DConfig
from ganslate_tpu.nn.generators.vnet.vnet3d import Vnet3D, Vnet3DConfig
