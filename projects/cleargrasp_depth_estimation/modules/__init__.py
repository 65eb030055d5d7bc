from .cyclegan_multimodal_v3 import (CycleGANMultiModalV3,
                                     CycleGANMultiModalV3Config)
