from ganslate_tpu.nn.gans.paired.pix2pix import (Pix2PixConditionalGAN,
                                                 Pix2PixConditionalGANConfig)
