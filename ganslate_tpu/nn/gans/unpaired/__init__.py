from ganslate_tpu.nn.gans.unpaired.cyclegan import CycleGAN, CycleGANConfig
