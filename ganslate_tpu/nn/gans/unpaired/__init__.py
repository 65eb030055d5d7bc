from ganslate_tpu.nn.gans.unpaired.cut import CUT, CUTConfig
from ganslate_tpu.nn.gans.unpaired.cyclegan import CycleGAN, CycleGANConfig
from ganslate_tpu.nn.gans.unpaired.revgan import RevGAN, RevGANConfig
