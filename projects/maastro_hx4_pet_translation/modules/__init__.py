from .hx4_cyclegan_balanced import (HX4CycleGANBalanced,
                                    HX4CycleGANBalancedConfig)
