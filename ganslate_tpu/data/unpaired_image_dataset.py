"""Unpaired 2D image dataset.

Pairing policy (reference parity:
/root/reference/ganslate/data/unpaired_image_dataset.py): domain A is
indexed deterministically, domain B is drawn uniformly at random each access
— the CycleGAN-style unaligned regime — and one epoch spans the LARGER
domain. Samples are channels-last float32 arrays in [-1, 1].
"""

import random
from dataclasses import dataclass, field
from typing import Tuple

from ganslate_tpu import configs
from ganslate_tpu.data.image_folder import domain_folders
from ganslate_tpu.data.utils.transforms import get_single_image_transform


@dataclass
class UnpairedImageDatasetConfig(configs.base.BaseDatasetConfig):
    image_channels: int = 3
    # Preprocessing at load time:
    #   initial resizing: 'resize', 'scale_width'
    #   random transforms: 'random_zoom', 'random_crop', 'random_flip'
    preprocess: Tuple[str] = ('resize', 'random_crop', 'random_flip')
    # Sizes in (H, W) format.
    load_size: Tuple[int, int] = field(default_factory=lambda: [286, 286])
    final_size: Tuple[int, int] = field(default_factory=lambda: [256, 256])


class UnpairedImageDataset:

    def __init__(self, conf):
        self.domain_A, self.domain_B = domain_folders(conf, 'A', 'B')
        # A and B get INDEPENDENT transform draws (unaligned domains).
        self.transform = get_single_image_transform(conf)

    def __len__(self):
        return max(len(self.domain_A), len(self.domain_B))

    def __getitem__(self, index, rng=None):
        # `rng` (a np.random.Generator) is supplied by the DataLoader, seeded
        # by the sample's stream position: the B-draw and both transform
        # parameter draws become deterministic under checkpoint-resume and
        # thread scheduling. Standalone use (rng=None) falls back to global
        # RNGs.
        a = self.domain_A.load(index % len(self.domain_A))
        if rng is None:
            b_index = random.randint(0, len(self.domain_B) - 1)
        else:
            b_index = int(rng.integers(0, len(self.domain_B)))
        b = self.domain_B.load(b_index)
        # A and B get INDEPENDENT transform draws (sequential consumption of
        # the same per-sample rng keeps them independent AND deterministic).
        return {'A': self.transform(a, rng=rng), 'B': self.transform(b, rng=rng)}
