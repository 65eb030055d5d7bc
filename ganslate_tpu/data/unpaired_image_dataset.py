"""Unpaired 2D image dataset (reference parity:
/root/reference/ganslate/data/unpaired_image_dataset.py — A indexed, B drawn
at random, RGB or grayscale, len = max(|A|, |B|)). Emits channels-last
float32 arrays in [-1, 1]."""

import random
from dataclasses import dataclass, field
from pathlib import Path
from typing import Tuple

from PIL import Image

from ganslate_tpu import configs
from ganslate_tpu.data.utils.transforms import get_single_image_transform
from ganslate_tpu.utils.io import make_dataset_of_files

EXTENSIONS = ['.jpg', '.jpeg', '.png']


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
        dataset_conf = conf[conf.mode].dataset
        self.dir_A = Path(dataset_conf.root) / 'A'
        self.dir_B = Path(dataset_conf.root) / 'B'

        self.A_paths = make_dataset_of_files(self.dir_A, EXTENSIONS)
        self.B_paths = make_dataset_of_files(self.dir_B, EXTENSIONS)
        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)

        self.transform = get_single_image_transform(conf)
        self.rgb_or_grayscale = 'RGB' if dataset_conf.image_channels == 3 else 'L'

    def __getitem__(self, index):
        index_A = index % self.A_size
        index_B = random.randint(0, self.B_size - 1)

        A_img = Image.open(self.A_paths[index_A]).convert(self.rgb_or_grayscale)
        B_img = Image.open(self.B_paths[index_B]).convert(self.rgb_or_grayscale)

        return {'A': self.transform(A_img), 'B': self.transform(B_img)}

    def __len__(self):
        return max(self.A_size, self.B_size)
