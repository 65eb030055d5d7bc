"""Paired 2D image dataset (reference parity:
/root/reference/ganslate/data/paired_image_dataset.py — same index for A and
B, joint random transform). Emits channels-last float32 arrays in [-1, 1]."""

from dataclasses import dataclass, field
from pathlib import Path
from typing import Tuple

from PIL import Image

from ganslate_tpu import configs
from ganslate_tpu.data.utils.transforms import get_paired_image_transform
from ganslate_tpu.utils.io import make_dataset_of_files

EXTENSIONS = ['.jpg', '.jpeg', '.png']


@dataclass
class PairedImageDatasetConfig(configs.base.BaseDatasetConfig):
    image_channels: int = 3
    # During val/test random transforms are skipped.
    preprocess: Tuple[str] = ('resize', 'random_crop', 'random_flip')
    # Sizes in (H, W) format.
    load_size: Tuple[int, int] = field(default_factory=lambda: [286, 572])
    final_size: Tuple[int, int] = field(default_factory=lambda: [256, 512])


class PairedImageDataset:

    def __init__(self, conf):
        dataset_conf = conf[conf.mode].dataset
        self.dir_A = Path(dataset_conf.root) / 'A'
        self.dir_B = Path(dataset_conf.root) / 'B'

        self.A_paths = make_dataset_of_files(self.dir_A, EXTENSIONS)
        self.B_paths = make_dataset_of_files(self.dir_B, EXTENSIONS)
        self.n_samples = len(self.A_paths)

        self.transform = get_paired_image_transform(conf)
        self.rgb_or_grayscale = 'RGB' if dataset_conf.image_channels == 3 else 'L'

    def __getitem__(self, index):
        index = index % self.n_samples

        A_img = Image.open(self.A_paths[index]).convert(self.rgb_or_grayscale)
        B_img = Image.open(self.B_paths[index]).convert(self.rgb_or_grayscale)

        A, B = self.transform(A_img, B_img)
        return {'A': A, 'B': B}

    def __len__(self):
        return self.n_samples
