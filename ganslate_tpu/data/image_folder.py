"""A single domain directory of 2D images, loaded through PIL.

Shared by the unpaired/paired image datasets: owns file discovery (jpg/jpeg/
png), channel-mode selection, and indexed loading. Keeping this in one place
lets the dataset classes express only their *pairing policy* — which is the
actual behavioral difference between them.
"""

from pathlib import Path

from PIL import Image

from ganslate_tpu.utils.io import make_dataset_of_files

IMAGE_EXTENSIONS = ['.jpg', '.jpeg', '.png']


class ImageFolder:
    """Sorted image files under ``root``, decoded as RGB or grayscale."""

    def __init__(self, root, image_channels: int):
        self.root = Path(root)
        self.paths = make_dataset_of_files(self.root, IMAGE_EXTENSIONS)
        self.pil_mode = 'RGB' if image_channels == 3 else 'L'

    def __len__(self) -> int:
        return len(self.paths)

    def load(self, index: int) -> Image.Image:
        return Image.open(self.paths[index]).convert(self.pil_mode)


def domain_folders(conf, *domains: str):
    """ImageFolders for the mode's dataset root, one per domain subdir."""
    dataset_conf = conf[conf.mode].dataset
    return tuple(ImageFolder(Path(dataset_conf.root) / d,
                             dataset_conf.image_channels) for d in domains)
