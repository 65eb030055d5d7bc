from ganslate_tpu.data.paired_image_dataset import (PairedImageDataset,
                                                    PairedImageDatasetConfig)
from ganslate_tpu.data.unpaired_image_dataset import (UnpairedImageDataset,
                                                      UnpairedImageDatasetConfig)
