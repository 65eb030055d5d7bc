from .train_dataset import ClearGraspTrainDataset, ClearGraspTrainDatasetConfig
from .val_test_dataset import (ClearGraspValTestDataset,
                               ClearGraspValTestDatasetConfig)
