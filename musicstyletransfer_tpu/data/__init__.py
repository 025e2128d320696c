from .dataset import (
    Batch,
    Dataset,
    MelodyDataset,
    ToyData,
    device_tensorize,
    load_dataset,
    tensorize_melodies,
)
from .loader import Loader

__all__ = [
    "Batch",
    "Dataset",
    "Loader",
    "MelodyDataset",
    "ToyData",
    "load_dataset",
    "tensorize_melodies",
    "device_tensorize",
]
