from .dataset import (
    Batch,
    Dataset,
    MelodyDataset,
    RawBatch,
    ToyData,
    chunk_melodies,
    device_layout_chunks,
    device_tensorize,
    layout_chunks,
    load_dataset,
    tensorize_melodies,
)
from .loader import Loader

__all__ = [
    "Batch",
    "Dataset",
    "Loader",
    "MelodyDataset",
    "RawBatch",
    "ToyData",
    "chunk_melodies",
    "device_layout_chunks",
    "device_tensorize",
    "layout_chunks",
    "load_dataset",
    "tensorize_melodies",
]
