from .datasets import VNCelebDataset, VNCelebEmbDataset
from .loader import DataLoader, prefetch_to_device
from .transforms import transforms_dict, get_transform

__all__ = [
    "VNCelebDataset",
    "VNCelebEmbDataset",
    "DataLoader",
    "prefetch_to_device",
    "transforms_dict",
    "get_transform",
]
