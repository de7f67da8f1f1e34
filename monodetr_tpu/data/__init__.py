from .kitti_dataset import KITTIDataset
from .loader import build_dataloader

__all__ = ["KITTIDataset", "build_dataloader"]
