"""hebbax data pipeline — host-side numpy loading/augmentation feeding
sharded device batches."""

from .dataset2d import SegDataset2D, regime_split
from .loader import Loader, collate

__all__ = ["SegDataset2D", "regime_split", "Loader", "collate"]
