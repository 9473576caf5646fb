from .dataset import ImageDataset, make_dataset, prepare_dataset

__all__ = ["make_dataset", "prepare_dataset", "ImageDataset"]
