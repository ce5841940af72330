from .custom_dataset import CustomDataset  # noqa: F401
