from .dataset import DatasetTemplate, build_dataloader  # noqa: F401
from . import synthetic  # noqa: F401  (registers SyntheticDataset)
