from .dataset import DatasetTemplate, build_dataloader  # noqa: F401
from . import synthetic  # noqa: F401  (registers SyntheticDataset)
from .waymo import waymo_dataset  # noqa: F401  (registers WaymoDataset)
from .kitti import kitti_dataset  # noqa: F401  (registers KittiDataset)
from . import demo_dataset  # noqa: F401  (registers DemoDataset)
from . import nuscenes  # noqa: F401  (registers NuScenesDataset)
from . import lyft  # noqa: F401  (registers LyftDataset)
from . import pandaset  # noqa: F401  (registers PandasetDataset)
from . import custom  # noqa: F401  (registers CustomDataset)
