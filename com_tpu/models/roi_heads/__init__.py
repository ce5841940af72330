from . import parta2_head  # noqa: F401  (registers heads)
from . import pointrcnn_head  # noqa: F401
from . import pvrcnn_head  # noqa: F401
from . import second_head  # noqa: F401
from . import voxelrcnn_head  # noqa: F401
