from . import parta2_head  # noqa: F401  (registers heads)
from . import pvrcnn_head  # noqa: F401
from . import second_head  # noqa: F401
