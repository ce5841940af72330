from . import center_head  # noqa: F401  (registers heads)
from . import target_assign  # noqa: F401
