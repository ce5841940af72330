from . import anchor_head  # noqa: F401  (registers heads)
from . import center_head  # noqa: F401
from . import target_assign  # noqa: F401
