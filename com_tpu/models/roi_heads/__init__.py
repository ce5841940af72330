from . import pvrcnn_head  # noqa: F401  (registers heads)
