"""Model layer: flax modules composed into detectors by config.

Mirror of the reference's 8-slot detector composition
(pcdet/models/detectors/detector3d_template.py:23-26) re-expressed as pure
functional flax modules over a batch dict of fixed-shape arrays.
"""
from .detectors import build_network  # noqa: F401
