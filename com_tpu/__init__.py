"""com_tpu — a TPU-native LiDAR 3D detection framework with curriculum learning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ZZY816/COM
(OpenPCDet-based curriculum learning for Waymo, CVPR 2023).  The compute path is
pure JAX (jit/pjit over a device mesh, Pallas kernels for hot ops); the host
path (data pipeline, GT database sampling, curriculum feedback) is
numpy + optional C++ native ops.
"""

__version__ = "0.1.0"
