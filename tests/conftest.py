"""Test env: force a virtual 8-device CPU platform before jax import.

Multi-chip sharding logic is tested on this virtual mesh (the reference could
only test distributed paths by launching real multi-GPU jobs; see SURVEY §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
