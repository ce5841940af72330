"""Test env: force a virtual 8-device CPU platform.

The axon TPU plugin's sitecustomize imports jax at interpreter start, so the
``jax_platforms`` config is snapshotted from the launch env and later
``os.environ`` edits are ignored — ``jax.config.update`` is the only reliable
override.  XLA_FLAGS is still read lazily at client creation, so the
8-virtual-device flag works from here.

Multi-chip sharding logic is tested on this virtual mesh (the reference could
only test its distributed paths by launching real multi-GPU jobs; SURVEY §4).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
