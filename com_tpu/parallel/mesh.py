"""Device mesh + sharding layout.

The distributed design (replaces the reference's NCCL DDP stack,
pcdet/utils/common_utils.py:144-186 + commu_utils.py):

* one `jax.sharding.Mesh` over all chips with a `data` axis (the reference is
  data-parallel only — SURVEY §2.8); `model` axis reserved for future tensor
  sharding of large BEV backbones.
* inputs sharded over `data` (batch axis), params/state replicated;
* gradient psum, loss normalizers, COMLoss EMA statistics and per-group
  confidence sums all become global reductions inserted by XLA — no explicit
  collectives in user code;
* the epoch-end device->host curriculum feedback is one small (C, G) transfer.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data_axis: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices) if data_axis is None else data_axis
    return Mesh(np.asarray(devices[:n]).reshape(n), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
