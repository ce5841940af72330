"""Device mesh + sharding layout.

The distributed design (replaces the reference's NCCL DDP stack,
pcdet/utils/common_utils.py:144-186 + commu_utils.py):

* one `jax.sharding.Mesh` over all chips with a `data` axis (the reference is
  data-parallel only — SURVEY §2.8); optional hybrid `data x spatial x model`
  layouts go beyond the reference: `spatial` shards BEV canvas rows (XLA
  inserts conv halo exchanges), `model` shards conv output channels (see
  parallel/sharding.py).
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


def make_mesh(devices=None, data_axis: int | None = None,
              spatial: int = 1, model: int = 1) -> Mesh:
    """Build the device mesh.

    Default: one ``data`` axis over all chips (pure DP — the reference's only
    mode).  ``spatial``/``model`` > 1 carve those chips into a hybrid
    ``data x spatial x model`` mesh: ``spatial`` shards the BEV canvas rows
    (XLA inserts conv halo exchanges), ``model`` shards conv output channels
    (see parallel/sharding.py).  ``data_axis`` still bounds the total chips
    used; the data axis size becomes ``n // (spatial * model)``.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices) if data_axis is None else data_axis
    if spatial == 1 and model == 1:
        return Mesh(np.asarray(devices[:n]).reshape(n), axis_names=("data",))
    if n % (spatial * model):
        raise ValueError(f"{n} devices not divisible by spatial*model "
                         f"{spatial}*{model}")
    d = n // (spatial * model)
    return Mesh(np.asarray(devices[:n]).reshape(d, spatial, model),
                axis_names=("data", "spatial", "model"))


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


def _leaf_spec(path, x, model: int):
    """Model-axis spec for one param/opt-state leaf.

    Only conv kernels (rank-4 HWIO) and dense kernels (rank-2 IO) — leaves
    whose tree path ends in ``kernel``, which Adam-moment trees mirror —
    shard their output-channel axis over ``model`` when divisible;
    everything else (biases, BN scales, curriculum stats, scalars)
    replicates.  GSPMD then propagates the channel sharding through
    elementwise ops and inserts the contraction psum at the next
    conv/dense — no hand-written collectives.
    """
    shape = getattr(x, "shape", ())
    is_kernel = any(
        getattr(p, "key", getattr(p, "name", None)) == "kernel" for p in path
    )
    if is_kernel and len(shape) in (2, 4) and shape[-1] % model == 0:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_state(state, mesh: Mesh):
    """Place train state on the mesh: replicated on data/spatial; kernels
    sharded over the model axis when present (falls back to replicate_state
    on a pure-DP mesh)."""
    if "model" not in mesh.axis_names:
        return replicate_state(state, mesh)
    m = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(
            x, NamedSharding(mesh, _leaf_spec(p, x, m))),
        state)


def init_multihost(tcp_port: int | None = None):
    """Initialize jax.distributed for multi-host runs.

    Mirrors the reference's two launchers (common_utils.py:144-186):
    * under SLURM (``SLURM_PROCID`` set) with an explicit ``tcp_port``,
      derive the coordinator from the first node of the step's node list via
      ``scontrol show hostname`` — the reference's init_dist_slurm
      (common_utils.py:154-168) does exactly this for NCCL;
    * otherwise defer to ``jax.distributed.initialize()`` auto-detection
      (TPU pod runtime / cloud metadata / jax's own SLURM detector).
    """
    import os
    import subprocess

    if os.environ.get("SLURM_PROCID") is not None and tcp_port:
        proc_id = int(os.environ["SLURM_PROCID"])
        ntasks = int(os.environ["SLURM_NTASKS"])
        node_list = os.environ.get("SLURM_STEP_NODELIST",
                                   os.environ.get("SLURM_NODELIST", ""))
        addr = subprocess.run(
            ["scontrol", "show", "hostname", node_list],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()[0].strip()
        jax.distributed.initialize(
            coordinator_address=f"{addr}:{int(tcp_port)}",
            num_processes=ntasks, process_id=proc_id,
        )
        return proc_id, ntasks
    jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
