"""Activation-sharding constraints for hybrid (data x spatial x model) meshes.

The reference scales by data-parallel DDP only (pcdet/utils/common_utils.py
:144-186); on TPU the natural extra axes are

* ``spatial`` — shard the BEV canvas rows (H axis) across chips.  XLA's SPMD
  partitioner inserts the halo exchanges for spatially-sharded convolutions
  automatically, so the 2D backbone runs on H-shards with ring transfers of
  a 1-row halo over ICI; canvas memory and conv FLOPs per chip drop by the
  axis size.  This is the memory lever for large grids (the 468x468 Waymo
  canvas) that pure DP does not give.
* ``model`` — shard conv kernels over output channels; GSPMD propagates the
  channel sharding through elementwise/BN ops and inserts the contraction
  psum at the next conv.

Modules mark their canvas tensors via :func:`constrain`; with no active mesh
(or a mesh without the named axes) it is an exact no-op, so single-chip and
pure-DP paths are untouched.  ``activate(mesh)`` is process-global on
purpose — the mesh is a per-process training resource, not per-call state.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: dict = {"mesh": None}


def activate(mesh: Mesh | None) -> None:
    """Set (or clear, with None) the process-global mesh for constraints."""
    _ACTIVE["mesh"] = mesh


def active_mesh() -> Mesh | None:
    return _ACTIVE["mesh"]


def constrain(x, *spec):
    """with_sharding_constraint(x, P(*spec)) against the active mesh.

    Axis names absent from the active mesh are dropped to None; with no
    active mesh this is the identity.  Tuple entries keep only present axes.
    """
    mesh = _ACTIVE["mesh"]
    if mesh is None:
        return x
    names = set(mesh.axis_names)

    def _keep(e):
        if e is None:
            return None
        if isinstance(e, (tuple, list)):
            kept = tuple(a for a in e if a in names)
            return kept if kept else None
        return e if e in names else None

    cleaned = tuple(_keep(e) for e in spec)
    if all(e is None for e in cleaned):
        return x
    # size-1 axes stay in the spec (harmless no-op constraints)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*cleaned)))


def replicate(x):
    """Force x fully replicated on the active mesh (identity without one).

    constrain() skips an all-None spec as "nothing requested", so it cannot
    express replication — this can.  Needed where a sharded layout is
    actively hazardous: XLA's SPMD partitioner miscompiles
    conv(spatial-sharded input, output-feature-sharded kernel) — measured
    err ~3.6 on unit-scale data, reproduced on the CPU backend 2026-08-19
    (tools kept in tests/test_hybrid_sharding.py) — so assembled conv
    weights must be pinned replicated before the conv."""
    mesh = _ACTIVE["mesh"]
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def canvas_spec():
    """PartitionSpec entries for a (B, H, W, C) BEV canvas."""
    return ("data", "spatial", None, None)
