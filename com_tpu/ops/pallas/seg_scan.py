"""Pallas TPU kernels: segmented scans over pillar-sorted point rows.

The dynamic-pillar VFE needs three reductions per step, all of the form
"reduce over the points of each pillar, broadcast back per point":
cluster-mean statistics (sum), PFN max-pool feedback (max), and the final
max-pool into the BEV canvas.  XLA lowers `jax.ops.segment_*` to scatter,
which on TPU costs ~7-9 ms per (327k, 64) call — the round-1 train-step hot
spot (~137 of 210 ms; replaces the role of spconv Point2Voxel +
torch_scatter in the reference, pcdet/models/backbones_3d/vfe/
dynamic_pillar_vfe.py:36-46).

With points sorted by pillar id, every segment is a contiguous run, and the
per-point run-total becomes two streaming passes:

    total[i] = combine(fwd_incl_scan[i], rev_incl_scan[i])
       sum:  fwd + rev - vals        max:  maximum(fwd, rev)

Each pass is a sequential-grid Pallas kernel: a within-tile segmented scan
via log2(T) roll/select steps on VMEM-resident (T, C) blocks, plus a (1, C)
carry in scratch that flows across grid steps (TPU grids run in order).
Measured ~2.9 ms per (327k, 64) broadcast vs ~15 ms for the scatter+gather
pair it replaces — and the cost is flat in C from 8 to 128 lanes.

The public op is *batched*: vals (B, N, C) with per-sample sorted segment
ids.  The grid is (B, N/T) and the carry resets at each sample's first tile,
so samples never mix.  Under auto-SPMD the op carries a
custom_partitioning rule ("b n c, b n -> b n c", n/c replicated): the batch
axis shards over the data mesh and each device runs the kernel on its local
samples — no all-gather (tests/test_seg_scan.py::test_sharded_no_allgather).
Non-TPU backends fall back to `jax.ops.segment_*` (same semantics; the
fallback doubles as the parity oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024
_SENTINEL = jnp.iinfo(jnp.int32).max


def _combine(op, a, b):
    return a + b if op == "sum" else jnp.maximum(a, b)


def _fwd_kernel(op, t, seg_ref, val_ref, out_ref, cval_ref, cseg_ref):
    """Inclusive forward segmented scan over one (1, T, C) tile + carry."""
    i = pl.program_id(1)  # tile index within the sample; 0 resets the carry
    # Mosaic rotates require 32-bit lanes; scan in f32 (VMEM-local upcast)
    v = val_ref[0].astype(jnp.float32)  # (T, C)
    s = seg_ref[0]  # (T, 1) int32
    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    d = 1
    while d < t:
        sv = pltpu.roll(v, d, axis=0)
        ss = pltpu.roll(s, d, axis=0)
        ok = (row >= d) & (s == ss)
        v = jnp.where(ok, _combine(op, v, sv), v)
        d *= 2
    # carry from the previous tile applies to rows of the first run
    match = (s == cseg_ref[0]) & (i > 0)
    v = jnp.where(match, _combine(op, v, cval_ref[0:1, :]), v)
    out_ref[0] = v.astype(out_ref.dtype)
    cval_ref[0, :] = v[t - 1, :]
    cseg_ref[0] = s[t - 1, 0]


def _rev_kernel(op, t, seg_ref, val_ref, fwd_ref, out_ref, cval_ref, cseg_ref):
    """Reverse inclusive scan + combine with the forward scan -> run totals.

    The grid's tile axis iterates last-to-first (index_map reverses); the
    carry holds the suffix total of the run crossing the tile's top edge.
    """
    i = pl.program_id(1)
    v = val_ref[0].astype(jnp.float32)
    s = seg_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    d = 1
    while d < t:
        sv = pltpu.roll(v, t - d, axis=0)  # row j sees row j + d
        ss = pltpu.roll(s, t - d, axis=0)
        ok = (row < t - d) & (s == ss)
        v = jnp.where(ok, _combine(op, v, sv), v)
        d *= 2
    match = (s == cseg_ref[0]) & (i > 0)
    v = jnp.where(match, _combine(op, v, cval_ref[0:1, :]), v)
    cval_ref[0, :] = v[0, :]
    cseg_ref[0] = s[0, 0]
    f = fwd_ref[0].astype(jnp.float32)
    if op == "sum":
        total = f + v - val_ref[0].astype(jnp.float32)
    else:
        total = jnp.maximum(f, v)
    out_ref[0] = total.astype(out_ref.dtype)


def _pad(vals, seg, t):
    n = vals.shape[1]
    npad = (-n) % t
    if npad:
        vals = jnp.pad(vals, ((0, 0), (0, npad), (0, 0)))
        seg = jnp.pad(seg, ((0, 0), (0, npad)), constant_values=_SENTINEL)
    return vals, seg, n


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _run_bcast_pallas(vals, seg, op, interpret=False):
    t = _TILE
    vals, seg, n = _pad(vals, seg, t)
    b, npad_rows, c = vals.shape
    grid = npad_rows // t
    seg3 = seg.reshape(b, npad_rows, 1)

    scratch = [
        pltpu.VMEM((1, c), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, op, t),
        out_shape=jax.ShapeDtypeStruct(vals.shape, vals.dtype),
        grid=(b, grid),
        in_specs=[
            pl.BlockSpec((1, t, 1), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(seg3, vals)

    rev = lambda bi, i: (bi, grid - 1 - i, 0)  # noqa: E731
    total = pl.pallas_call(
        functools.partial(_rev_kernel, op, t),
        out_shape=jax.ShapeDtypeStruct(vals.shape, vals.dtype),
        grid=(b, grid),
        in_specs=[
            pl.BlockSpec((1, t, 1), lambda bi, i: (bi, grid - 1 - i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), rev, memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(seg3, vals, fwd)
    return total[:, :n]


def _run_bcast_ref(vals, seg, op):
    """Per-sample XLA segment-op oracle.  seg sorted -> compact rank ids keep
    the segment table at N+1 rows regardless of the id range."""

    def one(v, s):
        first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        rank = jnp.cumsum(first.astype(jnp.int32)) - 1
        num = int(v.shape[0]) + 1
        if op == "sum":
            table = jax.ops.segment_sum(v, rank, num_segments=num)
        else:
            table = jax.ops.segment_max(v, rank, num_segments=num)
            table = jnp.where(jnp.isfinite(table), table, jnp.zeros((), table.dtype))
        return table[rank]

    return jax.vmap(one)(vals, seg)


def _run_bcast_local(vals, seg, op, force=None):
    # COM_TPU_SEGSCAN=xla reroutes to the segment_sum/max reference path
    # even when the default backend is TPU — needed when lowering the step
    # for a DIFFERENT target than the process default (bench.py's CPU-target
    # cost analysis in an ambient-TPU process: the Mosaic kernel cannot
    # lower for CPU, pallas_call.py "Only interpret mode is supported").
    import os as _os
    import warnings as _warnings

    env = _os.environ.get("COM_TPU_SEGSCAN", "").lower()
    if env == "cpu":  # alias for the reference path, like force="cpu"
        env = "xla"
    elif env and env not in ("xla", "interpret", "tpu"):
        _warnings.warn(
            f"COM_TPU_SEGSCAN={env!r} not recognized (want xla|cpu|"
            "interpret|tpu); using default-backend dispatch", stacklevel=3)
        env = ""
    backend = force or (env if env in ("xla", "interpret") else None) \
        or jax.default_backend()
    if backend == "xla":
        return _run_bcast_ref(vals, seg, op)
    if backend == "tpu":
        return _run_bcast_pallas(vals, seg, op)
    if backend == "interpret":
        return _run_bcast_pallas(vals, seg, op, interpret=True)
    return _run_bcast_ref(vals, seg, op)


# --- auto-SPMD: shard the batch axis, run the kernel per device shard
# (custom_partitioning; COM_TPU_PARTITIONED_KERNELS=0 opts out, leaving the
# direct dispatch XLA treats as a replicated custom call). ---
import os  # noqa: E402

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

PARTITIONED = os.environ.get("COM_TPU_PARTITIONED_KERNELS", "1") == "1"


@functools.partial(custom_partitioning, static_argnums=(2, 3))
def _run_bcast_part(vals, seg, op, force=None):
    return _run_bcast_local(vals, seg, op, force)


def _run_bcast_impl(vals, seg, op, force=None):
    if PARTITIONED:
        return _run_bcast_part(vals, seg, op, force)
    return _run_bcast_local(vals, seg, op, force)


def _rb_partition(op, force, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    # divisible over batch and channels only: an N-sharded operand would
    # split segment runs across shard boundaries and reduce them locally
    # (silently wrong).  Demand N replicated; GSPMD reshards if needed.
    spec = arg_shapes[0].sharding.spec
    b_axis = spec[0] if len(spec) > 0 else None
    c_axis = spec[2] if len(spec) > 2 else None
    arg_shardings = (NamedSharding(mesh, P(b_axis, None, c_axis)),
                     NamedSharding(mesh, P(b_axis, None)))

    def lower_fn(vals, seg):
        return _run_bcast_local(vals, seg, op, force)

    return (mesh, lower_fn,
            NamedSharding(mesh, P(b_axis, None, c_axis)), arg_shardings)


def _rb_infer(op, force, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    b_axis = spec[0] if len(spec) > 0 else None
    c_axis = spec[2] if len(spec) > 2 else None
    return NamedSharding(mesh, P(b_axis, None, c_axis))


_run_bcast_part.def_partition(
    partition=_rb_partition,
    infer_sharding_from_operands=_rb_infer,
    sharding_rule="b n c, b n -> b n c",
    need_replication_factors=("n", "c"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def run_bcast(vals, seg, op: str = "sum", force: str | None = None):
    """Per-point run totals over pillar-sorted points, batched per sample.

    Args:
        vals: (B, N, C) float rows, sorted within each sample so equal `seg`
            ids are contiguous.
        seg: (B, N) int32 per-sample sorted segment ids (invalid/padded rows
            should carry a large id so they cluster at the end; they still
            get totals — callers mask them).
        op: "sum" | "max".
        force: override backend dispatch ("tpu" | "cpu" | "interpret"),
            for tests.

    Returns:
        (B, N, C): at row (b, i), the reduction of vals[b] over all rows j
        with seg[b, j] == seg[b, i].
    """
    assert op in ("sum", "max"), op
    return _run_bcast_impl(vals, seg, op, force)


def _run_bcast_fwd(vals, seg, op, force):
    # jax 0.9: fwd sees the original signature; bwd gets nondiff args first
    out = _run_bcast_impl(vals, seg, op, force)
    res = (seg,) if op == "sum" else (seg, vals, out)
    return out, res


def _run_bcast_bwd(op, force, res, g):
    seg = res[0]
    gsum = _run_bcast_impl(g, seg, "sum", force)
    if op == "sum":
        dvals = gsum
    else:
        _, vals, out = res
        # split the run cotangent EVENLY over tied maxima like
        # lax.reduce_max's VJP — under bf16, several points in a pillar
        # routinely round to the same max, and handing each the full gsum
        # would scale the gradient by the tie count
        tied = (vals == out).astype(gsum.dtype)
        nties = _run_bcast_impl(tied, seg, "sum", force)
        dvals = tied * gsum / jnp.maximum(nties, 1.0)
    dseg = jnp.zeros(seg.shape, dtype=jax.dtypes.float0)
    return dvals, dseg


run_bcast.defvjp(_run_bcast_fwd, _run_bcast_bwd)
