"""Pallas TPU kernel: per-object window stamping onto a dense canvas.

Replaces the XLA scatter formulation of gaussian-heatmap stamping
(``ops.gaussian.draw_gaussians``) and COM curriculum-mask stamping
(``ops.gaussian.stamp_squares_last_wins``) inside the train step.  Both are
the TPU-native rebuild of the reference's per-object host loops
(pcdet/models/model_utils/centernet_utils.py:84-131,
pcdet/models/dense_heads/curriculum_center_head.py:162-204,
pcdet/utils/loss_utils.py:1227-1291).

Why not scatter: each of the (up to) 500 padded objects stamps a
(2R+1)^2 = 33x33 window, so the XLA path scatters ~1.1M overlapping
elements per batch into the (C,H,W) canvas with a max/rank combiner —
TPU lowers that to a serialized scatter loop measured at ~10 ms per call
at Waymo pillar scale, and the train step pays it twice (target assign +
loss mask).  Here the whole padded canvas lives in VMEM and a sequential
`fori_loop` over objects does a read-modify-write of one 33-row slab per
*valid* object:

* rows: dynamic sublane-offset slice ``out_ref[pl.ds(row_base, Kp), :]``
  where ``row_base = (cls*Hp + cy) & ~7`` — Mosaic requires dynamic
  sublane offsets to be provably 8-aligned, so the slab is widened from
  K = 2R+1 to Kp = roundup(K+7, 8) rows and the in-window mask absorbs
  the 0..7-row phase.  Class channels are stacked with a +/-R row margin
  each, so a window never crosses a class boundary and out-of-canvas
  rows land in the margin, which is cropped after the kernel — same
  truncation semantics as the reference's min(x, r)/min(W-x, r+1)
  window clipping; a trailing 8-row global margin absorbs the slab
  widening of the last class;
* lanes: no dynamic lane slicing (the TPU's slow axis) — the full padded
  lane row is processed with an iota mask, and the gaussian value is
  computed analytically ``exp(-(dx^2+dy^2)/(2*sigma^2))`` instead of
  gathered from a table (f32 exp agrees with the f64-built table to
  ~1e-7 absolute — inside every golden tolerance);
* invalid/padded objects are encoded as radius = -1 and skipped with
  ``pl.when``, so cost scales with the number of real objects, not the
  500-row padding envelope.

Modes:
  gauss      max-combine gaussian windows (heatmap targets)
  last_wins  overwrite the square window with a per-object constant;
             ascending object order makes the highest index win ties,
             matching the reference's sequential loop.

Dispatch: ``COM_TPU_STAMP`` env — "" (default: pallas on TPU, XLA
reference path elsewhere), "xla"/"cpu" (force the scatter reference
path), "interpret" (pallas interpreter, for CPU parity tests).  Under
auto-SPMD the op carries a custom_partitioning rule that shards the
batch axis and replicates the rest, like seg_scan.run_bcast.
"""
from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Canvas VMEM budget guard: (C*Hp, Wp) f32 must fit comfortably alongside
# the scalar arrays; past this we fall back to the XLA scatter path.
_VMEM_BYTES_MAX = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _stamp_kernel(mode, n, hp, wp, kp, r, fill,
                  cx_ref, cy_ref, rr_ref, cls_ref, val_ref, out_ref):
    b = pl.program_id(0)
    out_ref[...] = jnp.full(out_ref.shape, fill, out_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (kp, wp), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (kp, wp), 0)

    def body(i, carry):
        ri = rr_ref[b, i]

        @pl.when(ri >= 0)
        def _():
            cxi = cx_ref[b, i]
            cyi = cy_ref[b, i]
            ci = cls_ref[b, i]
            row_start = ci * hp + cyi
            row_base = (row_start // 8) * 8  # Mosaic: 8-aligned sublane offs
            slab = out_ref[0, pl.ds(row_base, kp), :]
            dx = lane - (cxi + r)
            dy = rowi - (row_start - row_base) - r
            inside = (jnp.abs(dx) <= ri) & (jnp.abs(dy) <= ri)
            if mode == "gauss":
                d2 = (dx * dx + dy * dy).astype(jnp.float32)
                sig = (2 * ri + 1).astype(jnp.float32) / 6.0
                g = jnp.exp(-d2 / (2.0 * sig * sig)).astype(out_ref.dtype)
                new = jnp.where(inside, jnp.maximum(slab, g), slab)
            else:
                vi = val_ref[b, i].astype(out_ref.dtype)
                new = jnp.where(inside, vi, slab)
            out_ref[0, pl.ds(row_base, kp), :] = new

        return carry

    jax.lax.fori_loop(0, n, body, 0)


def stamp_fits_vmem(num_classes: int, fmap_h: int, fmap_w: int,
                    max_radius: int) -> bool:
    hp = fmap_h + 2 * max_radius
    wp = _round_up(fmap_w + 2 * max_radius, 128)
    total_rows = _round_up(num_classes * hp + 8, 8)
    return total_rows * wp * 4 <= _VMEM_BYTES_MAX


def _stamp_pallas(centers, radii, class_ids, values, valid, num_classes,
                  fmap_h, fmap_w, mode, fill, max_radius, interpret=False):
    """(B,N,...) object arrays -> (B, num_classes, fmap_h, fmap_w) f32.

    Requires integer centers already inside the feature map (the assigners
    clamp coords before casting, target_assign.py:118-121); they are
    re-clamped here as a belt against garbage in padded rows.
    """
    b, n = radii.shape
    r = int(max_radius)
    k = 2 * r + 1
    kp = _round_up(k + 7, 8)  # slab widened for 8-aligned dynamic offsets
    hp = fmap_h + 2 * r
    wp = _round_up(fmap_w + 2 * r, 128)
    total_rows = _round_up(num_classes * hp + 8, 8)
    cx = jnp.clip(centers[..., 0].astype(jnp.int32), 0, fmap_w - 1)
    cy = jnp.clip(centers[..., 1].astype(jnp.int32), 0, fmap_h - 1)
    rr = jnp.where(valid, jnp.clip(radii.astype(jnp.int32), 0, r), -1)
    cls = jnp.clip(class_ids.astype(jnp.int32), 0, num_classes - 1)
    vals = values.astype(jnp.float32)
    kern = functools.partial(_stamp_kernel, mode, n, hp, wp, kp, r,
                             float(fill))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b,),
            in_specs=[],
            out_specs=pl.BlockSpec((1, total_rows, wp),
                                   lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, total_rows, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(cx, cy, rr, cls, vals)
    out = out[:, :num_classes * hp, :].reshape(b, num_classes, hp, wp)
    return out[:, :, r:r + fmap_h, r:r + fmap_w]


def stamp_backend() -> str:
    """Resolve the stamping backend from COM_TPU_STAMP / default backend."""
    env = os.environ.get("COM_TPU_STAMP", "").lower()
    if env in ("xla", "cpu"):
        return "xla"
    if env == "interpret":
        return "interpret"
    if env and env != "tpu":
        warnings.warn(
            f"COM_TPU_STAMP={env!r} not recognized (want xla|cpu|interpret|"
            "tpu); using default-backend dispatch", stacklevel=2)
    return jax.default_backend()


# --- auto-SPMD: shard the batch axis, replicate objects/canvas dims ---
from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

PARTITIONED = os.environ.get("COM_TPU_PARTITIONED_KERNELS", "1") == "1"


@functools.partial(custom_partitioning, static_argnums=(5, 6, 7, 8, 9, 10, 11))
def _stamp_part(centers, radii, class_ids, values, valid, num_classes,
                fmap_h, fmap_w, mode, fill, max_radius, interpret):
    return _stamp_pallas(centers, radii, class_ids, values, valid,
                         num_classes, fmap_h, fmap_w, mode, fill,
                         max_radius, interpret=interpret)


def _sp_batch_axis(arg_shapes):
    spec = arg_shapes[0].sharding.spec
    return spec[0] if len(spec) > 0 else None


def _sp_partition(num_classes, fmap_h, fmap_w, mode, fill, max_radius,
                  interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    b_axis = _sp_batch_axis(arg_shapes)
    arg_shardings = (
        NamedSharding(mesh, P(b_axis, None, None)),  # centers (B,N,2)
        NamedSharding(mesh, P(b_axis, None)),        # radii
        NamedSharding(mesh, P(b_axis, None)),        # class_ids
        NamedSharding(mesh, P(b_axis, None)),        # values
        NamedSharding(mesh, P(b_axis, None)),        # valid
    )

    def lower_fn(centers, radii, class_ids, values, valid):
        return _stamp_pallas(centers, radii, class_ids, values, valid,
                             num_classes, fmap_h, fmap_w, mode, fill,
                             max_radius, interpret=interpret)

    out_sharding = NamedSharding(mesh, P(b_axis, None, None, None))
    return mesh, lower_fn, out_sharding, arg_shardings


def _sp_infer(num_classes, fmap_h, fmap_w, mode, fill, max_radius,
              interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(_sp_batch_axis(arg_shapes), None, None, None))


_stamp_part.def_partition(
    partition=_sp_partition,
    infer_sharding_from_operands=_sp_infer,
    sharding_rule="b n two, b n, b n, b n, b n -> b c h w",
    need_replication_factors=("n", "two", "c", "h", "w"),
)


def stamp_windows(centers, radii, class_ids, values, valid, num_classes,
                  fmap_h, fmap_w, mode, fill=0.0, max_radius=16,
                  interpret=False):
    """Batched window stamping (pallas path; see module docstring)."""
    if PARTITIONED and not interpret:
        return _stamp_part(centers, radii, class_ids, values, valid,
                           num_classes, fmap_h, fmap_w, mode, float(fill),
                           int(max_radius), interpret)
    return _stamp_pallas(centers, radii, class_ids, values, valid,
                         num_classes, fmap_h, fmap_w, mode, float(fill),
                         int(max_radius), interpret=interpret)
