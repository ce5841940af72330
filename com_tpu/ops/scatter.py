"""Segment reductions and BEV scatter — the torch_scatter replacement.

The reference's dynamic VFEs rely on torch_scatter.scatter_max over unique
voxel hashes (pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:36-46).  On
TPU the same role is played by jax segment reductions over *fixed-size* segment
spaces (the dense BEV grid), which XLA lowers to scatter ops with static
shapes.  Keeping the segment space = the BEV canvas fuses voxelization,
feature max-pooling, and the PointPillarScatter into one pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_max(data, segment_ids, num_segments, fill=0.0):
    """Masked segment max; empty segments -> fill (not -inf)."""
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, fill)


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, eps=1e-8):
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1] + (1,) * (data.ndim - 1), dtype=data.dtype)
    cnt = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return s / jnp.clip(cnt, eps, None)


def compact_canvas_max(x, sseg, hw: int, cap: int, force=None):
    """Canvas max-scatter for PILLAR-SORTED point streams via run compaction.

    Equivalent to ``segment_max(x.reshape(B*N,C), global_ids,
    B*(hw+1))`` (the dense scatter in DynamicPillarVFE._sorted_scan) but
    scatters only one row per occupied pillar instead of one per point:

      1. per-point run max (Pallas segmented scan, ops/pallas/seg_scan);
      2. run starts -> at most ``cap`` (position, row) pairs via a static-
         size ``nonzero`` (a cumsum + narrow int scatter, no (N, C) traffic);
      3. gather the (cap, C) run maxima and max-scatter them to the canvas
         (indices sorted + unique -> XLA's fastest scatter path).

    The reference's torch_scatter.scatter_max works over pre-compacted
    unique voxels (dynamic_pillar_vfe.py:36-46) — this recovers that
    compactness on TPU without dynamic shapes.

    x: (B, N, C) sorted by sseg per sample; sseg: (B, N) ids in [0, hw]
    (hw = trash).  ``cap`` bounds the TOTAL run count across the flattened
    batch: occupied pillars summed over all B samples plus one trash run
    per sample (size it as B * (per-scene pillar budget + 1)).  Returns
    (canvas (B*(hw+1), C) with empty rows -inf, ok: scalar bool — False
    when the batch had more than ``cap`` runs; callers must fall back to
    the dense scatter to avoid dropping pillars).
    """
    from .pallas.seg_scan import run_bcast

    b, n, c = x.shape
    runmax = run_bcast(x, sseg, "max", force)
    segg = (sseg.astype(jnp.int32)
            + jnp.arange(b, dtype=jnp.int32)[:, None] * (hw + 1)).reshape(-1)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), segg[1:] != segg[:-1]])
    ok = start.sum() <= cap
    idx = jnp.nonzero(start, size=cap, fill_value=b * n)[0]
    rows = jnp.take(segg, idx, mode="fill", fill_value=b * (hw + 1))
    vals = jnp.take(runmax.reshape(b * n, c), idx, axis=0, mode="fill",
                    fill_value=-jnp.inf)
    # NOT unique_indices: the cap-minus-runs tail repeats the same OOB fill
    # row, and the scatter contract makes a violated uniqueness promise UB
    canvas = jnp.full((b * (hw + 1), c), -jnp.inf, x.dtype).at[rows].max(
        vals, indices_are_sorted=True, mode="drop")
    return canvas, ok


def scatter_to_bev(
    pillar_features: jax.Array,  # (P, C)
    flat_ids: jax.Array,  # (P,) int32 in [0, H*W], H*W = trash
    h: int,
    w: int,
) -> jax.Array:
    """Scatter pillar features into a dense (H, W, C) canvas (NHWC).

    PointPillarScatter parity (pcdet map_to_bev/pointpillar_scatter.py:5-37),
    NHWC because that is the native TPU conv layout.
    """
    c = pillar_features.shape[-1]
    canvas = jnp.zeros((h * w + 1, c), dtype=pillar_features.dtype)
    # .set, not .max: pillar ids are unique per sample and a max against
    # the zero canvas would clip negative (signed) features to 0
    canvas = canvas.at[flat_ids].set(pillar_features)
    return canvas[:-1].reshape(h, w, c)
