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
    canvas = canvas.at[flat_ids].max(pillar_features)
    return canvas[:-1].reshape(h, w, c)
