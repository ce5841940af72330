"""RoI-aware 3D pooling (pcdet/ops/roiaware_pool3d CUDA extension role).

Vectorized, fixed-shape: per RoI, gather up to ``max_pts`` member points
(mask + top-k), bin them into an out_size^3 canonical grid, and reduce per
cell with max or avg — replacing roiaware_pool3d_kernel.cu's
per-(roi, point) membership scan + per-cell pooling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def points_in_roi_local(points, roi):
    """Canonical-frame coords + membership for one roi (7,). points (N, 3)."""
    shifted = points - roi[0:3]
    c, s = jnp.cos(-roi[6]), jnp.sin(-roi[6])
    lx = shifted[:, 0] * c - shifted[:, 1] * s
    ly = shifted[:, 0] * s + shifted[:, 1] * c
    lz = shifted[:, 2]
    local = jnp.stack([lx, ly, lz], axis=1)
    inside = (jnp.abs(local) <= roi[3:6] / 2).all(axis=1)
    return local, inside


def roiaware_pool3d(
    points,  # (N, 3) world coords
    feats,  # (N, C)
    valid,  # (N,) bool
    rois,  # (R, 7)
    out_size: int = 12,
    max_pts: int = 128,
    method: str = "max",
):
    """Returns (R, S, S, S, C) pooled features (RoIAwarePool3d.forward role).

    Cell layout matches the CUDA kernel: x/y/z binned into S cells of the
    canonical box; empty cells are zero.
    """
    s3 = out_size**3
    n, c = feats.shape
    max_pts = min(max_pts, n)

    def per_roi(roi):
        local, inside = points_in_roi_local(points, roi)
        inside = inside & valid & (roi[3:6] > 0).all()
        score, idx = jax.lax.top_k(inside.astype(jnp.float32), max_pts)
        hit = score > 0
        idx = jnp.where(hit, idx, 0)
        pl = local[idx]  # (K, 3)
        pf = feats[idx] * hit[:, None].astype(feats.dtype)
        cell = jnp.floor(
            (pl + roi[3:6] / 2) / jnp.clip(roi[3:6], 1e-6, None) * out_size
        ).astype(jnp.int32)
        cell = jnp.clip(cell, 0, out_size - 1)
        flat = (cell[:, 0] * out_size + cell[:, 1]) * out_size + cell[:, 2]
        seg = jnp.where(hit, flat, s3)
        if method == "max":
            pooled = jax.ops.segment_max(pf, seg, num_segments=s3 + 1)[:-1]
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        else:
            ssum = jax.ops.segment_sum(pf, seg, num_segments=s3 + 1)[:-1]
            cnt = jax.ops.segment_sum(
                hit.astype(pf.dtype)[:, None], seg, num_segments=s3 + 1)[:-1]
            pooled = ssum / jnp.clip(cnt, 1.0, None)
        return pooled.reshape(out_size, out_size, out_size, c)

    return jax.vmap(per_roi)(rois)


def roipoint_pool3d(
    points,  # (N, 3)
    feats,  # (N, C) point features (xyz NOT included)
    valid,  # (N,)
    rois,  # (R, 7)
    num_sampled_points: int = 512,
):
    """RoIPointPool3d role (pcdet/ops/roipoint_pool3d): per RoI, the first
    ``num_sampled_points`` member points' [local_xyz | feats], zero-padded,
    plus an empty flag."""
    if points.shape[0] < num_sampled_points:  # keep the (R, K, C) contract
        pad = num_sampled_points - points.shape[0]
        points = jnp.pad(points, ((0, pad), (0, 0)))
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))

    def per_roi(roi):
        local, inside = points_in_roi_local(points, roi)
        inside = inside & valid
        score, idx = jax.lax.top_k(inside.astype(jnp.float32), num_sampled_points)
        hit = score > 0
        idx = jnp.where(hit, idx, idx[:1])
        out = jnp.concatenate([local[idx], feats[idx]], axis=1)
        out = out * hit[:, None].astype(out.dtype)
        return out, ~hit.any()

    return jax.vmap(per_roi)(rois)
