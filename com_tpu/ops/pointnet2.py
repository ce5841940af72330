"""PointNet++ primitives — jittable, fixed-shape (TPU-native pointnet2).

Replaces the pointnet2_batch / pointnet2_stack CUDA extensions
(pcdet/ops/pointnet2_*/src: ball_query, farthest_point_sampling,
group_points, gather, three_nn, three_interpolate — SURVEY §2.7) with pure
JAX: distance matrices on the VPU/MXU, lax.fori_loop for the sequential FPS
dependency, top-k for neighbor selection.  All functions take validity masks
and produce fixed-size outputs, so they compose into jitted models
(PV-RCNN-family keypoint abstraction).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10


def square_distance(a, b):
    """(N, 3) x (M, 3) -> (N, M) squared euclidean distances.

    Deliberately the broadcast-subtract form, NOT the |a|^2+|b|^2-2ab MXU
    identity: at lidar coordinate magnitudes (|x| up to ~75 m, |a|^2 ~ 5e3)
    the matmul form loses ~1e-3 absolute to f32 cancellation, enough to
    flip borderline radius tests in ball_query; XLA fuses this
    subtract/square/reduce into one VPU pass without materializing
    (N, M, 3)."""
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def farthest_point_sample(xyz, valid, num_samples: int):
    """Iterative FPS (farthest_point_sampling_wrapper parity).

    Returns (num_samples,) int32 indices; starts from index 0 like the CUDA
    kernel.  Invalid points are never selected.
    """
    n = xyz.shape[0]
    dist = jnp.where(valid, _BIG, -_BIG)  # running min-dist to selected set

    def body(i, state):
        dist, idxs = state
        last = idxs[i - 1]
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        d = jnp.where(valid, d, -_BIG)
        dist = jnp.minimum(dist, d)
        idxs = idxs.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return dist, idxs

    idxs0 = jnp.zeros((num_samples,), jnp.int32)
    first = jnp.argmax(valid).astype(jnp.int32)  # first valid point
    idxs0 = idxs0.at[0].set(first)
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (dist, idxs0))
    return idxs


def sector_fps(xyz, valid, num_sampled_points: int, num_sectors: int):
    """Sector-partitioned FPS (voxel_set_abstraction.py:78-123 sector_fps):
    points are split into azimuth sectors and FPS runs per sector so distant
    sectors keep coverage.  Static-shape variant: each sector contributes an
    equal share num_sampled/num_sectors (the reference draws proportional,
    data-dependent counts — documented deviation); empty sectors yield
    invalid slots.  Returns (idx (num_sampled,), valid (num_sampled,))."""
    share = num_sampled_points // num_sectors
    rem = num_sampled_points - share * num_sectors
    angles = jnp.arctan2(xyz[:, 1], xyz[:, 0]) + jnp.pi
    sector = jnp.clip(
        jnp.floor(angles / (2 * jnp.pi / num_sectors)), 0, num_sectors - 1
    ).astype(jnp.int32)
    idx_parts, val_parts = [], []
    for k in range(num_sectors):
        m = valid & (sector == k)
        n = share + (rem if k == 0 else 0)
        idx = farthest_point_sample(xyz, m, n)
        idx_parts.append(idx)
        val_parts.append(m[idx] & m.any())
    return jnp.concatenate(idx_parts), jnp.concatenate(val_parts)


def sample_points_with_roi(rois, roi_valid, xyz, valid,
                           sample_radius_with_roi: float):
    """Mask of points within (roi bev radius + margin) of any RoI center
    (voxel_set_abstraction.py:45-76 sample_points_with_roi role)."""
    d2 = square_distance(xyz, rois[:, 0:3])  # (N, R)
    roi_r = jnp.linalg.norm(rois[:, 3:6] / 2, axis=-1) + sample_radius_with_roi
    near = d2 < (roi_r[None, :] ** 2)
    near = near & roi_valid[None, :]
    return near.any(axis=1) & valid


def vector_pool_features(xyz, feats, valid, new_xyz, num_local_voxel,
                         max_neighbor_distance: float, nsample: int,
                         aggregation: str = "local_interpolation"):
    """VectorPool local-structure features (pointnet2_stack vector_pool ops,
    PV-RCNN++ VectorPoolAggregationModule core): partition each query's
    (2d)^3 cube into nx*ny*nz sub-voxels and produce per-sub-voxel features
    — either the mean of member neighbors ('voxel_avg_pool') or 3-NN
    inverse-distance interpolation at the sub-voxel centers
    ('local_interpolation').  Returns (S, V3 * (3 + C)) with relative-xyz
    positional channels, zeroed for empty queries.
    """
    nxv, nyv, nzv = (int(v) for v in num_local_voxel)
    v3 = nxv * nyv * nzv
    d = float(max_neighbor_distance)
    s = new_xyz.shape[0]
    c = feats.shape[-1]

    # slot_valid (not a recomputed distance test) marks real hits: the
    # repeat-padded duplicate slots would skew the sub-voxel means and the
    # 3-NN interpolation weights (the reference vector-pool CUDA kernels
    # count true members)
    idx, empty, hit = ball_query(d, nsample, xyz, new_xyz, valid)
    nx_xyz = xyz[idx]  # (S, K, 3)
    nf = feats[idx]
    rel = nx_xyz - new_xyz[:, None, :]

    # sub-voxel centers of the local cube, in relative coords
    def centers_1d(n):
        return (jnp.arange(n, dtype=xyz.dtype) + 0.5) / n * (2 * d) - d

    cx, cy, cz = centers_1d(nxv), centers_1d(nyv), centers_1d(nzv)
    grid = jnp.stack(jnp.meshgrid(cx, cy, cz, indexing="ij"), axis=-1)
    grid = grid.reshape(v3, 3)  # (V3, 3) relative centers

    if aggregation == "voxel_avg_pool":
        cell = jnp.floor((rel + d) / (2 * d) * jnp.asarray(
            [nxv, nyv, nzv], xyz.dtype))
        cell = jnp.clip(cell, 0, jnp.asarray([nxv - 1, nyv - 1, nzv - 1],
                                             xyz.dtype)).astype(jnp.int32)
        flat = (cell[..., 0] * nyv + cell[..., 1]) * nzv + cell[..., 2]
        flat = jnp.where(hit, flat, v3)
        payload = jnp.concatenate([rel, nf], axis=-1)  # (S, K, 3+C)

        def pool_one(fl, pay):
            ssum = jax.ops.segment_sum(pay, fl, num_segments=v3 + 1)[:-1]
            cnt = jax.ops.segment_sum(
                jnp.ones((fl.shape[0], 1), pay.dtype), fl,
                num_segments=v3 + 1)[:-1]
            return ssum / jnp.clip(cnt, 1.0, None)

        pooled = jax.vmap(pool_one)(flat, payload)  # (S, V3, 3+C)
    else:  # local_interpolation at sub-voxel centers
        # distances (S, V3, K) from centers to neighbors (relative coords)
        d2 = ((grid[None, :, None, :] - rel[:, None, :, :]) ** 2).sum(-1)
        d2 = jnp.where(hit[:, None, :], d2, 1e10)
        neg_top, nn_idx = jax.lax.top_k(-d2, 3)  # (S, V3, 3)
        nn_d2 = jnp.clip(-neg_top, 1e-8, None)
        w = 1.0 / nn_d2
        w = w / w.sum(axis=-1, keepdims=True)
        nn_feat = jnp.take_along_axis(
            nf[:, None, :, :].repeat(v3, 1), nn_idx[..., None], axis=2)
        interp = (nn_feat * w[..., None]).sum(axis=2)  # (S, V3, C)
        interp = interp * hit.any(-1)[:, None, None].astype(interp.dtype)
        pooled = jnp.concatenate(
            [jnp.broadcast_to(grid[None], (s, v3, 3)), interp], axis=-1)

    pooled = pooled * (~empty)[:, None, None].astype(pooled.dtype)
    return pooled.reshape(s, v3 * (3 + c)), empty


def ball_query(radius: float, nsample: int, xyz, new_xyz, valid=None):
    """(S, nsample) indices of points within radius of each center.

    Matches the CUDA ball_query semantics: the first ``nsample`` in-radius
    points in index order; empty slots repeat the first hit; a center with no
    hits returns all zeros with empty=True.
    Returns (idx (S, nsample) int32, empty (S,) bool, slot_valid
    (S, nsample) bool).  slot_valid marks REAL hits: the repeat-padded
    slots are duplicates of hit 0 — harmless under max-pooling (reference
    SA modules) but they'd skew means/interpolation weights, so
    count-sensitive consumers must mask with it.
    """
    d2 = square_distance(new_xyz, xyz)  # (S, N)
    if valid is not None:
        d2 = jnp.where(valid[None, :], d2, _BIG)
    hit = d2 < radius * radius  # (S, N)
    n = xyz.shape[0]
    # rank hits by index order: non-hits pushed to the end
    order_key = jnp.where(hit, jnp.arange(n)[None, :], n + jnp.arange(n)[None, :])
    idx_sorted = jnp.argsort(order_key, axis=1)[:, :nsample].astype(jnp.int32)
    hit_sorted = jnp.take_along_axis(hit, idx_sorted, axis=1)
    first = idx_sorted[:, :1]
    idx = jnp.where(hit_sorted, idx_sorted, first)
    empty = ~hit.any(axis=1)
    idx = jnp.where(empty[:, None], 0, idx)
    return idx, empty, hit_sorted


def group_points(features, idx):
    """(N, C) gather by (S, K) -> (S, K, C) (group_points_wrapper parity)."""
    return features[idx]


def gather_points(features, idx):
    """(N, C) gather by (S,) -> (S, C)."""
    return features[idx]


def three_nn(unknown, known, known_valid=None):
    """3 nearest known points per unknown point (three_nn_wrapper parity).

    Returns (dist (N, 3), idx (N, 3))."""
    d2 = square_distance(unknown, known)
    if known_valid is not None:
        d2 = jnp.where(known_valid[None, :], d2, _BIG)
    neg_top, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.clip(-neg_top, 0.0, None)), idx.astype(jnp.int32)


def three_interpolate(features, idx, dist):
    """Inverse-distance weighted interpolation (three_interpolate parity).

    features (M, C), idx (N, 3), dist (N, 3) -> (N, C)."""
    w = 1.0 / jnp.clip(dist * dist, 1e-8, None)
    w = w / w.sum(axis=1, keepdims=True)
    return (features[idx] * w[..., None]).sum(axis=1)


def query_and_group(radius, nsample, xyz, new_xyz, features, valid=None,
                    use_xyz=True):
    """Ball-query + relative-xyz grouping (QueryAndGroup module parity).

    Returns (grouped (S, nsample, C[+3]) with empty groups zeroed, idx,
    empty (S,), slot_valid (S, nsample) marking real hits vs the
    duplicate-padded slots)."""
    idx, empty, slot_valid = ball_query(radius, nsample, xyz, new_xyz, valid)
    grouped_xyz = xyz[idx] - new_xyz[:, None, :]
    out = grouped_xyz
    if features is not None:
        grouped = features[idx]
        out = jnp.concatenate([grouped_xyz, grouped], axis=-1) if use_xyz else grouped
    return out * (~empty)[:, None, None].astype(out.dtype), idx, empty, slot_valid
