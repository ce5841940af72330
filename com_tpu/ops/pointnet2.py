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
    """(N, 3) x (M, 3) -> (N, M) squared euclidean distances."""
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


def ball_query(radius: float, nsample: int, xyz, new_xyz, valid=None):
    """(S, nsample) indices of points within radius of each center.

    Matches the CUDA ball_query semantics: the first ``nsample`` in-radius
    points in index order; empty slots repeat the first hit; a center with no
    hits returns all zeros with empty=True.
    Returns (idx (S, nsample) int32, empty (S,) bool).
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
    return idx, empty


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

    Returns (S, nsample, C[+3]) grouped features with empty groups zeroed."""
    idx, empty = ball_query(radius, nsample, xyz, new_xyz, valid)
    grouped_xyz = xyz[idx] - new_xyz[:, None, :]
    out = grouped_xyz
    if features is not None:
        grouped = features[idx]
        out = jnp.concatenate([grouped_xyz, grouped], axis=-1) if use_xyz else grouped
    return out * (~empty)[:, None, None].astype(out.dtype), idx, empty
