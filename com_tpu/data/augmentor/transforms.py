"""Geometry kernels for augmentation (numpy, host pipeline).

Role of pcdet/datasets/augmentor/augmentor_utils.py:8-658 — global
flip/rotation/scaling/translation plus per-object (local) variants.  All
functions take and return (points, gt_boxes) and use the caller's numpy RNG
stream so runs are deterministic per seed.
"""
from __future__ import annotations

import numpy as np

from ...utils.common import rotate_points_along_z
from ...ops.boxes import points_in_rbbox


def random_flip_along_x(gt_boxes, points, rng=np.random):
    if rng.random() < 0.5:
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points, rng=np.random):
    if rng.random() < 0.5:
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range, rng=np.random):
    angle = rng.uniform(rot_range[0], rot_range[1])
    points[:, :3] = rotate_points_along_z(points[None, :, :3], np.array([angle]))[0]
    gt_boxes[:, :3] = rotate_points_along_z(gt_boxes[None, :, :3], np.array([angle]))[0]
    gt_boxes[:, 6] += angle
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate(
            [gt_boxes[:, 7:9], np.zeros((len(gt_boxes), 1), gt_boxes.dtype)], axis=1
        )
        gt_boxes[:, 7:9] = rotate_points_along_z(vel[None], np.array([angle]))[0][:, :2]
    return gt_boxes, points


def global_scaling(gt_boxes, points, scale_range, rng=np.random):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    scale = rng.uniform(scale_range[0], scale_range[1])
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 7:9] *= scale
    return gt_boxes, points


def global_translation(gt_boxes, points, noise_std, rng=np.random):
    noise = rng.normal(0, noise_std, 3)
    points[:, :3] += noise
    gt_boxes[:, :3] += noise
    return gt_boxes, points


def random_local_rotation(gt_boxes, points, rot_range, rng=np.random):
    """Rotate each object (its box + points) around its own center."""
    for i in range(len(gt_boxes)):
        angle = rng.uniform(rot_range[0], rot_range[1])
        mask = points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
        ctr = gt_boxes[i, :3].copy()
        pts = points[mask]
        pts[:, :3] -= ctr
        pts[:, :3] = rotate_points_along_z(pts[None, :, :3], np.array([angle]))[0]
        pts[:, :3] += ctr
        points[mask] = pts
        gt_boxes[i, 6] += angle
    return gt_boxes, points


def random_local_scaling(gt_boxes, points, scale_range, rng=np.random):
    for i in range(len(gt_boxes)):
        scale = rng.uniform(scale_range[0], scale_range[1])
        mask = points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
        ctr = gt_boxes[i, :3].copy()
        points[mask, :3] = (points[mask, :3] - ctr) * scale + ctr
        gt_boxes[i, 3:6] *= scale
    return gt_boxes, points


def random_local_frustum_dropout(gt_boxes, points, intensity_range, direction,
                                 rng=np.random):
    """Drop points in a random frustum slice of each box
    (augmentor_utils local_frustum_dropout_* role)."""
    for i in range(len(gt_boxes)):
        x, y, z, dx, dy, dz = gt_boxes[i, :6]
        intensity = rng.uniform(intensity_range[0], intensity_range[1])
        if direction == "top":
            thresh = z + dz / 2 - intensity * dz
            keep = ~(
                points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
                & (points[:, 2] >= thresh)
            )
        elif direction == "bottom":
            thresh = z - dz / 2 + intensity * dz
            keep = ~(
                points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
                & (points[:, 2] <= thresh)
            )
        elif direction == "left":
            thresh = y + dy / 2 - intensity * dy
            keep = ~(
                points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
                & (points[:, 1] >= thresh)
            )
        else:  # right
            thresh = y - dy / 2 + intensity * dy
            keep = ~(
                points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
                & (points[:, 1] <= thresh)
            )
        points = points[keep]
    return gt_boxes, points


def random_local_sparsify(gt_boxes, points, drop_prob, rng=np.random):
    """Randomly drop a fraction of each object's points
    (local pyramid sparsify role)."""
    for i in range(len(gt_boxes)):
        inside = points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
        idx = np.where(inside)[0]
        if len(idx) == 0:
            continue
        drop = idx[rng.rand(len(idx)) < drop_prob]
        keep = np.ones(len(points), bool)
        keep[drop] = False
        points = points[keep]
    return gt_boxes, points


def random_local_translation(gt_boxes, points, offset_range, axes, rng=np.random):
    for i in range(len(gt_boxes)):
        mask = points_in_rbbox(points[:, :3], gt_boxes[i : i + 1, :7])[:, 0]
        for ax in axes:
            d = rng.uniform(offset_range[0], offset_range[1])
            j = {"x": 0, "y": 1, "z": 2}[ax]
            points[mask, j] += d
            gt_boxes[i, j] += d
    return gt_boxes, points
