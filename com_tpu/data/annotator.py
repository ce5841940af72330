"""Offline COM difficulty annotator: occupancy_ratio + facade_type.

Role of tools/demo_db.py:380-579 (process_vehicle_anno / process_ped_anno /
process_cyc_anno / determine_facade_type): annotates GT-database entries and
frame annos with the COM difficulty heuristics.

Semantics preserved exactly, implementation simplified: instead of building
per-cell rotated sub-boxes and running point-in-polygon per cell, points are
transformed once into the box-local frame and binned with a floor-divide —
the same partition of the same box.

* Vehicle: 3(length) x 2(width) x 2(height) = 12 cells, a cell counts as
  occupied with > 1 point (cal_occupancy th=1); ratio = occupied / 12.
* Pedestrian: 5 vertical slabs, occupied with > 0 points; the reference pads
  the 5-cell array with 7 zeros so ratio = occupied / 12 (hence the 12/5
  rescaling in the samplers).
* Cyclist: 5 length slabs, padded the same way.
* facade_type (Vehicle): viewing angle vs heading, theta = wrap(yaw -
  atan2(cy, cx)) in degrees with tolerance dt: 0 front (|t-180|<dt), 1 back
  (near 0/360), 2 side (near 90/270), 3 two-facade; Ped/Cyc get -1.
"""
from __future__ import annotations

import numpy as np


def _local_frame(points_xyz, box):
    """Points -> box-local frame with origin at the box center."""
    p = points_xyz - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    x = p[:, 0] * c - p[:, 1] * s
    y = p[:, 0] * s + p[:, 1] * c
    return np.stack([x, y, p[:, 2]], axis=1)


def _cell_counts(points_xyz, box, splits):
    """(sx, sy, sz) cell occupancy counts over the box partition."""
    sx, sy, sz = splits
    local = _local_frame(points_xyz, box)
    half = box[3:6] / 2.0
    inside = (np.abs(local) <= half + 1e-6).all(axis=1)
    local = local[inside]
    if len(local) == 0:
        return np.zeros(sx * sy * sz, np.int64)
    # bin indices in [0, s)
    fx = np.clip(((local[:, 0] + half[0]) / box[3] * sx).astype(np.int64), 0, sx - 1)
    fy = np.clip(((local[:, 1] + half[1]) / box[4] * sy).astype(np.int64), 0, sy - 1)
    fz = np.clip(((local[:, 2] + half[2]) / box[5] * sz).astype(np.int64), 0, sz - 1)
    flat = (fz * sy + fy) * sx + fx
    return np.bincount(flat, minlength=sx * sy * sz)


def occupancy_ratio(points_xyz: np.ndarray, box: np.ndarray, class_name: str) -> float:
    if class_name == "Vehicle":
        counts = _cell_counts(points_xyz, box, (3, 2, 2))
        return float((counts > 1).sum() / 12.0)
    if class_name == "Pedestrian":
        counts = _cell_counts(points_xyz, box, (1, 1, 5))
        counts = np.concatenate([counts, np.zeros(7, np.int64)])
        return float((counts > 0).sum() / 12.0)
    if class_name == "Cyclist":
        counts = _cell_counts(points_xyz, box, (5, 1, 1))
        counts = np.concatenate([counts, np.zeros(7, np.int64)])
        return float((counts > 0).sum() / 12.0)
    counts = _cell_counts(points_xyz, box, (3, 2, 2))
    return float((counts > 1).sum() / 12.0)


def facade_type(box: np.ndarray, class_name: str, dt: float = 10.0):
    """(type, theta_degrees); -1 for non-vehicles (demo_db.py annotates only
    vehicles with a facade)."""
    if class_name != "Vehicle":
        return -1, 0.0
    theta = (box[6] - np.arctan2(box[1], box[0])) % (2 * np.pi) / np.pi * 180.0
    if abs(theta - 180) < dt:
        return 0, theta
    if abs(theta) < dt or abs(theta - 360) < dt:
        return 1, theta
    if abs(theta - 90) < dt or abs(theta - 270) < dt:
        return 2, theta
    return 3, theta


def annotate_db_infos(db_infos: dict, root_path=None, dt: float = 10.0,
                      num_point_features: int = 5) -> dict:
    """Annotate every GT-database entry in place with occupancy_ratio and
    facade_type (the offline step between create_groundtruth_database and
    COM training; see SURVEY §3.3)."""
    from pathlib import Path

    for class_name, infos in db_infos.items():
        for info in infos:
            box = np.asarray(info["box3d_lidar"], np.float64)
            if "points" in info:
                pts = info["points"][:, :3].astype(np.float64)
            else:
                p = Path(root_path) / info["path"] if root_path else Path(info["path"])
                pts = np.fromfile(str(p), dtype=np.float32).reshape(
                    -1, num_point_features
                )[:, :3].astype(np.float64)
                pts += box[None, :3]
            info["occupancy_ratio"] = occupancy_ratio(pts, box, class_name)
            ft, ang = facade_type(box, class_name, dt)
            info["facade_type"] = ft
            info["facade_angle"] = ang
    return db_infos


def annotate_frame_annos(annos: dict, points: np.ndarray, dt: float = 10.0) -> dict:
    """Annotate a frame's annos dict (the *_short.pkl production path)."""
    from ..ops.boxes import points_in_rbbox

    boxes = annos["gt_boxes_lidar"][:, :7]
    names = annos["name"]
    inbox = points_in_rbbox(points[:, :3], boxes, xp=np)
    occ = np.zeros(len(names), np.float32)
    fac = np.zeros(len(names), np.int64)
    for i, name in enumerate(names):
        pts = points[inbox[:, i], :3].astype(np.float64)
        occ[i] = occupancy_ratio(pts, boxes[i].astype(np.float64), name)
        fac[i], _ = facade_type(boxes[i].astype(np.float64), name, dt)
    annos["occupancy_ratio"] = occ
    annos["facade_type"] = fac
    return annos
