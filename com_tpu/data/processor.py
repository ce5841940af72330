"""Data processor queue (pcdet data_processor.py:15-221 parity).

YAML-driven list of named steps.  The COM side-arrays
(num_points_in_gt / true_object / occupancy_ratio / facade_type) are kept
aligned through every point/box filter, like the reference does at
data_processor.py:93-100 — but here they are optional per-dataset features,
fixing the reference's Waymo-only coupling (SURVEY §2.3 caveat).
"""
from __future__ import annotations

import numpy as np

from ..ops.boxes import mask_boxes_outside_range
from ..ops.voxelize import grid_size_from_range, voxelize_points

GT_SIDE_KEYS = ("num_points_in_gt", "true_object", "occupancy_ratio", "facade_type")


def filter_gt_arrays(data_dict, keep_mask):
    data_dict["gt_boxes"] = data_dict["gt_boxes"][keep_mask]
    if "gt_names" in data_dict:
        data_dict["gt_names"] = data_dict["gt_names"][keep_mask]
    for k in GT_SIDE_KEYS:
        if k in data_dict:
            data_dict[k] = data_dict[k][keep_mask]
    return data_dict


def pipeline_presorts_points(data_cfg, voxel_size) -> bool:
    """True iff the DATA_PROCESSOR list guarantees points reach the model
    sorted by flat BEV pillar id at the model's own pillar scale — i.e.
    sort_points_by_bev_pillar (with matching XY voxel size) appears and no
    later processor reorders points.  Lets callers set the VFE's static
    ASSUME_SORTED_POINTS flag (models/vfe.py), which removes the device
    sort AND the lax.cond sortedness check from the jitted step."""
    procs = list(getattr(data_cfg, "DATA_PROCESSOR", None) or [])
    reordering = {"shuffle_points", "sample_points"}
    sorted_ok = False
    for p in procs:
        name = p.get("NAME") if hasattr(p, "get") else p["NAME"]
        if name == "sort_points_by_bev_pillar":
            vs = p.get("VOXEL_SIZE", None)
            if vs is None:
                sorted_ok = True  # processor falls back to pipeline voxel size
            else:
                sorted_ok = (abs(float(vs[0]) - float(voxel_size[0])) < 1e-6
                             and abs(float(vs[1]) - float(voxel_size[1])) < 1e-6)
        elif name in reordering:
            sorted_ok = False
    return sorted_ok


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 num_point_features, rng=None):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.rng = rng if rng is not None else np.random
        self.mode = "train" if training else "test"
        self.grid_size = None
        self.voxel_size = None
        self.queue = []
        self.max_voxels = None
        self.max_points_per_voxel = None
        for cur_cfg in processor_configs:
            if cur_cfg["NAME"] == "transform_points_to_voxels":
                self.voxel_size = np.asarray(cur_cfg["VOXEL_SIZE"], np.float32)
                self.grid_size = grid_size_from_range(
                    self.point_cloud_range, self.voxel_size
                )
                self.max_voxels = int(cur_cfg["MAX_NUMBER_OF_VOXELS"][self.mode])
                self.max_points_per_voxel = int(cur_cfg["MAX_POINTS_PER_VOXEL"])
            self.queue.append((getattr(self, cur_cfg["NAME"]), cur_cfg))

    def mask_points_and_boxes_outside_range(self, data_dict, cfg):
        points = data_dict["points"]
        pr = self.point_cloud_range
        m = (
            (points[:, 0] >= pr[0]) & (points[:, 0] <= pr[3])
            & (points[:, 1] >= pr[1]) & (points[:, 1] <= pr[4])
        )
        data_dict["points"] = points[m]
        if (
            data_dict.get("gt_boxes", None) is not None
            and len(data_dict["gt_boxes"])
            and cfg.get("REMOVE_OUTSIDE_BOXES", False)
            and self.training
        ):
            if cfg.get("USE_CENTER_TO_FILTER", True):
                # reference default (box_utils.mask_boxes_outside_range_numpy
                # use_center_to_filter=True): center inside ALL 3 axes
                b = np.asarray(data_dict["gt_boxes"])[:, :3]
                keep = ((b >= pr[0:3]) & (b <= pr[3:6])).all(axis=-1)
            else:
                keep = mask_boxes_outside_range(
                    data_dict["gt_boxes"], pr,
                    min_num_corners=cfg.get("min_num_corners", 1))
            filter_gt_arrays(data_dict, keep)
        return data_dict

    def shuffle_points(self, data_dict, cfg):
        if cfg["SHUFFLE_ENABLED"][self.mode]:
            idx = self.rng.permutation(data_dict["points"].shape[0])
            data_dict["points"] = data_dict["points"][idx]
        return data_dict

    def sort_points_by_bev_pillar(self, data_dict, cfg):
        """Stable host-side sort by flat BEV pillar id so the device-side
        sorted-scan VFE (DynamicPillarVFE SORTED_SCAN) skips its lax.sort —
        statically when ASSUME_SORTED_POINTS is set (pipeline_presorts_points
        wires that), else via the in-graph sortedness cond.  Must replicate
        ops/voxelize.point_voxel_ids EXACTLY (f32 floor((x-x0)/v) on all
        THREE axes — z-outliers map to the trash id too); any disagreement
        breaks strict sortedness, which silently re-sorts on the cond path
        and mispools on the static path."""
        vs = np.asarray(cfg.get("VOXEL_SIZE", self.voxel_size), np.float32)
        pr = self.point_cloud_range
        nx = int(round(float(pr[3] - pr[0]) / float(vs[0])))
        ny = int(round(float(pr[4] - pr[1]) / float(vs[1])))
        nz = max(1, int(round(float(pr[5] - pr[2]) / float(vs[2]))))
        p = data_dict["points"].astype(np.float32)
        v = (p[:, :3] - pr[None, 0:3].astype(np.float32)) / vs[None, :]
        vi = np.floor(v).astype(np.int64)
        in_range = ((vi[:, 0] >= 0) & (vi[:, 0] < nx)
                    & (vi[:, 1] >= 0) & (vi[:, 1] < ny)
                    & (vi[:, 2] >= 0) & (vi[:, 2] < nz))
        flat = np.where(in_range, vi[:, 1] * nx + vi[:, 0], nx * ny)
        order = np.argsort(flat, kind="stable")
        data_dict["points"] = data_dict["points"][order]
        return data_dict

    def transform_points_to_voxels(self, data_dict, cfg):
        from ..ops.native import voxelize_native

        max_voxels = cfg["MAX_NUMBER_OF_VOXELS"][self.mode]
        voxels, coords, num_points = voxelize_native(
            data_dict["points"],
            self.point_cloud_range,
            self.voxel_size,
            cfg["MAX_POINTS_PER_VOXEL"],
            max_voxels,
        )
        data_dict["voxels"] = voxels
        data_dict["voxel_coords"] = coords
        data_dict["voxel_num_points"] = num_points
        return data_dict

    def sample_points(self, data_dict, cfg):
        num = cfg["NUM_POINTS"][self.mode]
        points = data_dict["points"]
        if num == -1 or len(points) == 0:
            return data_dict
        if num < len(points):
            depth = np.linalg.norm(points[:, :3], axis=1)
            far = np.where(depth >= 40.0)[0]
            near = np.where(depth < 40.0)[0]
            if num > len(far):
                near_keep = self.rng.choice(near, num - len(far), replace=False)
                choice = np.concatenate([near_keep, far])
            else:
                choice = self.rng.choice(np.arange(len(points)), num, replace=False)
            self.rng.shuffle(choice)
        else:
            choice = np.arange(len(points))
            deficit = num - len(points)
            # reference draws WITHOUT replacement (data_processor.py:181);
            # only fall back to replacement when the deficit exceeds the
            # point count (where replace=False would raise)
            extra = self.rng.choice(choice, deficit,
                                    replace=deficit > len(points))
            choice = np.concatenate([choice, extra])
            self.rng.shuffle(choice)
        data_dict["points"] = points[choice]
        return data_dict

    def forward(self, data_dict):
        for fn, cfg in self.queue:
            data_dict = fn(data_dict, cfg)
        return data_dict
