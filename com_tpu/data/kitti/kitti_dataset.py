"""KITTI dataset (pcdet/datasets/kitti/kitti_dataset.py role).

velodyne .bin + label_2 .txt + calib; camera-frame labels converted to lidar
boxes; optional FOV filtering.  Unlike the reference fork — where training on
KITTI is broken because prepare_data unconditionally reads the COM side-arrays
(SURVEY §2.3 caveat) — the side-arrays here are optional, so KITTI training
works out of the box (defaults: true_object=1, occupancy/facade=0).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ...utils.registry import DATASETS
from ..dataset import DatasetTemplate
from .calibration import (
    Calibration,
    boxes3d_kitti_camera_to_lidar,
    calib_to_matricies,
)

_KITTI_CLASS_MAP = {"Car": "Car", "Pedestrian": "Pedestrian", "Cyclist": "Cyclist"}


def parse_label_file(path):
    names, trunc, occ, alpha, bbox, dims, locs, ry = [], [], [], [], [], [], [], []
    for line in open(path).readlines():
        p = line.strip().split(" ")
        # DontCare rows matter only for the 2D-bbox metric's FP subtraction
        # (reference eval.py:250, metric==0), which this framework's
        # BEV/3D-only evaluator never computes — drop them here
        if len(p) < 15 or p[0] == "DontCare":
            continue
        names.append(p[0])
        trunc.append(float(p[1]))
        occ.append(float(p[2]))
        alpha.append(float(p[3]))
        bbox.append([float(x) for x in p[4:8]])
        dims.append([float(p[10]), float(p[8]), float(p[9])])  # l, h, w
        locs.append([float(x) for x in p[11:14]])
        ry.append(float(p[14]))
    return {
        "name": np.array(names),
        "truncated": np.array(trunc, np.float32),
        "occluded": np.array(occ, np.float32),
        "alpha": np.array(alpha, np.float32),
        "bbox": np.array(bbox, np.float32).reshape(-1, 4),
        "dims_lhw": np.array(dims, np.float32).reshape(-1, 3),
        "loc": np.array(locs, np.float32).reshape(-1, 3),
        "rotation_y": np.array(ry, np.float32),
    }


@DATASETS.register
class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None, db_infos=None, seed=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger,
                         db_infos=db_infos, seed=seed)
        self.split = dataset_cfg.get("DATA_SPLIT", {}).get(
            "train" if training else "test", "train"
        )
        root = Path(self.root_path)
        self.root_split = root / ("training" if self.split != "test" else "testing")
        split_file = root / "ImageSets" / f"{self.split}.txt"
        self.sample_ids = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists()
            else sorted(p.stem for p in (self.root_split / "velodyne").glob("*.bin"))
        )
        self._gt_cache = {}

    def __len__(self):
        return len(self.sample_ids)

    def get_lidar(self, idx):
        return np.fromfile(
            str(self.root_split / "velodyne" / f"{idx}.bin"), np.float32
        ).reshape(-1, 4)

    def get_calib(self, idx):
        return Calibration(str(self.root_split / "calib" / f"{idx}.txt"))

    def get_image(self, idx):
        """float32 [0, 1] camera image (kitti_dataset.get_image role)."""
        from PIL import Image

        p = self.root_split / "image_2" / f"{idx}.png"
        return np.asarray(Image.open(str(p)), np.float32) / 255.0

    def get_road_plane(self, idx):
        """Rect-frame road plane (a, b, c, d), normalized, y-up flipped
        (kitti_dataset.get_road_plane role)."""
        p = self.root_split / "planes" / f"{idx}.txt"
        if not p.exists():
            return None
        lines = open(p).readlines()
        plane = np.asarray([float(x) for x in lines[3].split()])
        if plane[1] > 0:
            plane = -plane
        return plane / np.linalg.norm(plane[:3])

    def get_label(self, idx):
        return parse_label_file(str(self.root_split / "label_2" / f"{idx}.txt"))

    def frame_gt_annos(self, idx):
        """gt annos in the kitti_eval schema (cached)."""
        if idx not in self._gt_cache:
            label = self.get_label(idx)
            calib = self.get_calib(idx)
            cam_boxes = np.concatenate(
                [label["loc"], label["dims_lhw"], label["rotation_y"][:, None]],
                axis=1,
            )
            lidar = (
                boxes3d_kitti_camera_to_lidar(cam_boxes, calib)
                if len(cam_boxes)
                else np.zeros((0, 7), np.float32)
            )
            self._gt_cache[idx] = {
                "name": label["name"],
                "truncated": label["truncated"],
                "occluded": label["occluded"],
                "bbox_height": label["bbox"][:, 3] - label["bbox"][:, 1]
                if len(label["bbox"])
                else np.zeros(0),
                "gt_boxes_lidar": lidar.astype(np.float32),
            }
        return self._gt_cache[idx]

    def __getitem__(self, index):
        self._reseed_for_item(index)
        idx = self.sample_ids[index]
        points = self.get_lidar(idx)
        data = {"points": points, "frame_id": idx}
        label_path = self.root_split / "label_2" / f"{idx}.txt"
        if label_path.exists():
            gt = self.frame_gt_annos(idx)
            data["gt_names"] = gt["name"]
            data["gt_boxes"] = gt["gt_boxes_lidar"][:, :7]

        item_list = self.dataset_cfg.get("GET_ITEM_LIST", ["points"])
        if set(item_list) - {"points"}:
            calib = self.get_calib(idx)
            data["calib"] = calib
            if "images" in item_list:
                data["images"] = self.get_image(idx)
            if "calib_matricies" in item_list:
                l2c, c2i = calib_to_matricies(calib)
                data["trans_lidar_to_cam"] = l2c
                data["trans_cam_to_img"] = c2i
            if "gt_boxes2d" in item_list and label_path.exists():
                data["gt_boxes2d"] = self.get_label(idx)["bbox"]
        # road-plane reseating of gt-sampled objects is independent of
        # GET_ITEM_LIST (the reference loads the plane unconditionally);
        # a points-only config with USE_ROAD_PLANE would silently float
        # pasted objects otherwise
        plane = self.get_road_plane(idx)
        if plane is not None:
            data["road_plane"] = plane
        return self.prepare_data(data)

    def evaluation(self, det_annos, class_names, **kwargs):
        from .calibration import (
            boxes3d_kitti_camera_to_imageboxes,
            boxes3d_lidar_to_kitti_camera,
        )
        from .kitti_eval import kitti_evaluation

        gt_annos = [self.frame_gt_annos(a["frame_id"]) for a in det_annos]
        # project detections to image bboxes so the evaluator can apply the
        # reference's per-difficulty 2D-height det-ignore (clean_data:70-82)
        for a in det_annos:
            if "bbox" in a or not len(a.get("boxes_lidar", [])):
                continue
            try:
                calib = self.get_calib(a["frame_id"])
                cam = boxes3d_lidar_to_kitti_camera(
                    np.asarray(a["boxes_lidar"])[:, :7], calib)
                a["bbox"] = boxes3d_kitti_camera_to_imageboxes(cam, calib)
            except FileNotFoundError:
                pass  # no calib (synthetic/fixture runs): dets stay valid
        return kitti_evaluation(det_annos, gt_annos, class_names)
