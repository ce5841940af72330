"""Pandaset dataset adapter (pcdet/datasets/pandaset/pandaset_dataset.py role).

The reference reads the pandaset-devkit's pickled sequence frames and
converts the world-frame cuboids into the ego/lidar frame.  Here the same
per-frame schema is consumed from info dicts ({lidar_path (pkl of Nx6
points), gt_boxes, gt_names}); the devkit itself is only needed by the
offline info-creation path.
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ...utils.registry import DATASETS
from ..dataset import DatasetTemplate


@DATASETS.register
class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None, db_infos=None, seed=None, infos=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger,
                         db_infos=db_infos, seed=seed)
        self.infos = list(infos) if infos is not None else []
        if infos is None:
            mode = "train" if training else "test"
            for info_path in dataset_cfg.get("INFO_PATH", {}).get(mode, []):
                p = Path(self.root_path) / info_path
                if p.exists():
                    with open(p, "rb") as f:
                        self.infos.extend(pickle.load(f))

    def get_lidar(self, info):
        p = Path(self.root_path) / info["lidar_path"]
        if p.suffix == ".npy":
            pts = np.load(str(p))
        else:
            with open(p, "rb") as f:
                pts = pickle.load(f)
            pts = np.asarray(pts, np.float32)
        return pts.astype(np.float32)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = copy.deepcopy(self.infos[index])
        input_dict = {
            "points": self.get_lidar(info),
            "frame_id": info.get("frame_id", str(index)),
        }
        if "gt_boxes" in info:
            input_dict["gt_names"] = np.asarray(info["gt_names"])
            input_dict["gt_boxes"] = np.asarray(info["gt_boxes"])
        return self.prepare_data(input_dict)

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..kitti.kitti_eval import kitti_evaluation

        gt_annos = [{
            "gt_boxes_lidar": np.asarray(
                info.get("gt_boxes", np.zeros((0, 7))))[:, :7],
            "name": np.asarray(info.get("gt_names", [])),
            "difficulty": np.zeros(len(info.get("gt_names", [])), np.int64),
        } for info in self.infos]
        return kitti_evaluation(det_annos, gt_annos, class_names)
