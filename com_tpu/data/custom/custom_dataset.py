"""Custom dataset adapter (pcdet/datasets/custom/custom_dataset.py role):
user-provided .npy point clouds + plain-text labels
(x y z dx dy dz heading class_name per line), split files under ImageSets/.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ...utils.registry import DATASETS
from ..dataset import DatasetTemplate


@DATASETS.register
class CustomDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None, db_infos=None, seed=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger,
                         db_infos=db_infos, seed=seed)
        root = Path(self.root_path)
        split = dataset_cfg.get("DATA_SPLIT", {}).get(
            "train" if training else "test", "train")
        split_file = root / "ImageSets" / f"{split}.txt"
        self.sample_ids = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists()
            else sorted(p.stem for p in (root / "points").glob("*.npy"))
        )

    def __len__(self):
        return len(self.sample_ids)

    def get_lidar(self, idx):
        return np.load(str(Path(self.root_path) / "points" / f"{idx}.npy"))

    def get_label(self, idx):
        p = Path(self.root_path) / "labels" / f"{idx}.txt"
        boxes, names = [], []
        if p.exists():
            for line in open(p).readlines():
                parts = line.strip().split()
                if len(parts) < 8:
                    continue
                boxes.append([float(v) for v in parts[:7]])
                names.append(parts[7])
        return (np.asarray(boxes, np.float32).reshape(-1, 7),
                np.asarray(names))

    def __getitem__(self, index):
        idx = self.sample_ids[index]
        boxes, names = self.get_label(idx)
        input_dict = {
            "points": self.get_lidar(idx).astype(np.float32),
            "frame_id": idx,
            "gt_boxes": boxes,
            "gt_names": names,
        }
        return self.prepare_data(input_dict)

    def evaluation(self, det_annos, class_names, **kwargs):
        from ..kitti.kitti_eval import kitti_evaluation

        gt_annos = []
        for idx in self.sample_ids:
            boxes, names = self.get_label(idx)
            gt_annos.append({
                "gt_boxes_lidar": boxes,
                "name": names,
                "difficulty": np.zeros(len(names), np.int64),
            })
        return kitti_evaluation(det_annos, gt_annos, class_names)
