"""Point feature selection/encoding (pcdet point_feature_encoder.py:4-57 parity)."""
from __future__ import annotations

import numpy as np


class PointFeatureEncoder:
    def __init__(self, config):
        self.config = config
        self.used_feature_list = list(config["used_feature_list"])
        self.src_feature_list = list(config["src_feature_list"])
        assert self.used_feature_list[:3] == ["x", "y", "z"]

    @property
    def num_point_features(self):
        return len(self.used_feature_list)

    def forward(self, data_dict):
        points = data_dict["points"]
        keep = [0, 1, 2]
        for f in self.used_feature_list:
            if f in ("x", "y", "z"):
                continue
            keep.append(self.src_feature_list.index(f))
        data_dict["points"] = points[:, keep]
        data_dict["use_lead_xyz"] = True
        return data_dict
