"""Waymo eval adapter: array assembly semantics (reference waymo_eval.py:26-110)
unit-tested without TF / waymo-open-dataset."""
import numpy as np
import pytest

from com_tpu.data.waymo.waymo_eval import (
    assemble_gt_arrays,
    assemble_pred_arrays,
    build_metric_config,
    mask_by_distance,
)


def _info(names, boxes, diff, npts):
    return {
        "name": np.asarray(names),
        "gt_boxes_lidar": np.asarray(boxes, np.float64),
        "difficulty": np.asarray(diff, np.int64),
        "num_points_in_gt": np.asarray(npts, np.int64),
    }


def test_gt_difficulty_reassignment_and_zero_point_filter():
    # ref waymo_eval.py:43-48: difficulty==0 -> 1 if npts>5 else 2; npts==0 dropped
    infos = [
        _info(
            ["Vehicle", "Vehicle", "Vehicle", "Pedestrian", "Sign"],
            np.tile([[1, 2, 0, 4, 2, 1.5, 0.3]], (5, 1)),
            [0, 0, 2, 0, 0],
            [10, 3, 7, 0, 9],
        )
    ]
    frame, box, typ, diff = assemble_gt_arrays(infos, ["Vehicle", "Pedestrian"])
    # Sign excluded by class mask; Pedestrian dropped by npts==0
    assert len(box) == 3
    np.testing.assert_array_equal(typ, [1, 1, 1])
    # npts>5 & diff0 -> 1; npts<=5 & diff0 -> 2; existing diff 2 kept
    np.testing.assert_array_equal(diff, [1, 2, 2])
    np.testing.assert_array_equal(frame, [0, 0, 0])


def test_gt_requires_num_points():
    infos = [{
        "name": np.asarray(["Vehicle"]),
        "gt_boxes_lidar": np.zeros((1, 7)),
        "difficulty": np.zeros(1, np.int64),
    }]
    with pytest.raises(ValueError):
        assemble_gt_arrays(infos, ["Vehicle"])


def test_heading_limit_and_distance_mask():
    boxes = np.array(
        [[1, 0, 0, 4, 2, 1.5, 3 * np.pi], [200, 0, 0, 4, 2, 1.5, -np.pi / 2]]
    )
    annos = [{"boxes_lidar": boxes, "score": [0.9, 0.8], "name": ["Vehicle", "Vehicle"]}]
    frame, box, typ, score = assemble_pred_arrays(annos)
    # 3*pi -> pi-ish wrapped into [-pi, pi)
    assert -np.pi <= box[0, -1] < np.pi
    np.testing.assert_allclose(abs(box[0, -1]), np.pi, atol=1e-9)
    box2, frame2, score2 = mask_by_distance(100.0, box, frame, score)
    assert len(box2) == 1 and score2[0] == 0.9


def test_metric_config_assembly_with_stub():
    class StubConfig:
        def __init__(self):
            self.score_cutoffs = []
            self.text = None

    class StubPb2:
        Config = StubConfig

    class StubTextFormat:
        @staticmethod
        def Merge(text, config):
            config.text = text

    cfg = build_metric_config(StubPb2, StubTextFormat)
    assert len(cfg.score_cutoffs) == 101  # ref waymo_eval.py:108-110
    assert cfg.score_cutoffs[0] == 0.0 and cfg.score_cutoffs[-1] == 1.0
    assert "TYPE_HUNGARIAN" in cfg.text and "OBJECT_TYPE" in cfg.text
    assert cfg.text.count("iou_thresholds") == 5  # unknown + 4 classes
