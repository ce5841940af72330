"""AnchorHeadMulti layout parity and ATSS target assignment."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.dense_heads.anchor_assign import atss_assign_targets
from com_tpu.models.dense_heads.anchor_head import (
    AnchorHeadMulti,
    build_anchors,
    reshape_anchor_preds,
)
from com_tpu.ops.boxes import ResidualCoder

CLASS_NAMES = ["car", "truck", "pedestrian"]
AGC = [
    {"class_name": "car", "anchor_sizes": [[4.6, 2.0, 1.7]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.0],
     "align_center": False, "feature_map_stride": 8,
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
    {"class_name": "truck", "anchor_sizes": [[7.0, 2.5, 2.8]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
     "align_center": False, "feature_map_stride": 8,
     "matched_threshold": 0.55, "unmatched_threshold": 0.4},
    {"class_name": "pedestrian", "anchor_sizes": [[0.8, 0.7, 1.7]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.0],
     "align_center": False, "feature_map_stride": 8,
     "matched_threshold": 0.5, "unmatched_threshold": 0.35},
]


def test_anchor_head_multi_layout():
    cfg = {
        "SHARED_CONV_NUM_FILTER": 16,
        "ANCHOR_GENERATOR_CONFIG": AGC,
        "RPN_HEAD_CFGS": [
            {"HEAD_CLS_NAME": ["car"]},
            {"HEAD_CLS_NAME": ["truck", "pedestrian"]},
        ],
        "SEPARATE_REG_CONFIG": {
            "NUM_MIDDLE_CONV": 1, "NUM_MIDDLE_FILTER": 16,
            "REG_LIST": ["reg:2", "height:1", "size:3", "angle:1"],
        },
        "USE_DIRECTION_CLASSIFIER": True,
        "NUM_DIR_BINS": 2,
    }
    head = AnchorHeadMulti(model_cfg=cfg, input_channels=16, num_class=3,
                           class_names=tuple(CLASS_NAMES))
    rng = np.random.RandomState(0)
    batch = {"spatial_features_2d": jnp.asarray(
        rng.rand(2, 8, 8, 16).astype(np.float32))}
    v = head.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = head.apply(v, dict(batch), train=False)
    # 6 slots/cell (3 classes x 2 rotations), 3 cls channels, 7 box channels
    assert out["cls_preds_raw"].shape == (2, 8, 8, 6 * 3)
    assert out["box_preds_raw"].shape == (2, 8, 8, 6 * 7)
    assert out["dir_cls_preds_raw"].shape == (2, 8, 8, 6 * 2)
    cls_flat, box_flat, dir_flat = reshape_anchor_preds(out, 3)
    assert cls_flat.shape == (2, 8 * 8 * 6, 3)
    # unhandled classes get the -20 filler, own classes get live logits
    cls5 = np.asarray(cls_flat.reshape(2, 64, 6, 3))
    assert (cls5[..., 0:2, 1:] == -20.0).all()  # car slots: truck/ped filled
    assert (cls5[..., 0:2, 0] != -20.0).any()


def test_atss_assignment_picks_center_anchors():
    grid = (32, 32, 1)
    pcr = [-16, -16, -2, 16, 16, 2]
    agc = [dict(c, feature_map_stride=2) for c in AGC]  # 2 m anchor spacing
    anchors, per_cls_idx, m, u, cids = build_anchors(
        {"ANCHOR_GENERATOR_CONFIG": agc}, CLASS_NAMES, grid, pcr)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0] = [2.0, 3.0, -0.2, 4.6, 2.0, 1.7, 0.0, 1]  # car
    gt[0, 1] = [-6.0, -5.0, 0.2, 0.8, 0.7, 1.7, 1.57, 3]  # pedestrian
    t = atss_assign_targets(
        jnp.asarray(anchors), jnp.asarray(gt), topk=9,
        box_coder=ResidualCoder())
    labels = np.asarray(t.box_cls_labels[0])
    pos = labels > 0
    assert pos.sum() >= 2  # at least the force-matched anchor per GT
    # positives sit near their GT centers
    pa = anchors[pos]
    for box, cid in ((gt[0, 0], 1), (gt[0, 1], 3)):
        cls_pos = pa[labels[pos] == cid]
        assert len(cls_pos) >= 1
        d = np.linalg.norm(cls_pos[:, :2] - box[:2], axis=1)
        assert (d < 3.0).all()
    # reg targets zeroed for background
    assert float(np.abs(np.asarray(t.box_reg_targets[0])[~pos]).sum()) == 0.0
