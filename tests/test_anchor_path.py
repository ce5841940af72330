"""Anchor path: generator layout, assignment semantics, curriculum focal loss,
and a tiny PointPillar+AnchorHeadSingle train step."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.dense_heads.anchor_assign import (
    assign_anchor_targets,
    nearest_bev_iou,
)
from com_tpu.models.dense_heads.anchor_head import build_anchors
from com_tpu.ops.boxes import ResidualCoder
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian"]

HEAD_CFG = {
    "NAME": "AnchorHeadSingle",
    "CLASS_AGNOSTIC": False,
    "USE_DIRECTION_CLASSIFIER": True,
    "DIR_OFFSET": 0.78539,
    "DIR_LIMIT_OFFSET": 0.0,
    "NUM_DIR_BINS": 2,
    "ANCHOR_GENERATOR_CONFIG": [
        {
            "class_name": "Vehicle",
            "anchor_sizes": [[4.7, 2.1, 1.7]],
            "anchor_rotations": [0, 1.57],
            "anchor_bottom_heights": [0.0],
            "align_center": True,
            "feature_map_stride": 2,
            "matched_threshold": 0.55,
            "unmatched_threshold": 0.4,
        },
        {
            "class_name": "Pedestrian",
            "anchor_sizes": [[0.9, 0.86, 1.7]],
            "anchor_rotations": [0, 1.57],
            "anchor_bottom_heights": [0.0],
            "align_center": True,
            "feature_map_stride": 2,
            "matched_threshold": 0.5,
            "unmatched_threshold": 0.35,
        },
    ],
    "LOSS_CONFIG": {
        "LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7,
        }
    },
}


def test_build_anchors_interleaved_layout():
    grid = (32, 32, 1)
    pcr = [-16, -16, -2, 16, 16, 4]
    anchors, idx, matched, unmatched, cids = build_anchors(
        HEAD_CFG, CLASS_NAMES, grid, pcr
    )
    # 16x16 cells x 2 classes x 2 rotations
    assert anchors.shape == (16 * 16 * 4, 7)
    assert cids == (1, 2)
    # layout: per cell [veh_rot0, veh_rot90, ped_rot0, ped_rot90]
    first_cell = anchors[:4]
    np.testing.assert_allclose(first_cell[0, 3:6], [4.7, 2.1, 1.7])
    np.testing.assert_allclose(first_cell[2, 3:6], [0.9, 0.86, 1.7])
    assert first_cell[0, 6] == 0 and abs(first_cell[1, 6] - 1.57) < 1e-6
    # index arrays partition all anchors
    allidx = np.sort(np.concatenate(idx))
    np.testing.assert_array_equal(allidx, np.arange(anchors.shape[0]))


def test_nearest_bev_iou_heading_snap():
    a = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.0]], jnp.float32)
    b_rot = jnp.asarray([[0, 0, 0, 4, 2, 1.5, np.pi / 2]], jnp.float32)
    iou = nearest_bev_iou(a, b_rot)
    # rotated 90deg -> snapped to swapped extents: 4x2 vs 2x4 -> inter 2x2=4,
    # union 8+8-4=12 -> IoU 1/3
    assert abs(float(iou[0, 0]) - 1 / 3) < 1e-5


def test_assignment_positive_at_gt_location():
    grid = (32, 32, 1)
    pcr = [-16, -16, -2, 16, 16, 4]
    anchors, idx, matched, unmatched, cids = build_anchors(
        HEAD_CFG, CLASS_NAMES, grid, pcr
    )
    gt = np.zeros((1, 8, 8), np.float32)
    gt[0, 0] = [0.0, 0.0, 0.85, 4.7, 2.1, 1.7, 0.0, 1]  # a Vehicle at origin
    groups = np.zeros((1, 8), np.int32)
    groups[0, 0] = 7
    t = assign_anchor_targets(
        anchors, idx, jnp.asarray(gt), jnp.asarray(groups), cids,
        matched, unmatched, ResidualCoder(),
    )
    labels = np.asarray(t.box_cls_labels)[0]
    assert (labels == 1).sum() >= 1  # at least the force-matched anchor
    assert (labels == 2).sum() == 0  # no pedestrian positives
    # group propagated to positive anchors
    assert (np.asarray(t.groups)[0][labels == 1] == 7).all()
    # decoded target at a positive anchor reconstructs the GT box
    pos = np.where(labels == 1)[0][0]
    rec = ResidualCoder().decode(
        np.asarray(t.box_reg_targets)[0, pos], anchors[pos], xp=np
    )
    np.testing.assert_allclose(rec[:6], gt[0, 0, :6], atol=1e-4)


def test_anchor_train_step_loss_decreases():
    from com_tpu.models.detectors import build_network, DatasetMeta
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    model_cfg = CfgNode({
        "NAME": "PointPillar",
        "VFE": {"NAME": "DynamicPillarVFE", "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                "WITH_DISTANCE": False, "NUM_FILTERS": [32]},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [2],
                        "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": dict(HEAD_CFG, LOSS_CURRICULUM={
            "UCL": True, "HEIGHT": 1, "ELONGATION": -10, "OFFSET": 0,
            "FIXED": True, "ALPHA": 0.01,
        }),
    })
    meta = DatasetMeta(CLASS_NAMES, [-16, -16, -2, 16, 16, 4], [0.5, 0.5, 6.0], [64, 64, 1], 5)
    net = build_network(model_cfg, meta)
    rng = np.random.RandomState(0)
    b, n, m = 2, 2048, 8
    pts = np.concatenate([rng.uniform(-15, 15, (b, n, 2)), rng.uniform(-1, 2, (b, n, 1)),
                          rng.rand(b, n, 2)], axis=2).astype(np.float32)
    gt = np.zeros((b, m, 8), np.float32)
    gt[:, :3, 0:2] = rng.uniform(-10, 10, (b, 3, 2))
    gt[:, :3, 2] = 0.85
    gt[:, :3, 3:6] = [4.7, 2.1, 1.7]
    gt[:, :3, 6] = rng.uniform(-np.pi, np.pi, (b, 3))
    gt[:, :3, 7] = 1
    batch = {
        "points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "num_points_in_gt": jnp.asarray((gt[..., 7] > 0) * 20.0),
        "true_object": jnp.asarray((gt[..., 7] > 0) * 1.0),
        "occupancy_ratio": jnp.asarray(rng.rand(b, m).astype(np.float32)),
        "facade_type": jnp.asarray(rng.randint(0, 4, (b, m)).astype(np.float32)),
    }
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    tx, _ = build_optimizer(variables["params"],
                            CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 3e-3,
                                     "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10.0}),
                            100, 10)
    state = TrainState.create(variables, tx, num_head_groups=1, anchor_num_class=2)
    step = jax.jit(make_train_step(net, model_cfg, CLASS_NAMES, meta, tx, (32, 32)))
    losses = []
    for i in range(20):
        state, metrics = step(state, batch, 0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::4]
    # curriculum EMA initialized after seeing positives
    assert bool(np.asarray(state.curriculum[0].initialized).any())
    # group confidences flowed
    assert float(np.asarray(metrics["confidence_cnt"]).sum()) > 0
