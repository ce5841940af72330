"""Regressions for core-path review findings: curriculum group/class
bookkeeping across configs, prefetcher error propagation, eval coder parity.

Reference anchors: head_zoo.py ped_merge cluster override (single-class
Pedestrian uses the 15-group scheme), loss_utils.py confidence_of_all_groups
(global class rows), detector3d_template post_processing (eval decodes with
the training coder).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from com_tpu.models.dense_heads.target_assign import cluster_com_groups
from com_tpu.train.step import com_groups_for, conf_shape_for, vehicle_class_ids
from com_tpu.utils.config import CfgNode


def test_conf_shape_for_class_sets():
    assert conf_shape_for({}, ["Vehicle", "Pedestrian", "Cyclist"]) == (3, 96)
    assert conf_shape_for({}, ["Vehicle"]) == (1, 96)
    # KITTI Car is vehicle-like: 96 groups, not the pedestrian 15
    assert conf_shape_for({}, ["Car"]) == (1, 96)
    assert conf_shape_for({}, ["Pedestrian"]) == (1, 15)
    assert conf_shape_for({}, ["Cyclist"]) == (1, 15)
    # nuScenes/Lyft taxonomies are lowercase — vehicle matching must be
    # case-insensitive or cars silently fall into the pedestrian scheme
    assert conf_shape_for({}, ["car"]) == (1, 96)
    assert vehicle_class_ids(["car", "pedestrian", "bus"]) == (1, 3)


def test_cluster_groups_single_class_pedestrian():
    """A Pedestrian-only config has class id 1 = Pedestrian; its objects must
    get the 15-group ped scheme, not the 96-group vehicle binning."""
    rng = np.random.RandomState(0)
    m = 16
    gt = np.zeros((1, m, 8), np.float32)
    gt[0, :, 0:2] = rng.uniform(-40, 40, (m, 2))
    gt[0, :, 3:6] = [0.9, 0.86, 1.7]
    gt[0, :, 7] = 1  # class id 1 == Pedestrian in this config
    batch = {
        "true_object": jnp.ones((1, m)),
        "occupancy_ratio": jnp.asarray(rng.rand(1, m), jnp.float32),
        "facade_type": jnp.zeros((1, m)),
        "num_points_in_gt": jnp.full((1, m), 10.0),
    }
    vids = vehicle_class_ids(["Pedestrian"])
    assert vids == ()
    g = np.asarray(cluster_com_groups(
        jnp.asarray(gt), batch["true_object"], batch["occupancy_ratio"],
        batch["facade_type"], vehicle_ids=vids or (-1,)))
    assert g.min() >= 1 and g.max() <= 15
    # the shared helper produces the same thing
    g2 = np.asarray(com_groups_for(batch, jnp.asarray(gt), True, ["Pedestrian"]))
    np.testing.assert_array_equal(g, g2)
    # and a Waymo 3-class layout still sends Vehicles (id 1) to 96 groups
    g3 = np.asarray(com_groups_for(
        batch, jnp.asarray(gt), True, ["Vehicle", "Pedestrian", "Cyclist"]))
    assert g3.max() > 15


def test_group_confidences_global_class_rows():
    """Multi-head configs (one class per head) must land each head's
    confidences in its GLOBAL class row, not collapse everything into row 0."""
    from com_tpu.losses.curriculum import group_confidences
    from com_tpu.models.dense_heads.target_assign import CenterTargets

    b, m, h, w = 1, 4, 8, 8
    # head 2 of 3: handles global class 3 (Cyclist), local channel 0
    hm = jnp.full((b, h, w, 1), 0.5)
    t = CenterTargets(
        heatmaps=jnp.zeros((b, h, w, 1)),
        target_boxes=jnp.zeros((b, m, 8)),
        inds=jnp.zeros((b, m), jnp.int32),
        mask=jnp.ones((b, m)),
        center_int=jnp.zeros((b, m, 2), jnp.int32),
        radius=jnp.ones((b, m), jnp.int32),
        class_local=jnp.zeros((b, m), jnp.int32),
        group=jnp.ones((b, m), jnp.int32),
        class_global=jnp.full((b, m), 2, jnp.int32),
    )
    sums, cnts = group_confidences(hm, t, num_class=3, num_groups=15)
    assert sums.shape == (3, 15)
    assert float(cnts[2, 0]) == m  # all objects in the Cyclist row
    assert float(cnts[:2].sum()) == 0


def test_anchor_train_step_pedestrian_15_groups():
    """Single-class Pedestrian anchor config: loss-side confidence tensors
    must match the (1, 15) TrainState accumulators (a hardcoded 96 used to
    fail the accumulate at trace time)."""
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    class_names = ["Pedestrian"]
    model_cfg = CfgNode({
        "NAME": "PointPillar",
        "VFE": {"NAME": "DynamicPillarVFE", "USE_ABSLOTE_XYZ": True,
                "USE_NORM": True, "WITH_DISTANCE": False, "NUM_FILTERS": [16]},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1],
                        "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
                        "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": False,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Pedestrian",
                "anchor_sizes": [[0.9, 0.86, 1.7]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [0.0],
                "align_center": True,
                "feature_map_stride": 2,
                "matched_threshold": 0.5,
                "unmatched_threshold": 0.35,
            }],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0,
                "code_weights": [1.0] * 7}},
            "LOSS_CURRICULUM": {"UCL": True, "HEIGHT": 1, "ELONGATION": -10,
                                "OFFSET": 0, "FIXED": True, "ALPHA": 0.01},
        },
    })
    meta = DatasetMeta(class_names, [-16, -16, -2, 16, 16, 4],
                       [0.5, 0.5, 6.0], [64, 64, 1], 5)
    net = build_network(model_cfg, meta)
    rng = np.random.RandomState(0)
    b, n, m = 1, 1024, 6
    pts = np.concatenate([
        rng.uniform(-15, 15, (b, n, 2)), rng.uniform(-1, 2, (b, n, 1)),
        rng.rand(b, n, 2)], axis=2).astype(np.float32)
    gt = np.zeros((b, m, 8), np.float32)
    gt[:, :3, 0:2] = rng.uniform(-10, 10, (b, 3, 2))
    gt[:, :3, 2] = 0.85
    gt[:, :3, 3:6] = [0.9, 0.86, 1.7]
    gt[:, :3, 7] = 1
    batch = {
        "points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "num_points_in_gt": jnp.asarray((gt[..., 7] > 0) * 20.0),
        "true_object": jnp.asarray((gt[..., 7] > 0) * 1.0),
        "occupancy_ratio": jnp.asarray(rng.rand(b, m).astype(np.float32)),
        "facade_type": jnp.zeros((b, m), jnp.float32),
    }
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 3e-3,
                 "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10.0}), 100, 10)
    state = TrainState.create(
        variables, tx, num_head_groups=1, anchor_num_class=1,
        conf_shape=conf_shape_for(model_cfg, class_names))
    step = jax.jit(make_train_step(net, model_cfg, class_names, meta, tx,
                                   (32, 32)))
    state, metrics = step(state, batch, 0)
    assert np.isfinite(float(metrics["loss"]))
    assert np.asarray(metrics["confidence_cnt"]).shape == (1, 15)
    assert float(np.asarray(metrics["confidence_cnt"]).sum()) > 0


def test_prefetcher_propagates_worker_errors():
    from com_tpu.train.loop import DevicePrefetcher

    def bad_iter():
        yield {"x": np.zeros((2, 2), np.float32)}
        raise ValueError("corrupt sample")

    pf = DevicePrefetcher(bad_iter())
    it = iter(pf)
    next(it)  # first batch OK
    with pytest.raises(RuntimeError, match="data prefetch worker failed"):
        next(it)


def test_anchor_eval_coder_honors_config():
    """Eval decodes with the config's BOX_CODER_CONFIG (sincos/code_size),
    matching the training encoding — a default 7-dim coder would reshape
    the sincos head output wrongly."""
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.train.eval import make_eval_step

    class_names = ["Car"]
    model_cfg = CfgNode({
        "NAME": "PointPillar",
        "VFE": {"NAME": "DynamicPillarVFE", "USE_ABSLOTE_XYZ": True,
                "USE_NORM": True, "WITH_DISTANCE": False, "NUM_FILTERS": [16]},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1],
                        "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
                        "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": False,
            "TARGET_ASSIGNER_CONFIG": {
                "BOX_CODER_CONFIG": {"encode_angle_by_sincos": True}},
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car",
                "anchor_sizes": [[4.7, 2.1, 1.7]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [0.0],
                "align_center": True,
                "feature_map_stride": 2,
                "matched_threshold": 0.55,
                "unmatched_threshold": 0.4,
            }],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0,
                "code_weights": [1.0] * 7}},
        },
        "POST_PROCESSING": {"SCORE_THRESH": 0.0, "NMS_CONFIG": {
            "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
            "NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 32}},
    })
    meta = DatasetMeta(class_names, [-16, -16, -2, 16, 16, 4],
                       [0.5, 0.5, 6.0], [64, 64, 1], 5)
    net = build_network(model_cfg, meta)
    rng = np.random.RandomState(0)
    b, n = 1, 1024
    pts = np.concatenate([
        rng.uniform(-15, 15, (b, n, 2)), rng.uniform(-1, 2, (b, n, 1)),
        rng.rand(b, n, 2)], axis=2).astype(np.float32)
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.ones((b, n), bool)}
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    # the sincos head emits 8-dim boxes per anchor: eval must build + decode
    # without reshape errors and produce finite boxes
    step = make_eval_step(net, model_cfg, class_names, meta)
    boxes, scores, labels, valid = jax.jit(
        lambda v, x: step(v, x))(variables, batch)
    assert boxes.shape[-1] == 7
    assert np.isfinite(np.asarray(boxes)).all()
