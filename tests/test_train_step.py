"""End-to-end train step: overfit tiny synthetic scenes; 8-device mesh run.

This is the rebuild's equivalent of the reference's only quality oracle
(empirical training, SURVEY §4) in miniature: loss must drop when overfitting,
and the same step must run sharded over a virtual 8-device mesh with identical
semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from com_tpu.models.detectors import build_network, DatasetMeta
from com_tpu.train.optim import build_optimizer
from com_tpu.train.state import TrainState
from com_tpu.train.step import make_train_step
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]


def tiny_model_cfg(curriculum=False):
    cfg = {
        "NAME": "CenterPoint",
        "VFE": {"NAME": "DynamicPillarVFE", "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                "WITH_DISTANCE": False, "NUM_FILTERS": [32, 32]},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                        "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": {"NAME": "CenterHead", "CLASS_NAMES_EACH_HEAD": [CLASS_NAMES],
                       "SHARED_CONV_CHANNEL": 32, "USE_BIAS_BEFORE_NORM": True, "NUM_HM_CONV": 2,
                       "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 1, "NUM_MAX_OBJS": 16,
                                                  "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2,
                                                  "MIN_POINTS": 0},
                       "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                                        "code_weights": [1.0] * 8}},
                       "SEPARATE_HEAD_CFG": {"HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                         "HEAD_DICT": {"center": {"out_channels": 2, "num_conv": 2},
                                       "center_z": {"out_channels": 1, "num_conv": 2},
                                       "dim": {"out_channels": 3, "num_conv": 2},
                                       "rot": {"out_channels": 2, "num_conv": 2}}}},
    }
    if curriculum:
        cfg["DENSE_HEAD"]["NAME"] = "CurriculumCenterHead_x5"
        cfg["DENSE_HEAD"]["LOSS_CURRICULUM"] = {
            "UCL": True, "THRESHOLD": 0.2, "ELONGATION": -10, "HEIGHT": 1, "FIX": True,
        }
    return CfgNode(cfg)


def synthetic_batch(rng, b=2, n=2048, m=16):
    """Scenes with a few boxes and points concentrated inside them."""
    pts = np.concatenate(
        [rng.uniform(-15, 15, (b, n, 2)), rng.uniform(-1, 3, (b, n, 1)), rng.rand(b, n, 2)],
        axis=2,
    ).astype(np.float32)
    gt = np.zeros((b, m, 8), np.float32)
    npgt = np.zeros((b, m), np.float32)
    for i in range(b):
        k = 4
        gt[i, :k, 0:2] = rng.uniform(-10, 10, (k, 2))
        gt[i, :k, 2] = rng.uniform(-0.5, 1.0, k)
        gt[i, :k, 3:6] = rng.uniform(1.5, 4.0, (k, 3))
        gt[i, :k, 6] = rng.uniform(-np.pi, np.pi, k)
        gt[i, :k, 7] = rng.randint(1, 4, k)
        npgt[i, :k] = rng.randint(5, 50, k)
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "num_points_in_gt": jnp.asarray(npgt),
        "true_object": jnp.asarray((gt[..., -1] > 0).astype(np.float32)),
        "occupancy_ratio": jnp.asarray(rng.rand(b, m).astype(np.float32)),
        "facade_type": jnp.asarray(rng.randint(0, 4, (b, m)).astype(np.float32)),
    }


META = DatasetMeta(CLASS_NAMES, [-16, -16, -2, 16, 16, 4], [0.5, 0.5, 6.0], [64, 64, 1], 5)


def _setup(curriculum):
    cfg = tiny_model_cfg(curriculum)
    net = build_network(cfg, META)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 3e-3, "WEIGHT_DECAY": 0.01,
                 "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
                 "GRAD_NORM_CLIP": 10.0}),
        total_steps=100,
        steps_per_epoch=10,
    )
    state = TrainState.create(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, META, tx, (64, 64)),
                   static_argnames=())
    return step, state, batch


def test_overfit_loss_decreases():
    step, state, batch = _setup(curriculum=False)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, 0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.6, losses[::5]


@pytest.mark.quick
def test_curriculum_step_runs_and_reports_confidences():
    step, state, batch = _setup(curriculum=True)
    state, metrics = step(state, batch, 0)
    cs = np.asarray(metrics["confidence_sum"])
    cc = np.asarray(metrics["confidence_cnt"])
    assert cs.shape == (3, 96) and cc.shape == (3, 96)
    # true objects were clustered into groups, so counts must be > 0
    assert cc.sum() > 0
    # EMA state advanced
    assert float(state.curriculum[0].avg_confidence) > 0


def test_train_step_on_8_device_mesh():
    from com_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state

    step, state, batch = _setup(curriculum=True)
    # batch of 8 scenes sharded over 8 devices
    rng = np.random.RandomState(1)
    big = synthetic_batch(rng, b=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    with mesh:
        sb = shard_batch(big, mesh)
        rs = replicate_state(state, mesh)
        rs, metrics = step(rs, sb, 0)
        assert np.isfinite(float(metrics["loss"]))
        # single-device run over the same global batch must agree
        state2, metrics2 = step(state, big, 0)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics2["loss"]), rtol=2e-4
        )


def test_merge_scores_single_class_com():
    """Single-class merge-variant COM head (car_com2 config path) trains."""
    cfg = tiny_model_cfg(curriculum=True)
    cfg.CLASS_NAMES = ["Vehicle"]
    cfg["DENSE_HEAD"]["CLASS_NAMES_EACH_HEAD"] = [["Vehicle"]]
    cfg["DENSE_HEAD"]["NAME"] = "CurriculumCenterHead_car_merge"
    cfg["DENSE_HEAD"]["LOSS_CURRICULUM"] = {
        "UCL": True, "MERGE_SCORES": True, "OFFSET": 0.5, "ELONGATION": -10,
        "HEIGHT": 1, "ALPHA": 0.01,
    }
    meta = DatasetMeta(["Vehicle"], [-16, -16, -2, 16, 16, 4], [0.5, 0.5, 6.0],
                       [64, 64, 1], 5)
    net = build_network(cfg, meta)
    rng = np.random.RandomState(3)
    batch = synthetic_batch(rng)
    # make all GT vehicles (class 1)
    gt = np.array(batch["gt_boxes"])
    gt[..., 7] = np.where(gt[..., 7] > 0, 1, 0)
    batch["gt_boxes"] = jnp.asarray(gt)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    tx, _ = build_optimizer(variables["params"],
                            CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 1e-3,
                                     "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10.0}),
                            100, 10)
    state = TrainState.create(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, ["Vehicle"], meta, tx, (64, 64)))
    for i in range(3):
        state, metrics = step(state, batch, i)
    assert np.isfinite(float(metrics["loss"]))
    # merge stats engaged: mean/std EMA initialized
    assert bool(np.asarray(state.curriculum[0].initialized))
    assert float(state.curriculum[0].mean) > 0
    # conf tensor is (1, 96) for single-class Vehicle
    assert np.asarray(metrics["confidence_sum"]).shape == (1, 96)
