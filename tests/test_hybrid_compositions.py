"""Forward tests for the cross-family compositions added with the config zoo:
CenterHead-RPN two-stage hybrids (pv_rcnn_with_centerhead_rpn,
voxel_rcnn_with_centerhead_dyn_voxel), the full MPPNetE2E detector, and the
PartA2-free point head (PointIntraPartOffsetHead with box regression)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.utils.config import cfg_from_yaml_file

REPO = Path(__file__).resolve().parents[1]

GRID = (32, 32, 8)
PC_RANGE = [-3.2, -3.2, -2.0, 3.2, 3.2, 4.0]
VOXEL = [0.2, 0.2, 0.75]


def tiny_batch(rng, b=1, n=2048, m=12, num_class=3):
    pts = np.concatenate(
        [
            rng.uniform(PC_RANGE[0], PC_RANGE[3], (b, n, 2)),
            rng.uniform(PC_RANGE[2], PC_RANGE[5], (b, n, 1)),
            rng.rand(b, n, 2),
        ],
        axis=2,
    ).astype(np.float32)
    gt = np.zeros((b, m, 8), np.float32)
    k = 6
    gt[:, :k, 0:2] = rng.uniform(-2.5, 2.5, (b, k, 2))
    gt[:, :k, 2] = rng.uniform(-0.5, 1.0, (b, k))
    gt[:, :k, 3:6] = rng.uniform(0.8, 2.0, (b, k, 3))
    gt[:, :k, 6] = rng.uniform(-np.pi, np.pi, (b, k))
    gt[:, :k, 7] = rng.randint(1, num_class + 1, (b, k))
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }


def build_from_yaml(rel, shrink=True):
    cfg = cfg_from_yaml_file(str(REPO / rel))
    meta = DatasetMeta(cfg.CLASS_NAMES, PC_RANGE, VOXEL, GRID, 5)
    model_cfg = cfg.MODEL
    # shrink voxel caps for the tiny scene
    if "BACKBONE_3D" in model_cfg and "VOXEL_CAPS" in model_cfg["BACKBONE_3D"]:
        model_cfg["BACKBONE_3D"]["VOXEL_CAPS"] = [2048, 2048, 1024, 512]
    # tests feed raw points; hard-VFE configs voxelize on device
    if model_cfg.get("VFE", {}).get("NAME") in ("MeanVFE", "PillarVFE"):
        model_cfg["VFE"]["VOXELIZE_ON_DEVICE"] = {
            "MAX_POINTS_PER_VOXEL": 5, "MAX_NUMBER_OF_VOXELS": 2048}
    return build_network(model_cfg, meta), cfg


@pytest.mark.parametrize(
    "rel",
    [
        "configs/waymo_models/pv_rcnn_with_centerhead_rpn.yaml",
        "configs/waymo_models/voxel_rcnn_with_centerhead_dyn_voxel.yaml",
    ],
)
def test_centerhead_rpn_hybrid_forward(rel):
    rng = np.random.RandomState(0)
    net, cfg = build_from_yaml(rel)
    batch = tiny_batch(rng)
    variables = jax.jit(net.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dict(batch), train=True,
    )
    out, _ = jax.jit(
        lambda v, b: net.apply(v, dict(b), train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)}),
    )(variables, batch)
    # center-head proposals fed the RoI stage
    assert "rois" in out and out["rois"].ndim == 3
    assert "rcnn_cls" in out or "batch_cls_preds" in out or "rcnn_reg" in out


def test_mppnet_e2e_detector_forward():
    rng = np.random.RandomState(1)
    net, cfg = build_from_yaml(
        "configs/waymo_models/mppnet_e2e_memorybank_inference.yaml")
    # shrink the transformer for test speed
    roi = cfg.MODEL["ROI_HEAD"]
    roi["Transformer"]["num_frames"] = 2
    roi["Transformer"]["num_groups"] = 2
    roi["Transformer"]["enc_layers"] = 1
    roi["TARGET_CONFIG"]["ROI_PER_IMAGE"] = 8
    batch = tiny_batch(rng, n=1024)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = net.apply(variables, dict(batch), train=False)
    r = out["rois"].shape[1]
    assert out["batch_box_preds"].shape[:2] == (1, r)
    assert out["batch_cls_preds"].shape[:2] == (1, r)
    assert bool(jnp.isfinite(out["batch_box_preds"]).all())


def test_parta2_free_forward():
    rng = np.random.RandomState(2)
    net, cfg = build_from_yaml("configs/kitti_models/PartA2_free.yaml")
    batch = tiny_batch(rng)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), dict(batch), train=True
    )
    out, _ = jax.jit(
        lambda v, b: net.apply(v, dict(b), train=True, mutable=["batch_stats"]),
    )(variables, batch)
    # the part head regressed boxes (free-anchor proposals) and the RoI
    # stage consumed them
    assert "point_part_offset" in out
    assert "point_box_preds" in out
    assert "rois" in out


def test_centerhead_rpn_hybrid_train_step():
    """The full train step composes for the CenterHead-RPN + RCNN hybrid:
    centerpoint dense losses + rcnn refinement losses, finite loss, one
    optimizer update."""
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    rng = np.random.RandomState(3)
    net, cfg = build_from_yaml("configs/waymo_models/pv_rcnn_with_centerhead_rpn.yaml")
    batch = tiny_batch(rng)
    batch["num_points_in_gt"] = jnp.full(batch["gt_boxes"].shape[:2], 10.0)
    variables = jax.jit(net.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dict(batch), train=True,
    )
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=100, steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    from com_tpu.models.detectors import DatasetMeta

    meta = DatasetMeta(cfg.CLASS_NAMES, PC_RANGE, VOXEL, GRID, 5)
    step = jax.jit(make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES),
                                   meta, tx, (GRID[1] // 8, GRID[0] // 8)))
    state, metrics = step(state, batch, 0)
    assert np.isfinite(float(metrics["loss"]))
    assert "rcnn_loss_cls" in metrics or float(metrics["loss"]) > 0
