"""PV-RCNN++: sector FPS, SPC sampling, vector-pool features, full step."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.ops.pointnet2 import (
    sample_points_with_roi,
    sector_fps,
    vector_pool_features,
)
from com_tpu.utils.config import CfgNode
from test_pvrcnn import make_batch, pvrcnn_cfg

CLASS_NAMES = ["Vehicle"]


def test_sector_fps_covers_all_sectors():
    rng = np.random.RandomState(0)
    angles = rng.uniform(-np.pi, np.pi, 512)
    r = rng.uniform(5, 20, 512)
    xyz = np.stack([r * np.cos(angles), r * np.sin(angles),
                    rng.randn(512) * 0.2], 1).astype(np.float32)
    idx, valid = sector_fps(jnp.asarray(xyz), jnp.ones(512, bool), 64, 4)
    assert idx.shape == (64,) and bool(valid.all())
    samp = xyz[np.asarray(idx)]
    ang = np.arctan2(samp[:, 1], samp[:, 0]) + np.pi
    sect = np.floor(ang / (np.pi / 2)).clip(0, 3)
    counts = np.bincount(sect.astype(int), minlength=4)
    assert (counts == 16).all()  # equal share per sector


def test_sample_points_with_roi():
    xyz = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0], [30.0, 0, 0]])
    rois = jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.0]])
    m = sample_points_with_roi(rois, jnp.ones(1, bool), xyz,
                               jnp.ones(3, bool), 1.6)
    np.testing.assert_array_equal(np.asarray(m), [True, True, False])


def test_vector_pool_features_modes():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.uniform(-2, 2, (128, 3)).astype(np.float32))
    feats = jnp.asarray(rng.rand(128, 8).astype(np.float32))
    new_xyz = jnp.asarray([[0.0, 0, 0], [50.0, 50, 50]])
    for mode in ("voxel_avg_pool", "local_interpolation"):
        out, empty = vector_pool_features(
            xyz, feats, jnp.ones(128, bool), new_xyz, (2, 2, 2), 1.0, 16, mode)
        assert out.shape == (2, 8 * (3 + 8))
        assert np.isfinite(np.asarray(out)).all()
        assert not bool(empty[0]) and bool(empty[1])
        assert np.abs(np.asarray(out[1])).sum() == 0  # empty query zeroed


def test_pvrcnn_plusplus_train_step():
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    cfg = pvrcnn_cfg()
    cfg["NAME"] = "PVRCNNPlusPlus"
    cfg["PFE"]["SAMPLE_METHOD"] = "SPC"
    cfg["PFE"]["SPC_SAMPLING"] = {"NUM_SECTORS": 4,
                                  "SAMPLE_RADIUS_WITH_ROI": 1.6}
    cfg["ROI_HEAD"]["NAME"] = "PVRCNNPlusPlusHead"
    cfg["ROI_HEAD"]["NMS_CONFIG"] = {
        "TRAIN": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                  "NMS_THRESH": 0.8},
        "TEST": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                 "NMS_THRESH": 0.7}}
    cfg["ROI_HEAD"]["TARGET_CONFIG"]["ROI_PER_IMAGE"] = 16
    cfg["ROI_HEAD"]["ROI_GRID_POOL"] = {
        "GRID_SIZE": 3, "LOCAL_AGGREGATION_TYPE": "local_interpolation",
        "GROUPS": [{"NUM_LOCAL_VOXEL": [2, 2, 2], "MAX_NEIGHBOR_DISTANCE": 0.8,
                    "NEIGHBOR_NSAMPLE": 8, "POST_MLPS": [16]},
                   {"NUM_LOCAL_VOXEL": [2, 2, 2], "MAX_NEIGHBOR_DISTANCE": 1.6,
                    "NEIGHBOR_NSAMPLE": 8, "POST_MLPS": [16]}]}

    rng = np.random.RandomState(0)
    batch, pc_range, vsize = make_batch(rng, b=1)
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    net = build_network(cfg, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                 "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85],
                 "PCT_START": 0.4, "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10}),
        total_steps=100, steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (64, 64)))
    for i in range(3):
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))
    assert "rcnn_loss_cls" in metrics
