"""Focal sparse conv: spawn/dedup semantics + full backbone train step."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.ops.sparse import focal_split_and_spawn
from com_tpu.ops.voxelize import voxelize_points
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle"]


def test_focal_split_and_spawn_semantics():
    grid = (8, 8, 8)
    coords = jnp.asarray([[4, 4, 4], [1, 1, 1], [0, 0, 0]], jnp.int32)
    valid = jnp.asarray([True, True, False])
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]])
    # voxel 0 strongly foreground, spawns its +z neighbor (offset idx 22:
    # (1,0,0) in zyx after center removal); voxel 1 background
    imps = np.full((3, 27), -10.0, np.float32)
    imps[0, -1] = 10.0  # own importance -> fg
    imps[0, 22] = 10.0  # one strong offset
    imps[1, -1] = -10.0
    nf, nc, nv, own = focal_split_and_spawn(
        feats, coords, valid, jnp.asarray(imps), grid, 0.5, spawn_cap=4)
    nf, nc, nv = np.asarray(nf), np.asarray(nc), np.asarray(nv)
    assert nv[:2].tolist() == [True, True] and not nv[2]
    spawned = nv[3:]
    assert spawned.sum() == 1
    si = 3 + int(np.argmax(spawned))
    # spawned at parent + offset, feature = parent * sigmoid(10) ~ parent
    from com_tpu.ops.sparse import _offsets
    offs = np.delete(_offsets(3), 13, axis=0)
    np.testing.assert_array_equal(nc[si], coords[0] + offs[22])
    np.testing.assert_allclose(nf[si], np.asarray(feats[0]), rtol=1e-3)
    # fg voxel's own features scaled by its importance (~1.0 here)
    np.testing.assert_allclose(nf[0], np.asarray(feats[0]), rtol=1e-3)

    # spawn onto an EXISTING voxel is suppressed: make voxel 0 spawn toward
    # voxel at (4,4,5) which already exists
    coords2 = jnp.asarray([[4, 4, 4], [4, 4, 5]], jnp.int32)
    imps2 = np.full((2, 27), -10.0, np.float32)
    imps2[0, -1] = 10.0
    # offset (0,0,1) is index 13 after center removal
    offs_i = int(np.where((offs == [0, 0, 1]).all(1))[0][0])
    imps2[0, offs_i] = 10.0
    nf2, nc2, nv2, _ = focal_split_and_spawn(
        jnp.ones((2, 2)), coords2, jnp.ones(2, bool), jnp.asarray(imps2),
        grid, 0.5, spawn_cap=4)
    assert np.asarray(nv2)[2:].sum() == 0  # collision -> no spawn


def test_focal_backbone_train_step():
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)
    # z=40 voxels: exact spconv extents need the reference-deep z chain
    pc_range = [-16, -16, -2.0, 16, 16, 2.0]
    vsize = [0.5, 0.5, 0.1]
    pts = np.concatenate(
        [rng.uniform(-14, 14, (2500, 2)), rng.uniform(-1.4, 1.4, (2500, 1)),
         rng.rand(2500, 2)], axis=1).astype(np.float32)
    vox, coords, num = voxelize_points(pts, pc_range, vsize, 5, 1024,
                                       pad_to_max=True)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, :2, 0:2] = rng.uniform(-10, 10, (2, 2))
    gt[0, :2, 3:6] = [4.7, 2.1, 1.7]
    gt[0, :2, 7] = 1
    batch = {
        "voxels": jnp.asarray(vox[None]),
        "voxel_coords": jnp.asarray(coords[None]),
        "voxel_num_points": jnp.asarray(num[None]),
        "gt_boxes": jnp.asarray(gt),
    }
    cfg = CfgNode({
        "NAME": "SECONDNet",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8xFocal",
                        "CHANNELS": [8, 16, 32, 32],
                        "VOXEL_CAPS": [1024, 512, 256, 128],
                        "FOCAL_STAGES": [0], "FOCAL_THRESHOLD": 0.5,
                        "SPAWN_CAP": 256},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1],
                        "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                        "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [
                {"class_name": "Vehicle", "anchor_sizes": [[4.7, 2.1, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
                 "align_center": False, "feature_map_stride": 8,
                 "matched_threshold": 0.55, "unmatched_threshold": 0.4}],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                             "loc_weight": 2.0,
                                             "dir_weight": 0.2,
                                             "code_weights": [1.0] * 7}},
        },
    })
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    net = build_network(cfg, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                 "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10}),
        total_steps=100, steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (64, 64)))
    for i in range(3):
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))
    assert "loss_box_of_pts" in metrics
    assert float(metrics["loss_box_of_pts"]) > 0
