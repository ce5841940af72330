"""VoxelRCNN: voxel_query semantics + full train step on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.ops.sparse import voxel_query
from com_tpu.ops.voxelize import voxelize_points
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian"]


def test_voxel_query_center_outward():
    grid = (8, 16, 16)
    coords = np.asarray(
        [[2, 5, 5], [2, 5, 6], [2, 7, 7], [2, 2, 2], [0, 0, 0]], np.int32)
    valid = np.asarray([True, True, True, True, False])
    # query at (2, 5, 5): expect itself first, then (2,5,6); far voxel and
    # invalid voxel excluded by radius/validity
    q = jnp.asarray([[2.0, 5.0, 5.0], [2.0, 14.0, 14.0]])
    idx, empty, slot = voxel_query(q, jnp.asarray(coords), jnp.asarray(valid),
                                   grid, max_range=2, radius_vox=2.0, nsample=4)
    idx, empty = np.asarray(idx), np.asarray(empty)
    assert np.asarray(slot)[0].sum() >= 2 and not np.asarray(slot)[1].any()
    assert not empty[0]
    assert idx[0, 0] == 0 and idx[0, 1] == 1  # center first, then neighbor
    assert empty[1]  # nothing within range of (2, 14, 14)


def voxelrcnn_cfg():
    return CfgNode({
        "NAME": "VoxelRCNN",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x", "CHANNELS": [8, 16, 32, 64],
                        "VOXEL_CAPS": [2048, 1024, 512, 256]},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 64},
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
                 "matched_threshold": 0.55, "unmatched_threshold": 0.4},
                {"class_name": "Pedestrian", "anchor_sizes": [[0.9, 0.86, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
                 "align_center": False, "feature_map_stride": 8,
                 "matched_threshold": 0.5, "unmatched_threshold": 0.35},
            ],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                             "loc_weight": 2.0,
                                             "dir_weight": 0.2,
                                             "code_weights": [1.0] * 7}},
        },
        "ROI_HEAD": {
            "NAME": "VoxelRCNNHead", "SHARED_FC": [32], "CLS_FC": [32],
            "REG_FC": [32], "DP_RATIO": 0.0,
            "ROI_GRID_POOL": {
                "FEATURES_SOURCE": ["x_conv3", "x_conv4"],
                "PRE_MLP": True, "GRID_SIZE": 3,
                "POOL_LAYERS": {
                    "x_conv3": {"MLPS": [[16, 16]], "QUERY_RANGES": [[2, 2, 2]],
                                "POOL_RADIUS": [1.2], "NSAMPLE": [8]},
                    "x_conv4": {"MLPS": [[16, 16]], "QUERY_RANGES": [[2, 2, 2]],
                                "POOL_RADIUS": [2.4], "NSAMPLE": [8]},
                },
            },
            "NMS_CONFIG": {"TRAIN": {"NMS_PRE_MAXSIZE": 256,
                                     "NMS_POST_MAXSIZE": 16,
                                     "NMS_THRESH": 0.8},
                           "TEST": {"NMS_PRE_MAXSIZE": 256,
                                    "NMS_POST_MAXSIZE": 16,
                                    "NMS_THRESH": 0.7}},
            "TARGET_CONFIG": {"ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
                              "REG_FG_THRESH": 0.55, "CLS_FG_THRESH": 0.75,
                              "CLS_BG_THRESH": 0.25},
            "LOSS_CONFIG": {"CORNER_LOSS_REGULARIZATION": True,
                            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                             "rcnn_reg_weight": 1.0,
                                             "rcnn_corner_weight": 1.0,
                                             "code_weights": [1.0] * 7}},
        },
    })


def test_voxelrcnn_train_step_runs():
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)
    # z=40 voxels: exact spconv extents need the reference-deep z chain
    pc_range = [-16, -16, -2.0, 16, 16, 2.0]
    vsize = [0.5, 0.5, 0.1]
    pts = np.concatenate(
        [rng.uniform(-14, 14, (3000, 2)), rng.uniform(-1.4, 1.4, (3000, 1)),
         rng.rand(3000, 2)], axis=1).astype(np.float32)
    vox, coords, num = voxelize_points(pts, pc_range, vsize, 5, 1024,
                                       pad_to_max=True)
    gt = np.zeros((1, 6, 8), np.float32)
    gt[0, :3, 0:2] = rng.uniform(-10, 10, (3, 2))
    gt[0, :3, 3:6] = [4.7, 2.1, 1.7]
    gt[0, :3, 7] = 1
    batch = {
        "voxels": jnp.asarray(vox[None]),
        "voxel_coords": jnp.asarray(coords[None]),
        "voxel_num_points": jnp.asarray(num[None]),
        "gt_boxes": jnp.asarray(gt),
    }
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    cfg = voxelrcnn_cfg()
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
    assert "rcnn_loss_cls" in metrics and "rcnn_loss_corner" in metrics
