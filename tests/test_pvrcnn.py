"""PV-RCNN two-stage path: forward shapes + train step runs and improves."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.ops.voxelize import voxelize_points
from com_tpu.train.optim import build_optimizer
from com_tpu.train.state import TrainState
from com_tpu.train.step import make_train_step
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle"]


def pvrcnn_cfg():
    return CfgNode({
        "NAME": "PVRCNN",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x", "CHANNELS": [8, 16, 16, 32],
                        "VOXEL_CAPS": [1024, 512, 256, 128]},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32},
        "PFE": {"NAME": "VoxelSetAbstraction", "NUM_KEYPOINTS": 256, "NSAMPLE": 8,
                "FEATURES_SOURCE": ["bev", "raw_points", "x_conv3", "x_conv4"],
                "NUM_OUTPUT_FEATURES": 32,
                "SA_LAYER": {"raw_points": {"RADIUS": [1.0], "MLPS": [[8, 8]]},
                             "x_conv3": {"RADIUS": [2.0], "MLPS": [[16, 16]]},
                             "x_conv4": {"RADIUS": [4.0], "MLPS": [[16, 16]]}}},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                        "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1],
                        "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [
                {"class_name": "Vehicle", "anchor_sizes": [[4.7, 2.1, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
                 "align_center": False, "feature_map_stride": 8,
                 "matched_threshold": 0.55, "unmatched_threshold": 0.4}],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                             "dir_weight": 0.2, "code_weights": [1.0] * 7}},
        },
        "POINT_HEAD": {"NAME": "PointHeadSimple", "CLS_FC": [16]},
        "ROI_HEAD": {
            "NAME": "PVRCNNHead",
            "NMS_CONFIG": {"TRAIN_PRE": 128, "TEST_PRE": 128, "TEST_POST": 32},
            "TARGET_CONFIG": {"ROI_PER_IMAGE": 32, "FG_RATIO": 0.5,
                              "REG_FG_THRESH": 0.55},
            "ROI_GRID_POOL": {"GRID_SIZE": 3, "RADIUS": 1.0, "NSAMPLE": 8,
                              "MLPS": [[16, 16]]},
            "SHARED_FC": [32, 32],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                             "rcnn_reg_weight": 1.0}},
        },
    })


def make_batch(rng, b=2):
    # z=40 voxels: exact spconv extents need the reference-deep z chain
    pc_range = [-16, -16, -2.0, 16, 16, 2.0]
    vsize = [0.5, 0.5, 0.1]
    vox_l, crd_l, num_l, pts_l = [], [], [], []
    gt = np.zeros((b, 4, 8), np.float32)
    n_pts = 2000
    for i in range(b):
        pts = np.concatenate(
            [rng.uniform(-15, 15, (n_pts, 2)), rng.uniform(-1.4, 1.4, (n_pts, 1)),
             rng.rand(n_pts, 2)], axis=1).astype(np.float32)
        vox, coords, num = voxelize_points(pts, pc_range, vsize, 5, 1024, pad_to_max=True)
        vox_l.append(vox); crd_l.append(coords); num_l.append(num); pts_l.append(pts)
        gt[i, :2, 0:2] = rng.uniform(-10, 10, (2, 2))
        gt[i, :2, 3:6] = [4.7, 2.1, 1.7]
        gt[i, :2, 6] = rng.uniform(-np.pi, np.pi, 2)
        gt[i, :2, 7] = 1
    return {
        "voxels": jnp.asarray(np.stack(vox_l)),
        "voxel_coords": jnp.asarray(np.stack(crd_l)),
        "voxel_num_points": jnp.asarray(np.stack(num_l)),
        "points": jnp.asarray(np.stack(pts_l)),
        "points_mask": jnp.ones((b, n_pts), bool),
        "gt_boxes": jnp.asarray(gt),
        "num_points_in_gt": jnp.asarray((gt[..., 7] > 0) * 10.0),
    }, pc_range, vsize


def test_pvrcnn_train_step():
    rng = np.random.RandomState(0)
    batch, pc_range, vsize = make_batch(rng)
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    cfg = pvrcnn_cfg()
    net = build_network(cfg, meta)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=True)
    out = net.apply(variables, dict(batch), train=True,
                    mutable=["batch_stats"])[0]
    assert out["rcnn_cls"].shape == (2, 32)
    assert out["rcnn_reg"].shape == (2, 32, 7)
    assert out["roi_targets"].rois.shape == (2, 32, 7)

    tx, _ = build_optimizer(variables["params"],
                            CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 1e-3,
                                     "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10.0}),
                            100, 10)
    state = TrainState.create(variables, tx, num_head_groups=0)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (8, 8)))
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, 0)
        losses.append(float(metrics["loss"]))
        assert "rcnn_loss_cls" in metrics and "rcnn_loss_reg" in metrics
        assert "point_loss_cls" in metrics
    assert np.isfinite(losses).all()
    # two-stage + point-head losses oscillate as proposals shift; require
    # steady net progress over the short run
    assert min(losses) < losses[0] * 0.85, losses
    assert losses[-1] <= min(losses) * 1.2, losses

    # eval-mode forward produces rois + refinement outputs
    ev = net.apply(variables, dict(batch), train=False)
    assert ev["rois"].shape == (2, 32, 7)
    assert ev["rcnn_cls"].shape == (2, 32)
