"""PartA2 family: UNetV2 decoder (inverse conv parity), RoI-aware pooling,
point part head targets, full PartA2Net train step on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.models.dense_heads.point_head import point_part_targets
from com_tpu.ops.roiaware import roiaware_pool3d, roipoint_pool3d
from com_tpu.ops.sparse import inverse_conv3d, strided_conv3d
from com_tpu.ops.voxelize import voxelize_points
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian"]


def test_inverse_conv_transposes_strided_rulebook():
    """inverse_conv3d with a one-hot kernel must route each low-res feature
    back to exactly the hi-res sites that produced it with the matching
    offset in strided_conv3d's rulebook (in = s*out + off <=> out = (in-off)/s)."""
    rng = np.random.RandomState(0)
    grid = (8, 8, 8)
    v = 32
    coords = np.unique(rng.randint(0, 8, (v, 3)), axis=0).astype(np.int32)
    v = len(coords)
    feats = rng.randn(v, 4).astype(np.float32)
    valid = np.ones(v, bool)
    w_down = np.zeros((27, 4, 4), np.float32)
    w_down[13] = np.eye(4)  # center tap only: out[l] = in[2*l]
    out, oc, ov, dgrid = strided_conv3d(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
        jnp.asarray(w_down), grid, out_cap=64, stride=(2, 2, 2))
    # inverse with center tap: hi site c receives lo[(c)/2] iff c divisible by 2
    w_up = np.zeros((27, 4, 4), np.float32)
    w_up[13] = np.eye(4)
    back = inverse_conv3d(
        out, oc, ov, jnp.asarray(w_up), jnp.asarray(coords),
        jnp.asarray(valid), dgrid, stride=(2, 2, 2))
    back = np.asarray(back)
    for i, c in enumerate(coords):
        if (c % 2 == 0).all():
            # center-tap roundtrip: hi site at even coords gets lo[c//2],
            # which itself pooled from hi site 2*(c//2) = c
            np.testing.assert_allclose(back[i], feats[i], atol=1e-5)


def test_roiaware_pool_bins_and_methods():
    rng = np.random.RandomState(1)
    roi = np.asarray([[0.0, 0, 0, 4, 2, 2, 0]], np.float32)
    # one point per known cell
    pts = np.asarray([
        [-1.9, -0.9, -0.9],  # cell (0, 0, 0)
        [1.9, 0.9, 0.9],     # cell (S-1, S-1, S-1)
        [10.0, 0, 0],        # outside
    ], np.float32)
    feats = np.asarray([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]], np.float32)
    pooled = roiaware_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.ones(3, bool),
        jnp.asarray(roi), out_size=4, max_pts=8, method="max")
    p = np.asarray(pooled[0])
    np.testing.assert_allclose(p[0, 0, 0], [1, 2])
    np.testing.assert_allclose(p[3, 3, 3], [3, 4])
    assert (p.sum() - 10) < 1e-5  # outside point never pooled

    # avg of two points in one cell
    pts2 = np.asarray([[0.1, 0.1, 0.1], [0.12, 0.12, 0.12]], np.float32)
    f2 = np.asarray([[2.0], [4.0]], np.float32)
    pooled = roiaware_pool3d(jnp.asarray(pts2), jnp.asarray(f2),
                             jnp.ones(2, bool), jnp.asarray(roi),
                             out_size=2, max_pts=4, method="avg")
    assert abs(np.asarray(pooled).max() - 3.0) < 1e-5

    out, empty = roipoint_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                 jnp.ones(3, bool), jnp.asarray(roi), 4)
    assert out.shape == (1, 4, 5) and not bool(empty[0])


def test_point_part_targets_canonical():
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [0, 0, 0, 4, 2, 2, 0, 1]
    pts = np.asarray([[[0.0, 0, 0], [1.9, 0.9, 0.9], [8, 8, 8]]], np.float32)
    label, part = point_part_targets(jnp.asarray(pts), jnp.asarray(gt))
    label, part = np.asarray(label[0]), np.asarray(part[0])
    assert label[0] == 1 and label[2] == 0
    np.testing.assert_allclose(part[0], 0.5, atol=1e-6)  # center -> (.5,.5,.5)
    assert (part[1] > 0.9).all()  # far corner -> ~1


def parta2_cfg():
    return CfgNode({
        "NAME": "PartA2Net",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "UNetV2", "CHANNELS": [8, 16, 32, 32],
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
        "POINT_HEAD": {"NAME": "PointIntraPartOffsetHead", "CLS_FC": [32],
                       "PART_FC": [32]},
        "ROI_HEAD": {
            "NAME": "PartA2FCHead", "SHARED_FC": [32], "CLS_FC": [32],
            "REG_FC": [32], "DP_RATIO": 0.0, "SEG_MASK_SCORE_THRESH": 0.3,
            "ROI_AWARE_POOL": {"POOL_SIZE": 4, "NUM_FEATURES": 16,
                               "MAX_POINTS_PER_ROI": 64},
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


def test_parta2_train_step_runs_and_is_finite():
    import optax

    from com_tpu.ops.voxelize import voxelize_points
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)
    pc_range = [-16, -16, -2.4, 16, 16, 2.4]
    vsize = [0.5, 0.5, 0.2]
    b = 1
    vox_l, coords_l, num_l = [], [], []
    gt = np.zeros((b, 6, 8), np.float32)
    for i in range(b):
        pts = np.concatenate(
            [rng.uniform(-14, 14, (3000, 2)), rng.uniform(-2.2, 2.2, (3000, 1)),
             rng.rand(3000, 2)], axis=1).astype(np.float32)
        vox, coords, num = voxelize_points(pts, pc_range, vsize, 5, 1024,
                                           pad_to_max=True)
        vox_l.append(vox); coords_l.append(coords); num_l.append(num)
        gt[i, :3, 0:2] = rng.uniform(-10, 10, (3, 2))
        gt[i, :3, 3:6] = [4.7, 2.1, 1.7]
        gt[i, :3, 7] = 1
    batch = {
        "voxels": jnp.asarray(np.stack(vox_l)),
        "voxel_coords": jnp.asarray(np.stack(coords_l)),
        "voxel_num_points": jnp.asarray(np.stack(num_l)),
        "gt_boxes": jnp.asarray(gt),
    }
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 24), 5)
    cfg = parta2_cfg()
    net = build_network(cfg, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)

    opt_cfg = CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                       "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85],
                       "PCT_START": 0.4, "DIV_FACTOR": 10,
                       "GRAD_NORM_CLIP": 10})
    from com_tpu.train.optim import build_optimizer
    tx, _ = build_optimizer(variables["params"], opt_cfg, total_steps=100,
                            steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (64, 64)))
    l0 = None
    for i in range(3):
        state, metrics = step(state, batch, 0)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        l0 = loss if l0 is None else l0
    assert "rcnn_loss_cls" in metrics and "point_loss_part" in metrics
