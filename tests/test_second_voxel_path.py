"""SECOND voxel path end-to-end: MeanVFE -> sparse backbone -> height
compression -> BEV -> AnchorHeadSingle, forward + train step."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.ops.voxelize import voxelize_points
from com_tpu.train.optim import build_optimizer
from com_tpu.train.state import TrainState
from com_tpu.train.step import make_train_step
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian"]


def second_cfg():
    return CfgNode({
        "NAME": "SECONDNet",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x", "CHANNELS": [8, 16, 32, 64],
                        "OUT_CHANNELS": 32,
                        "VOXEL_CAPS": [2048, 1024, 512, 256]},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 64},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1, 1],
                        "LAYER_STRIDES": [1, 2], "NUM_FILTERS": [32, 64],
                        "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [32, 32]},
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
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                             "dir_weight": 0.2,
                                             "code_weights": [1.0] * 7}},
        },
    })


def make_voxel_batch(rng, b=2):
    # z must be reference-deep: spconv z-chain 40(+1 pad)->21->11->5->2
    # collapses to nothing below ~25 z-voxels (exact spconv extents)
    pc_range = [-16, -16, -2.0, 16, 16, 2.0]
    vsize = [0.5, 0.5, 0.1]  # grid 64x64x40
    batch_vox, batch_coords, batch_num = [], [], []
    gt = np.zeros((b, 8, 8), np.float32)
    for i in range(b):
        pts = np.concatenate(
            [rng.uniform(-15, 15, (4000, 2)), rng.uniform(-1.4, 1.4, (4000, 1)),
             rng.rand(4000, 2)], axis=1).astype(np.float32)
        vox, coords, num = voxelize_points(pts, pc_range, vsize, 5, 2048, pad_to_max=True)
        batch_vox.append(vox); batch_coords.append(coords); batch_num.append(num)
        gt[i, :3, 0:2] = rng.uniform(-10, 10, (3, 2))
        gt[i, :3, 2] = 0.0
        gt[i, :3, 3:6] = [4.7, 2.1, 1.7]
        gt[i, :3, 6] = rng.uniform(-np.pi, np.pi, 3)
        gt[i, :3, 7] = 1
    return {
        "voxels": jnp.asarray(np.stack(batch_vox)),
        "voxel_coords": jnp.asarray(np.stack(batch_coords)),
        "voxel_num_points": jnp.asarray(np.stack(batch_num)),
        "gt_boxes": jnp.asarray(gt),
        "num_points_in_gt": jnp.asarray((gt[..., 7] > 0) * 10.0),
    }, pc_range, vsize


def test_second_forward_and_train_step():
    rng = np.random.RandomState(0)
    batch, pc_range, vsize = make_voxel_batch(rng)
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    cfg = second_cfg()
    net = build_network(cfg, meta)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = net.apply(variables, dict(batch), train=False)
    # 64/8 = 8 BEV cells at stride 8
    assert out["spatial_features"].shape[1:3] == (8, 8)
    # 4 anchors/cell (2 classes x 2 rotations) x 2 class scores = 8 channels
    assert out["cls_preds_raw"].shape == (2, 8, 8, 8)

    tx, _ = build_optimizer(variables["params"],
                            CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 1e-3,
                                     "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10.0}),
                            100, 10)
    state = TrainState.create(variables, tx, num_head_groups=0)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (8, 8)))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, 0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_dynamic_mean_vfe_matches_host_voxelizer():
    """Device dynamic voxelization == host hard-voxelizer (mean features)."""
    from com_tpu.models.vfe import DynamicMeanVFE
    from com_tpu.utils.config import CfgNode as C

    rng = np.random.RandomState(7)
    pc_range = [-16, -16, -1.6, 16, 16, 1.6]
    vsize = [0.5, 0.5, 0.4]
    pts = np.concatenate(
        [rng.uniform(-15, 15, (3000, 2)), rng.uniform(-1.4, 1.4, (3000, 1)),
         rng.rand(3000, 2)], axis=1).astype(np.float32)
    vfe = DynamicMeanVFE(model_cfg=C({"MAX_VOXELS": 4096}), num_point_features=5,
                         voxel_size=vsize, point_cloud_range=pc_range,
                         grid_size=(64, 64, 8))
    batch = {"points": jnp.asarray(pts[None]), "points_mask": jnp.ones((1, 3000), bool)}
    out = vfe.apply({}, dict(batch), train=False)
    feats = np.asarray(out["pillar_features"])[0]
    coords = np.asarray(out["voxel_coords"])[0]
    valid = coords[:, 0] >= 0

    # host oracle: mean of points per voxel with a big per-voxel cap
    vox, hcoords, hnum = voxelize_points(pts, pc_range, vsize, 64, 4096)
    host = {tuple(c): vox[i, :hnum[i]].mean(axis=0) for i, c in enumerate(hcoords)}
    assert valid.sum() == len(host)
    for i in np.where(valid)[0]:
        np.testing.assert_allclose(feats[i], host[tuple(coords[i])], atol=1e-4)
