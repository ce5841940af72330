"""Focal sparse conv image fusion + KITTI image copy-paste GT-aug.

Covers the reference's voxel_rcnn_car_focal_multimodal composition
(focal_sparse_conv.py use_img branch + database_sampler.py:180-374):
in-jit voxel->camera feature gathering with aug reversal, the multimodal
train step, and the sampler's crop-collect/paste/point-keep semantics on
hand-built scenes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.data.kitti.calibration import (
    Calibration,
    boxes3d_kitti_camera_to_imageboxes,
    boxes3d_lidar_to_kitti_camera,
    calib_to_matricies,
)
from com_tpu.models.backbone3d import voxel_image_features
from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.utils.config import CfgNode


def _calib():
    # camera at lidar origin: x_cam=-y_l, y_cam=-z_l, z_cam=x_l; f=100,
    # principal point (200, 150)
    V2C = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float64)
    return Calibration({
        "P2": np.array([100.0, 0, 200, 0, 0, 100, 150, 0, 0, 0, 1, 0]),
        "R0_rect": np.eye(3).ravel(),
        "Tr_velo_to_cam": V2C.ravel(),
    })


def test_voxel_image_features_projection():
    calib = _calib()
    l2c, c2i = calib_to_matricies(calib)
    # feature map: 75x100 (image 300x400 at ds=4), value = u index
    h, w = 75, 100
    feats = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :, None], (h, 1, 1))

    pc_range = jnp.asarray([0.0, -20.0, -2.0, 40.0, 20.0, 2.0])
    vsize = (0.5, 0.5, 0.5)
    # voxel (z=4, y=40, x=20) -> lidar center (10, 0, 0) -> cam (0,0,10)
    # -> pixel (200, 150) -> feat u = 50
    coords = jnp.asarray([[4, 40, 20], [4, 40, 20]], jnp.int32)
    valid = jnp.asarray([True, False])
    g = voxel_image_features(
        feats, coords, valid, (8, 80, 80), 1, vsize, pc_range,
        jnp.asarray(l2c), jnp.asarray(c2i), 4.0, (300, 400),
        jnp.float32(0.0), jnp.float32(1.0), False, False)
    assert g.shape == (2, 1)
    assert float(g[0, 0]) == pytest.approx(50.0, abs=1e-3)
    assert float(g[1, 0]) == 0.0  # invalid voxel -> zero feature

    # behind the camera (negative lidar x) -> out of view -> zero
    coords_b = jnp.asarray([[4, 40, 0]], jnp.int32)  # x = -10... x=0*0.5+0=0
    g_b = voxel_image_features(
        feats, coords_b, jnp.asarray([True]), (8, 80, 80), 1, vsize,
        jnp.asarray([-40.0, -20.0, -2.0, 0.0, 20.0, 2.0]),
        jnp.asarray(l2c), jnp.asarray(c2i), 4.0, (300, 400),
        jnp.float32(0.0), jnp.float32(1.0), False, False)
    assert float(g_b[0, 0]) == 0.0

    # scale-aug reversal: recorded noise_scale=2 means the scene was scaled
    # x2, so a voxel at (20, 0, 0) maps back to the original (10, 0, 0)
    coords_s = jnp.asarray([[4, 40, 40]], jnp.int32)  # lidar (20, 0, 0)
    g_s = voxel_image_features(
        feats, coords_s, jnp.asarray([True]), (8, 80, 80), 1, vsize,
        pc_range, jnp.asarray(l2c), jnp.asarray(c2i), 4.0, (300, 400),
        jnp.float32(0.0), jnp.float32(2.0), False, False)
    assert float(g_s[0, 0]) == pytest.approx(50.0, abs=1e-3)

    # flip_x reversal: y negated before projection
    coords_f = jnp.asarray([[4, 48, 20]], jnp.int32)  # lidar (10, 4, 0)
    g_noflip = voxel_image_features(
        feats, coords_f, jnp.asarray([True]), (8, 80, 80), 1, vsize,
        pc_range, jnp.asarray(l2c), jnp.asarray(c2i), 4.0, (300, 400),
        jnp.float32(0.0), jnp.float32(1.0), False, False)
    g_flip = voxel_image_features(
        feats, coords_f, jnp.asarray([True]), (8, 80, 80), 1, vsize,
        pc_range, jnp.asarray(l2c), jnp.asarray(c2i), 4.0, (300, 400),
        jnp.float32(0.0), jnp.float32(1.0), True, False)
    # y=+4 -> x_cam=-4 -> u=200-40*... u = 200 + 100*(-4)/10 = 160 (feat 40);
    # flipped y=-4 -> u=240 (feat 60)
    assert float(g_noflip[0, 0]) == pytest.approx(40.0, abs=1e-3)
    assert float(g_flip[0, 0]) == pytest.approx(60.0, abs=1e-3)


def _voxelize(pts, pc_range, vsize, cap):
    from com_tpu.ops.voxelize import voxelize_points

    return voxelize_points(pts, pc_range, vsize, 5, cap, pad_to_max=True)


def test_multimodal_focal_train_step():
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import device_batch_keys, make_train_step

    rng = np.random.RandomState(0)
    # z=40 voxels: exact spconv extents need the reference-deep z chain
    pc_range = [0, -16, -2.0, 32, 16, 2.0]
    vsize = [0.5, 0.5, 0.1]
    pts = np.concatenate(
        [rng.uniform(1, 30, (2000, 1)), rng.uniform(-14, 14, (2000, 1)),
         rng.uniform(-1.4, 1.4, (2000, 1)), rng.rand(2000, 1)],
        axis=1).astype(np.float32)
    vox, coords, num = _voxelize(pts, pc_range, vsize, 1024)
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, :2, 0] = [10, 20]
    gt[0, :2, 3:6] = [4.7, 2.1, 1.7]
    gt[0, :2, 7] = 1
    calib = _calib()
    l2c, c2i = calib_to_matricies(calib)
    batch = {
        "voxels": jnp.asarray(vox[None]),
        "voxel_coords": jnp.asarray(coords[None]),
        "voxel_num_points": jnp.asarray(num[None]),
        "gt_boxes": jnp.asarray(gt),
        "images": jnp.asarray(rng.rand(1, 96, 160, 3).astype(np.float32)),
        "trans_lidar_to_cam": jnp.asarray(l2c[None]),
        "trans_cam_to_img": jnp.asarray(c2i[None]),
        "noise_rot": jnp.zeros((1,)),
        "noise_scale": jnp.ones((1,)),
        "flip_x": jnp.zeros((1,), bool),
        "flip_y": jnp.zeros((1,), bool),
    }
    cfg = CfgNode({
        "NAME": "SECONDNet",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8xFocal", "USE_IMG": True,
                        "IMG_CHANNELS": 8,
                        "CHANNELS": [8, 16, 32, 32],
                        "VOXEL_CAPS": [1024, 512, 256, 128],
                        "FOCAL_STAGES": [], "FOCAL_THRESHOLD": 0.5,
                        "SPAWN_CAP": 256},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1],
                        "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                        "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [
                {"class_name": "Car", "anchor_sizes": [[4.7, 2.1, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
                 "align_center": False, "feature_map_stride": 8,
                 "matched_threshold": 0.55, "unmatched_threshold": 0.4}],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                             "loc_weight": 2.0,
                                             "dir_weight": 0.2,
                                             "code_weights": [1.0] * 7}},
        },
    })
    keys = device_batch_keys(cfg)
    assert {"images", "trans_lidar_to_cam", "noise_rot", "flip_x"} <= keys
    meta = DatasetMeta(["Car"], pc_range, vsize, (64, 64, 40), 5)
    net = build_network(cfg, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    bb_key = next(k for k in variables["params"]
                  if "VoxelBackBone8xFocal" in k)
    assert "semseg" in variables["params"][bb_key]
    assert "focal_mm" in variables["params"][bb_key]
    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                 "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10}),
        total_steps=100, steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, ["Car"], meta, tx, (64, 64)))
    for i in range(2):
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))
    assert "loss_box_of_pts" in metrics
    # image-path gradients flow: semseg params move after the step
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a or b,
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)),
            variables["params"][bb_key]["semseg"],
            state.params[bb_key]["semseg"]),
        False)
    assert moved


# ---- sampler image copy-paste ----


def _scene_with_sampler(rng, sample_num=1, use_road_plane=False):
    from com_tpu.data.augmentor.database_sampler import DataBaseSampler

    calib = _calib()
    H, W = 300, 400
    image = rng.rand(H, W, 3).astype(np.float32)
    gt_box = np.array([[10.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0]], np.float32)
    cam = boxes3d_lidar_to_kitti_camera(gt_box, calib)
    gt2d = boxes3d_kitti_camera_to_imageboxes(cam, calib, (H, W))

    pts = np.concatenate(
        [rng.uniform(5, 40, (500, 1)), rng.uniform(-10, 10, (500, 1)),
         rng.uniform(-1.5, 1.5, (500, 1)), rng.rand(500, 1)], 1
    ).astype(np.float32)

    obox = np.array([15.0, 5.0, 0.0, 4.0, 2.0, 1.6, 0.3], np.float32)
    opts = (rng.rand(40, 4).astype(np.float32) - 0.5)
    opts[:, :3] *= [3.5, 1.8, 1.4]
    opts[:, :3] += obox[:3]
    donor_img = (rng.rand(H, W, 3) * 255).astype(np.float32)
    ocam = boxes3d_lidar_to_kitti_camera(obox[None], calib)
    obb = boxes3d_kitti_camera_to_imageboxes(ocam, calib, (H, W))[0]
    info = {"name": "Car", "box3d_lidar": obox, "num_points_in_gt": 40,
            "points": opts, "calib": calib, "image": donor_img, "bbox": obb,
            "difficulty": 0, "occupancy_ratio": 0.5, "facade_type": 0}

    cfg = {"SAMPLE_GROUPS": [f"Car:{sample_num}"], "IMG_AUG_TYPE": "kitti",
           "NUM_POINT_FEATURES": 4, "LIMIT_WHOLE_SCENE": False}
    if use_road_plane:
        cfg["USE_ROAD_PLANE"] = True
    sampler = DataBaseSampler(None, cfg, ["Car"],
                              db_infos={"Car": [info]}, rng=rng)
    dd = {"gt_boxes": gt_box.copy(), "gt_names": np.array(["Car"]),
          "gt_boxes_mask": np.ones(1, bool), "points": pts.copy(),
          "images": image.copy(), "calib": calib, "gt_boxes2d": gt2d.copy()}
    return sampler, dd, image


def test_image_paste_end_to_end():
    rng = np.random.RandomState(0)
    sampler, dd, orig_image = _scene_with_sampler(rng)
    out = sampler(dict(dd))
    assert out["gt_boxes"].shape[0] == 2
    assert out["gt_boxes2d"].shape == (2, 4)
    # pasted region differs from the original image; elsewhere unchanged
    b = out["gt_boxes2d"][1].astype(int)
    pasted = out["images"][b[1]:b[3], b[0]:b[2]]
    assert np.abs(pasted - orig_image[b[1]:b[3], b[0]:b[2]]).max() > 0.1
    far_corner = out["images"][:40, -40:]
    np.testing.assert_allclose(far_corner, orig_image[:40, -40:])
    # pasted crop values land in [0, 1] (donor /255)
    assert pasted.min() >= 0 and pasted.max() <= 1.0
    # the pasted object's points survive
    assert len(out["points"]) >= 40


def test_image_paste_occludes_original_points():
    """An original point whose pixel lands inside a pasted (non-own) region
    is removed (copy_paste_to_image_kitti keep-mask semantics)."""
    rng = np.random.RandomState(1)
    sampler, dd, _ = _scene_with_sampler(rng)
    # plant an original background point far behind the donor object so its
    # projection falls inside the pasted box
    victim = np.array([[30.0, 10.0, 0.0, 0.5]], np.float32)
    dd["points"] = np.concatenate([dd["points"], victim])
    out = sampler(dict(dd))
    b = out["gt_boxes2d"][1]
    calib = dd["calib"]
    uv, _ = calib.lidar_to_img(victim[:, :3])
    inside = (b[0] <= uv[0, 0] <= b[2]) and (b[1] <= uv[0, 1] <= b[3])
    if inside:  # geometric setup holds -> the point must be gone
        d = np.abs(out["points"][:, :3] - victim[0, :3]).sum(1)
        assert d.min() > 1e-3


def test_2d_iou_prefilter_drops_overlapping_sample():
    """A sampled box whose 2D projection overlaps the existing gt above
    threshold is rejected (sample_gt_boxes_2d_kitti role)."""
    rng = np.random.RandomState(2)
    sampler, dd, _ = _scene_with_sampler(rng)
    # 3D-disjoint but 2D-overlapping (behind the gt along the view ray):
    # the 20 m box projects inside the 10 m gt's bbox with 2D IoU ~0.20
    sampler.img_aug_iou_thresh = 0.15
    info = sampler.db_infos["Car"][0]
    info["box3d_lidar"] = np.array([20.0, 0.1, 0.0, 4.0, 2.0, 1.6, 0.0],
                                   np.float32)
    info["points"] = info["points"].copy()
    info["points"][:, :3] = (info["points"][:, :3]
                             - [15.0, 5.0, 0.0] + info["box3d_lidar"][:3])
    cam = boxes3d_lidar_to_kitti_camera(
        info["box3d_lidar"][None], dd["calib"])
    info["bbox"] = boxes3d_kitti_camera_to_imageboxes(
        cam, dd["calib"], (300, 400))[0]
    out = sampler(dict(dd))
    # the behind-the-gt sample projects onto the gt box -> rejected
    assert out["gt_boxes"].shape[0] == 1
