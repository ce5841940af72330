"""CaDDN camera path: depth binning, projection, frustum->voxel sampling,
full train step with the DDN loss."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.models.image_vfe import (
    bin_depths,
    ddn_loss,
    project_to_image,
    trilinear_sample,
)
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Car"]


def test_bin_depths_modes():
    d = jnp.asarray([2.0, 10.0, 45.0, 100.0, -1.0])
    for mode in ("UD", "LID", "SID"):
        t = bin_depths(d, mode, 2.0, 46.8, 80, target=True)
        t = np.asarray(t)
        assert t[0] == 0  # at depth_min -> first bin
        assert t[3] == 80 and t[4] == 80  # out of range -> extra class
        assert 0 < t[1] < t[2] <= 80


def test_project_to_image():
    proj = jnp.asarray([[100.0, 0, 50, 0], [0, 100.0, 30, 0], [0, 0, 1, 0]])
    pts = jnp.asarray([[0.0, 0, 10.0], [1.0, -0.5, 5.0]])
    uv, depth = project_to_image(pts, proj)
    np.testing.assert_allclose(np.asarray(depth), [10.0, 5.0])
    np.testing.assert_allclose(np.asarray(uv[0]), [50.0, 30.0])
    np.testing.assert_allclose(np.asarray(uv[1]), [70.0, 20.0])


def test_trilinear_sample_exact():
    vol = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4, 1)
    v = trilinear_sample(vol, jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v)[:, 0], [23.0, 0.0])
    # outside -> 0
    v = trilinear_sample(vol, jnp.asarray([[-3.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(v)[0, 0], 0.0)


def caddn_cfg():
    return CfgNode({
        "NAME": "CaDDN",
        "VFE": {
            "NAME": "ImageVFE",
            "DOWNSAMPLE_FACTOR": 4,
            "FFN": {
                "NAME": "DepthFFN",
                "DISCRETIZE": {"mode": "LID", "num_bins": 16,
                               "depth_min": 2.0, "depth_max": 30.0},
                "CHANNEL_REDUCE": {"out_channels": 16},
                "LOSS": {"NAME": "DDNLoss",
                         "ARGS": {"weight": 3.0, "alpha": 0.25, "gamma": 2.0,
                                  "fg_weight": 13, "bg_weight": 1}},
            },
            "F2V": {"NAME": "FrustumToVoxel",
                    "SAMPLER": {"mode": "bilinear", "padding_mode": "zeros"}},
        },
        "MAP_TO_BEV": {"NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 32},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1],
                        "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                        "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [
                {"class_name": "Car", "anchor_sizes": [[4.0, 1.8, 1.6]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [0],
                 "align_center": False, "feature_map_stride": 1,
                 "matched_threshold": 0.6, "unmatched_threshold": 0.45}],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                             "loc_weight": 2.0,
                                             "dir_weight": 0.2,
                                             "code_weights": [1.0] * 7}},
        },
    })


def make_batch(rng, b=1, h=64, w=96):
    images = rng.rand(b, h, w, 3).astype(np.float32)
    depth = rng.uniform(2.5, 28.0, (b, h, w)).astype(np.float32)
    # lidar +x forward -> camera +z forward
    l2c = np.zeros((b, 4, 4), np.float32)
    l2c[:, 0, 1] = -1.0  # x_cam = -y_l
    l2c[:, 1, 2] = -1.0  # y_cam = -z_l
    l2c[:, 2, 0] = 1.0   # z_cam = x_l
    l2c[:, 3, 3] = 1.0
    c2i = np.zeros((b, 3, 4), np.float32)
    c2i[:, 0, 0] = 60.0
    c2i[:, 1, 1] = 60.0
    c2i[:, 0, 2] = w / 2
    c2i[:, 1, 2] = h / 2
    c2i[:, 2, 2] = 1.0
    gt = np.zeros((b, 4, 8), np.float32)
    gt[:, 0] = [8.0, 0.5, -0.5, 4.0, 1.8, 1.6, 0.2, 1]
    boxes2d = np.zeros((b, 4, 4), np.float32)
    boxes2d[:, 0] = [30, 20, 60, 50]
    return {
        "images": jnp.asarray(images),
        "depth_maps": jnp.asarray(depth),
        "trans_lidar_to_cam": jnp.asarray(l2c),
        "trans_cam_to_img": jnp.asarray(c2i),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes2d": jnp.asarray(boxes2d),
    }


def test_caddn_forward_and_train_step():
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    meta = DatasetMeta(CLASS_NAMES, [2.0, -8.0, -2.0, 18.0, 8.0, 2.0],
                       [0.5, 0.5, 0.25], (32, 32, 16), 0)
    cfg = caddn_cfg()
    net = build_network(cfg, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    out = net.apply(variables, dict(batch), train=False)
    # (B, Z, Y, X, C) voxel volume feeds Conv2DCollapse
    assert out["encoded_spconv_tensor"].shape == (1, 16, 32, 32, 16)
    assert out["spatial_features"].shape[:3] == (1, 32, 32)
    assert np.isfinite(np.asarray(out["spatial_features"])).all()
    # depth loss on its own
    d = ddn_loss(out | {"depth_maps": batch["depth_maps"],
                        "gt_boxes2d": batch["gt_boxes2d"]}, cfg["VFE"])
    assert np.isfinite(float(d)) and float(d) > 0

    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 0.001,
                 "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10}),
        total_steps=100, steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (32, 32)))
    for i in range(3):
        state, metrics = step(state, batch, 0)
        assert np.isfinite(float(metrics["loss"]))
    assert "ddn_loss" in metrics and float(metrics["ddn_loss"]) > 0
