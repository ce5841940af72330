"""PointRCNN family: PointNet2MSG backbone shapes, PointHeadBox targets/loss,
full PointRCNN train step on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.models.pointnet2_backbone import PointNet2MSG
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]


def small_backbone_cfg():
    return {
        "SA_CONFIG": {
            "NPOINTS": [256, 64],
            "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
            "NSAMPLE": [[8, 8], [8, 8]],
            "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
        },
        "FP_MLPS": [[16, 16], [16, 16]],
    }


def test_pointnet2_msg_shapes():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-10, 10, (2, 1024, 5)).astype(np.float32)
    mask = rng.rand(2, 1024) < 0.9
    net = PointNet2MSG(model_cfg=small_backbone_cfg(), input_channels=5)
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask)}
    v = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = jax.jit(lambda v, b: net.apply(v, dict(b), train=False))(v, batch)
    assert out["point_features"].shape == (2, 1024, 16)
    assert out["point_coords"].shape == (2, 1024, 3)
    assert np.isfinite(np.asarray(out["point_features"])).all()


def pointrcnn_cfg():
    return CfgNode({
        "NAME": "PointRCNN",
        "BACKBONE_3D": {"NAME": "PointNet2MSG", **small_backbone_cfg()},
        "POINT_HEAD": {
            "NAME": "PointHeadBox", "CLS_FC": [32], "REG_FC": [32],
            "TARGET_CONFIG": {
                "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                "BOX_CODER": "PointResidualCoder",
                "BOX_CODER_CONFIG": {
                    "use_mean_size": True,
                    "mean_size": [[4.7, 2.1, 1.7], [0.91, 0.86, 1.73],
                                  [1.78, 0.84, 1.78]],
                },
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0,
                                             "point_box_weight": 1.0}},
        },
        "ROI_HEAD": {
            "NAME": "PointRCNNHead",
            "ROI_POINT_POOL": {"POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                               "NUM_SAMPLED_POINTS": 64,
                               "DEPTH_NORMALIZER": 70.0},
            "XYZ_UP_LAYER": [16, 16],
            "CLS_FC": [16], "REG_FC": [16], "USE_BN": True,
            "SA_CONFIG": {"NPOINTS": [32, -1], "RADIUS": [0.4, 100],
                          "NSAMPLE": [8, 8], "MLPS": [[16, 16], [16, 32]]},
            "NMS_CONFIG": {"TRAIN": {"NMS_PRE_MAXSIZE": 128,
                                     "NMS_POST_MAXSIZE": 16,
                                     "NMS_THRESH": 0.8},
                           "TEST": {"NMS_PRE_MAXSIZE": 128,
                                    "NMS_POST_MAXSIZE": 16,
                                    "NMS_THRESH": 0.85}},
            "TARGET_CONFIG": {"ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
                              "REG_FG_THRESH": 0.55, "CLS_FG_THRESH": 0.6,
                              "CLS_BG_THRESH": 0.45},
            "LOSS_CONFIG": {"CORNER_LOSS_REGULARIZATION": True,
                            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                             "rcnn_reg_weight": 1.0,
                                             "rcnn_corner_weight": 1.0,
                                             "code_weights": [1.0] * 7}},
        },
    })


def test_pointrcnn_train_step_and_loss_decreases():
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    rng = np.random.RandomState(1)
    b, n = 1, 1024
    gt = np.zeros((b, 4, 8), np.float32)
    gt[0, 0] = [3, 2, 0, 4.2, 1.9, 1.6, 0.2, 1]
    gt[0, 1] = [-5, -4, 0, 0.9, 0.8, 1.7, 1.0, 2]
    pts_list = []
    for box in (gt[0, 0], gt[0, 1]):
        c = rng.randn(200, 3).astype(np.float32) * 0.25 + box[None, :3]
        pts_list.append(np.concatenate([c, rng.rand(200, 2).astype(np.float32)], 1))
    noise = np.concatenate([rng.uniform(-10, 10, (n - 400, 2)),
                            rng.uniform(-1, 2, (n - 400, 1)),
                            rng.rand(n - 400, 2)], 1).astype(np.float32)
    pts = np.concatenate(pts_list + [noise])[None]
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }
    meta = DatasetMeta(CLASS_NAMES, [-10, -10, -2, 10, 10, 4], [0.1, 0.1, 6],
                       (200, 200, 1), 5)
    cfg = pointrcnn_cfg()
    net = build_network(cfg, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(
        variables["params"],
        CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                 "WEIGHT_DECAY": 0.01, "MOMS": [0.95, 0.85],
                 "PCT_START": 0.4, "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10}),
        total_steps=200, steps_per_epoch=20)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (200, 200)))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, 0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert "point_loss_box" in metrics and "rcnn_loss_cls" in metrics
    assert losses[-1] < losses[0]
