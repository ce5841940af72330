"""CenterPoint-voxel (sparse backbone + curriculum center head at stride 8)."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.train.optim import build_optimizer
from com_tpu.train.state import TrainState
from com_tpu.train.step import make_train_step
from com_tpu.utils.config import CfgNode
from tests.test_second_voxel_path import make_voxel_batch

CLASS_NAMES = ["Vehicle", "Pedestrian"]


def test_centerpoint_voxel_train_step():
    rng = np.random.RandomState(0)
    batch, pc_range, vsize = make_voxel_batch(rng)
    batch = dict(batch)
    batch["true_object"] = jnp.asarray(
        (np.asarray(batch["gt_boxes"])[..., 7] > 0).astype(np.float32))
    batch["occupancy_ratio"] = jnp.asarray(
        rng.rand(*np.asarray(batch["gt_boxes"]).shape[:2]).astype(np.float32))
    batch["facade_type"] = jnp.asarray(
        rng.randint(0, 4, np.asarray(batch["gt_boxes"]).shape[:2]).astype(np.float32))

    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    cfg = CfgNode({
        "NAME": "CenterPoint",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x", "CHANNELS": [8, 16, 16, 32],
                        "OUT_CHANNELS": 16,
                        "VOXEL_CAPS": [2048, 1024, 512, 256]},
        "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1], "LAYER_STRIDES": [1],
                        "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1],
                        "NUM_UPSAMPLE_FILTERS": [32]},
        "DENSE_HEAD": {"NAME": "CurriculumCenterHead",
                       "CLASS_NAMES_EACH_HEAD": [CLASS_NAMES],
                       "SHARED_CONV_CHANNEL": 32, "USE_BIAS_BEFORE_NORM": True,
                       "NUM_HM_CONV": 2,
                       "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 8,
                                                  "NUM_MAX_OBJS": 8,
                                                  "GAUSSIAN_OVERLAP": 0.1,
                                                  "MIN_RADIUS": 1, "MIN_POINTS": 0},
                       "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                                        "loc_weight": 2.0,
                                                        "code_weights": [1.0] * 8}},
                       "LOSS_CURRICULUM": {"UCL": True, "THRESHOLD": 0.2,
                                           "ELONGATION": -10, "HEIGHT": 1,
                                           "FIX": True},
                       "SEPARATE_HEAD_CFG": {"HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                         "HEAD_DICT": {"center": {"out_channels": 2, "num_conv": 2},
                                       "center_z": {"out_channels": 1, "num_conv": 2},
                                       "dim": {"out_channels": 3, "num_conv": 2},
                                       "rot": {"out_channels": 2, "num_conv": 2}}}},
    })
    net = build_network(cfg, meta)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = net.apply(variables, dict(batch), train=False)
    # stride-8 head over a 64x64 grid -> 8x8 heatmap
    assert out["pred_dicts"][0]["hm"].shape == (2, 8, 8, 2)

    tx, _ = build_optimizer(variables["params"],
                            CfgNode({"OPTIMIZER": "adam_onecycle", "LR": 1e-3,
                                     "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10.0}),
                            100, 10)
    state = TrainState.create(variables, tx, num_head_groups=1)
    # deliberately pass the WRONG fmap_hw: the loss must use the pred's shape
    step = jax.jit(make_train_step(net, cfg, CLASS_NAMES, meta, tx, (64, 64)))
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, 0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
    assert float(state.curriculum[0].avg_confidence) > 0
