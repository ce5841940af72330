"""IoU-head eval score fusion (train/eval.py _fused_scores):
second_net_iou.py post_processing SCORE_TYPE parity — iou (default), cls,
weighted_iou_cls, num_pts_iou_cls alpha blend, score_by_class."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.train.eval import make_eval_step
from com_tpu.utils.config import CfgNode

from test_second_voxel_path import CLASS_NAMES, make_voxel_batch, second_cfg


def _iou_cfg(score_type=None, extra=None):
    nms = {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
           "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16}
    if score_type is not None:
        nms["SCORE_TYPE"] = score_type
    nms.update(extra or {})
    cfg = second_cfg()
    cfg["NAME"] = "SECONDNetIoU"
    cfg["ROI_HEAD"] = CfgNode({
        "NAME": "SECONDHead",
        "SHARED_FC": [32],
        "IOU_FC": [32],
        "ROI_GRID_POOL": {"GRID_SIZE": 4, "DOWNSAMPLE_RATIO": 8},
        "NMS_CONFIG": {"TEST": {"NMS_THRESH": 0.7, "NMS_PRE_MAXSIZE": 128,
                                "NMS_POST_MAXSIZE": 32}},
        "TARGET_CONFIG": {"ROI_PER_IMAGE": 16},
    })
    cfg["POST_PROCESSING"] = CfgNode(
        {"SCORE_THRESH": 0.0, "NMS_CONFIG": nms})
    return cfg


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    batch, pc_range, vsize = make_voxel_batch(rng)
    # raw points for the num_pts_iou_cls blend (eval ships the full batch)
    pts = np.concatenate(
        [rng.uniform(-15, 15, (2, 2048, 2)), rng.uniform(-1.4, 1.4, (2, 2048, 1)),
         rng.rand(2, 2048, 2)], axis=2).astype(np.float32)
    batch = dict(batch)
    batch["points"] = jnp.asarray(pts)
    batch["points_mask"] = jnp.ones((2, 2048), bool)
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 40), 5)
    cfg0 = _iou_cfg()
    net = build_network(cfg0, meta)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    return batch, meta, net, variables


@pytest.mark.parametrize("score_type,extra", [
    (None, None),                      # reference default: iou
    ("cls", None),
    ("weighted_iou_cls", {"SCORE_WEIGHTS": {"iou": 0.7, "cls": 0.3}}),
    ("num_pts_iou_cls", {"SCORE_THRESH": {"cls": 5, "iou": 50}}),
    ("score_by_class", {"SCORE_BY_CLASS": {"Vehicle": "cls",
                                           "Pedestrian": "iou"}}),
])
def test_fusion_modes_run_and_rank(setup, score_type, extra):
    batch, meta, net, variables = setup
    cfg = _iou_cfg(score_type, extra)
    step = make_eval_step(net, cfg, CLASS_NAMES, meta)
    boxes, scores, labels, valid = jax.jit(step)(variables, batch)
    assert np.isfinite(np.asarray(boxes)).all()
    s = np.asarray(scores)[np.asarray(valid)]
    assert np.isfinite(s).all() and (s >= 0).all() and (s <= 1.0 + 1e-6).all()


def test_cls_mode_uses_first_stage_scores(setup):
    """'cls' must rank by the proposal scores, not the IoU head."""
    batch, meta, net, variables = setup
    out_iou = jax.jit(make_eval_step(net, _iou_cfg(), CLASS_NAMES, meta))(
        variables, batch)
    out_cls = jax.jit(make_eval_step(net, _iou_cfg("cls"), CLASS_NAMES, meta))(
        variables, batch)
    si = np.asarray(out_iou[1])[np.asarray(out_iou[3])]
    sc = np.asarray(out_cls[1])[np.asarray(out_cls[3])]
    # a randomly initialized IoU head and the anchor scores are unrelated
    assert si.shape != sc.shape or not np.allclose(si, sc)
