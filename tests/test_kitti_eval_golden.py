"""Golden parity: our numpy KITTI eval vs the REFERENCE's official
kitti_object_eval_python/eval.py, executed directly from /root/reference with
numba stubbed to passthrough decorators (the logic under @numba.jit is pure
numpy) and the CUDA rotated-IoU kernel substituted with our oracle-tested
rotated IoU (tests/test_ops_iou_nms.py proves parity with the C++ clipper).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_EVAL = Path("/root/reference/pcdet/datasets/kitti/kitti_object_eval_python/eval.py")


def _fake_numba():
    mod = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    mod.jit = jit
    mod.njit = jit
    mod.prange = range
    return mod


def _rotate_iou_substitute(boxes, qboxes, criterion=-1):
    """rotate_iou_gpu_eval replacement: (N,5)/(K,5) [x, y, w, h, angle] ->
    rotated IoU (criterion=-1) or intersection area (criterion=2)."""
    from com_tpu.ops.iou import boxes_iou_bev, boxes_overlap_bev

    def to7(b):
        z = np.zeros((len(b), 1), np.float64)
        one = np.ones((len(b), 1), np.float64)
        # camera-frame ry is measured about the downward y axis (clockwise in
        # the x-z plane): negate to get a CCW planar heading so the IoU is
        # physically identical to the lidar-frame IoU
        return np.concatenate(
            [b[:, 0:1], b[:, 1:2], z, b[:, 2:3], b[:, 3:4], one, -b[:, 4:5]], 1
        ).astype(np.float32)

    a, b = to7(np.asarray(boxes)), to7(np.asarray(qboxes))
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    if criterion == -1:
        return boxes_iou_bev(a, b, xp=np).astype(np.float32)
    if criterion == 2:
        return boxes_overlap_bev(a, b, xp=np).astype(np.float32)
    raise NotImplementedError(criterion)


@pytest.fixture(scope="module")
def ref_eval():
    if not REF_EVAL.exists():
        pytest.skip("reference tree not available")
    src = REF_EVAL.read_text()
    src = src.replace("from .rotate_iou import rotate_iou_gpu_eval", "")
    saved = sys.modules.get("numba")
    sys.modules["numba"] = _fake_numba()
    mod = types.ModuleType("ref_kitti_eval")
    mod.__dict__["rotate_iou_gpu_eval"] = _rotate_iou_substitute
    try:
        exec(compile(src, str(REF_EVAL), "exec"), mod.__dict__)
    finally:
        if saved is not None:
            sys.modules["numba"] = saved
        else:
            sys.modules.pop("numba", None)
    return mod


def lidar_to_cam_annos(boxes_lidar, names, scores=None, rng=None):
    """lidar (x y z dx dy dz heading) -> kitti camera-frame anno dict."""
    n = len(boxes_lidar)
    loc = np.stack([-boxes_lidar[:, 1], -boxes_lidar[:, 2] + boxes_lidar[:, 5] / 2,
                    boxes_lidar[:, 0]], 1)
    dims = boxes_lidar[:, [3, 5, 4]]  # l, h, w
    ry = -boxes_lidar[:, 6] - np.pi / 2
    anno = {
        "name": np.asarray(names),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
        "alpha": ry.copy(),
        "bbox": np.tile([100.0, 100.0, 300.0, 300.0], (n, 1)),  # tall boxes
        "dimensions": dims.astype(np.float64),
        "location": loc.astype(np.float64),
        "rotation_y": ry.astype(np.float64),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float64)
    return anno


def make_scene(rng, n_gt=6, jitter=0.15, extra_fp=2):
    gt = np.zeros((n_gt, 7), np.float32)
    gt[:, 0] = rng.uniform(5, 60, n_gt)
    gt[:, 1] = rng.uniform(-20, 20, n_gt)
    gt[:, 2] = rng.uniform(-1.0, 0.0, n_gt)
    gt[:, 3:6] = np.asarray([4.0, 1.8, 1.6]) * rng.uniform(0.9, 1.1, (n_gt, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)

    dt = gt.copy()
    dt[:, :2] += rng.randn(n_gt, 2) * jitter
    dt[:, 6] += rng.randn(n_gt) * 0.05
    scores = rng.uniform(0.5, 1.0, n_gt)
    fps = np.zeros((extra_fp, 7), np.float32)
    fps[:, 0] = rng.uniform(5, 60, extra_fp)
    fps[:, 1] = rng.uniform(-20, 20, extra_fp)
    fps[:, 3:6] = [4.0, 1.8, 1.6]
    dt = np.concatenate([dt, fps])
    scores = np.concatenate([scores, rng.uniform(0.05, 0.3, extra_fp)])
    return gt, dt, scores


def test_kitti_eval_matches_reference(ref_eval):
    from com_tpu.data.kitti.kitti_eval import kitti_evaluation

    rng = np.random.RandomState(0)
    gt_ref, dt_ref, gt_ours, dt_ours = [], [], [], []
    for _ in range(8):
        gt, dt, scores = make_scene(rng)
        names_gt = ["Car"] * len(gt)
        names_dt = ["Car"] * len(dt)
        gt_ref.append(lidar_to_cam_annos(gt, names_gt))
        dt_ref.append(lidar_to_cam_annos(dt, names_dt, scores))
        gt_ours.append({
            "gt_boxes_lidar": gt, "name": np.asarray(names_gt),
            "occluded": np.zeros(len(gt)), "truncated": np.zeros(len(gt)),
            "bbox_height": np.full(len(gt), 200.0),
        })
        dt_ours.append({
            "boxes_lidar": dt, "name": np.asarray(names_dt),
            "score": scores,
        })

    result_str, ref_dict = ref_eval.get_official_eval_result(
        gt_ref, dt_ref, ["Car"])
    _, ours = kitti_evaluation(dt_ours, gt_ours, ["Car"])

    for di, dname in enumerate(["easy", "moderate", "hard"]):
        ref_bev = ref_dict[f"Car_bev/{dname}_R40"]
        ref_3d = ref_dict[f"Car_3d/{dname}_R40"]
        assert abs(ours["Car_bev"][di] - ref_bev) < 2.0, (
            dname, ours["Car_bev"][di], ref_bev)
        assert abs(ours["Car_3d"][di] - ref_3d) < 2.0, (
            dname, ours["Car_3d"][di], ref_3d)
    # sanity: a real signal, not two zeros agreeing
    assert ref_dict["Car_bev/moderate_R40"] > 50.0
