"""KITTI AP evaluator sanity: perfect detections -> 100, garbage -> ~0."""
import numpy as np

from com_tpu.data.kitti.kitti_eval import eval_class, kitti_evaluation


def make_annos(rng, n_frames=10, n_gt=8, perfect=True):
    gts, dets = [], []
    for _ in range(n_frames):
        boxes = np.concatenate(
            [rng.uniform(-30, 30, (n_gt, 2)), rng.uniform(-1, 1, (n_gt, 1)),
             np.tile([[4.2, 1.8, 1.6]], (n_gt, 1)), rng.uniform(-np.pi, np.pi, (n_gt, 1))],
            axis=1).astype(np.float32)
        gt = {
            "name": np.array(["Car"] * n_gt),
            "truncated": np.zeros(n_gt),
            "occluded": np.zeros(n_gt),
            "bbox_height": np.full(n_gt, 50.0),
            "gt_boxes_lidar": boxes,
        }
        if perfect:
            det_boxes = boxes.copy()
            scores = rng.uniform(0.5, 1.0, n_gt).astype(np.float32)
        else:
            det_boxes = boxes + 50.0  # nowhere near
            scores = rng.uniform(0.5, 1.0, n_gt).astype(np.float32)
        det = {
            "name": np.array(["Car"] * n_gt),
            "boxes_lidar": det_boxes,
            "score": scores,
        }
        gts.append(gt)
        dets.append(det)
    return gts, dets


def test_perfect_detections_near_ap100():
    rng = np.random.RandomState(0)
    gts, dets = make_annos(rng, perfect=True)
    for metric in ("bev", "3d"):
        ap = eval_class(gts, dets, "Car", 1, metric)
        # official R40 leaves unreached recall sample points at 0 when the
        # GT count is small (get_thresholds emits < 41 thresholds), so even
        # perfect detections land slightly below 100 — reference behavior
        assert ap > 90.0, (metric, ap)


def test_garbage_detections_ap0():
    rng = np.random.RandomState(1)
    gts, dets = make_annos(rng, perfect=False)
    ap = eval_class(gts, dets, "Car", 1, "bev")
    assert ap < 1.0


def test_half_detections_mid_ap():
    rng = np.random.RandomState(2)
    gts, dets = make_annos(rng, perfect=True)
    # drop half the detections per frame -> recall capped at ~0.5
    for d in dets:
        keep = slice(0, len(d["score"]) // 2)
        for k in ("name", "boxes_lidar", "score"):
            d[k] = d[k][keep]
    ap = eval_class(gts, dets, "Car", 1, "bev")
    assert 30.0 < ap < 70.0, ap


def test_difficulty_gating_excludes_occluded():
    rng = np.random.RandomState(3)
    gts, dets = make_annos(rng, perfect=True)
    for g in gts:
        g["occluded"][:] = 2  # too occluded for easy (max occ 0)
    ap_easy = eval_class(gts, dets, "Car", 0, "bev")
    ap_hard = eval_class(gts, dets, "Car", 2, "bev")
    assert ap_easy == 0.0  # no valid gt at easy
    assert ap_hard > 97.0


def test_full_report():
    rng = np.random.RandomState(4)
    gts, dets = make_annos(rng, perfect=True)
    s, d = kitti_evaluation(dets, gts, ["Car"])
    assert "Car AP_bev" in s and "Car_3d" in d
