"""TF-free Waymo AP/APH evaluator: hand-computable scenes + invariants.

Each expected value below is derived by hand from the documented semantics
(waymo_ap.py): Hungarian matching at per-type IoU thresholds, 101 score
cutoffs, LEVEL re-assignment from num_points_in_gt, APH heading weighting
on both P/R numerators, envelope-integral AP.
"""
import numpy as np
import pytest

from com_tpu.data.waymo.waymo_ap import (
    _ap_from_pr,
    _heading_accuracy,
    compute_waymo_ap,
)


def _info(boxes, names, num_pts):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    return {
        "annos": {
            "gt_boxes_lidar": boxes,
            "name": np.asarray(names),
            "difficulty": np.zeros(len(boxes), np.int64),
            "num_points_in_gt": np.asarray(num_pts, np.int64),
        }
    }


def _det(boxes, names, scores):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    return {
        "boxes_lidar": boxes,
        "name": np.asarray(names),
        "score": np.asarray(scores, np.float64),
    }


BOX = [0.0, 0.0, 1.0, 4.0, 2.0, 1.8, 0.0]
FAR = [20.0, 5.0, 1.0, 4.0, 2.0, 1.8, 0.0]


@pytest.mark.quick
def test_perfect_single_detection():
    infos = [_info([BOX], ["Vehicle"], [20])]
    dets = [_det([BOX], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(1.0)


def test_heading_error_weights_aph_both_axes():
    # heading off by pi/2 -> accuracy 0.5; APH = 0.5 (precision) * 0.5
    # (recall) integrated = 0.25, AP unaffected
    pred = list(BOX)
    pred[6] = np.pi / 2
    infos = [_info([BOX], ["Vehicle"], [20])]
    dets = [_det([pred], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    # the rotated pred still overlaps the gt >= 0.7? No: 4x2 box rotated 90deg
    # has IoU (2x2)/(4+4-4... compute: intersection 2x2=4, union 8+8-4=12 ->
    # 0.333 < 0.7, so it would NOT match. Use a square box instead.
    sq = [0.0, 0.0, 1.0, 3.0, 3.0, 1.8, 0.0]
    sq_rot = [0.0, 0.0, 1.0, 3.0, 3.0, 1.8, np.pi / 2]
    infos = [_info([sq], ["Vehicle"], [20])]
    dets = [_det([sq_rot], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(0.25)


def test_low_score_fp_does_not_hurt_ap():
    # TP at 0.8, FP at 0.3: cutoffs in (0.3, 0.8] reach recall 1 at
    # precision 1 -> envelope AP = 1.0
    infos = [_info([BOX], ["Vehicle"], [20])]
    dets = [_det([BOX, FAR], ["Vehicle", "Vehicle"], [0.8, 0.3])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)


def test_high_score_fp_halves_ap():
    # FP outranks the TP: max recall 1 only at precision 0.5
    infos = [_info([BOX], ["Vehicle"], [20])]
    dets = [_det([FAR, BOX], ["Vehicle", "Vehicle"], [0.8, 0.3])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5)


def test_few_point_gt_reassigned_to_level2():
    # 3 points -> LEVEL_2; its detection is ignored for L1 (no FP) and a
    # TP for L2
    infos = [_info([BOX], ["Vehicle"], [3])]
    dets = [_det([BOX], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(0.0)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)


def test_zero_point_gt_dropped():
    infos = [_info([BOX, FAR], ["Vehicle", "Vehicle"], [20, 0])]
    dets = [_det([BOX], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    # the zero-point gt is not a FN
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)


def test_l2_gt_ignored_for_l1_not_fp():
    # one L1 gt + one L2 gt, both detected: L1 sees tp=1, fp=0 -> AP 1.0
    infos = [_info([BOX, FAR], ["Vehicle", "Vehicle"], [20, 3])]
    dets = [_det([BOX, FAR], ["Vehicle", "Vehicle"], [0.9, 0.8])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)


def test_missed_gt_halves_recall():
    infos = [_info([BOX, FAR], ["Vehicle", "Vehicle"], [20, 20])]
    dets = [_det([BOX], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5)


def test_hungarian_finds_optimal_assignment():
    # two gts; pred A overlaps gt1 strongly and gt2 weakly, pred B overlaps
    # gt1 moderately only.  Greedy by score (B first) would take gt1 and
    # strand A on gt2 (below threshold); Hungarian assigns A->gt1, B->...
    g1 = [0.0, 0.0, 1.0, 4.0, 2.0, 1.8, 0.0]
    a = [0.0, 0.1, 1.0, 4.0, 2.0, 1.8, 0.0]       # IoU(g1) high
    b = [0.0, 0.9, 1.0, 4.0, 2.0, 1.8, 0.0]       # IoU(g1) ~0.38 < 0.7
    infos = [_info([g1], ["Vehicle"], [20])]
    dets = [_det([b, a], ["Vehicle", "Vehicle"], [0.9, 0.8])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    # optimal matching pairs a<->g1 (b becomes FP above a's score)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5)


def test_class_confusion_not_matched():
    infos = [_info([BOX], ["Vehicle"], [20])]
    dets = [_det([BOX], ["Pedestrian"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle", "Pedestrian"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.0)
    # the ped pred is a pure FP in a class with no gt -> AP 0
    assert r["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP"] == pytest.approx(0.0)


def test_pedestrian_threshold_is_half():
    # IoU ~0.55 box: match for Pedestrian (0.5) but not Vehicle (0.7)
    g = [0.0, 0.0, 1.0, 1.0, 1.0, 1.8, 0.0]
    p = [0.27, 0.0, 1.0, 1.0, 1.0, 1.8, 0.0]  # 1d IoU = .73/1.27 ~ 0.575
    infos = [_info([g], ["Pedestrian"], [20])]
    dets = [_det([p], ["Pedestrian"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Pedestrian"])
    assert r["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP"] == pytest.approx(1.0)

    infos = [_info([g], ["Vehicle"], [20])]
    dets = [_det([p], ["Vehicle"], [0.9])]
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.0)


def test_ap_from_pr_envelope_integral():
    # hand case: recalls [1.0, 0.5, 0.0], precisions [0.4, 0.8, 0.9]
    # envelope over decreasing recall: [0.4, 0.8, 0.9]
    # AP = (1.0-0.5)*0.4 + (0.5-0.0)*0.8 + 0*0.9 = 0.6
    p = np.array([0.4, 0.8, 0.9])
    r = np.array([1.0, 0.5, 0.0])
    assert _ap_from_pr(p, r) == pytest.approx(0.6)


def test_heading_accuracy_wraps():
    assert _heading_accuracy(np.array([0.0]))[0] == pytest.approx(1.0)
    assert _heading_accuracy(np.array([np.pi]))[0] == pytest.approx(0.0)
    assert _heading_accuracy(np.array([2 * np.pi]))[0] == pytest.approx(1.0)
    assert _heading_accuracy(np.array([-np.pi / 2]))[0] == pytest.approx(0.5)


def test_multi_frame_aggregation_and_recall_oracle():
    """Across random frames, recall at cutoff 0 from the evaluator's curve
    must equal an independently counted matched fraction."""
    rng = np.random.RandomState(0)
    infos, dets = [], []
    n_gt_total, n_detectable = 0, 0
    for f in range(6):
        k = rng.randint(1, 5)
        gts = []
        preds, scores = [], []
        for i in range(k):
            c = rng.uniform(-40, 40, 2)
            box = [c[0], c[1], 1.0, 4.2, 2.0, 1.8, rng.uniform(-3, 3)]
            gts.append(box)
            n_gt_total += 1
            if rng.rand() < 0.7:  # detect most
                preds.append(box)
                scores.append(rng.uniform(0.3, 0.99))
                n_detectable += 1
        infos.append(_info(gts, ["Vehicle"] * k, [20] * k))
        dets.append(
            _det(
                preds if preds else np.zeros((0, 7)),
                ["Vehicle"] * len(preds),
                scores,
            )
        )
    _, r = compute_waymo_ap(dets, infos, ["Vehicle"])
    ap = r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"]
    # all preds are perfect copies: precision 1 everywhere, so AP == max
    # recall == detected fraction
    assert ap == pytest.approx(n_detectable / n_gt_total, abs=1e-6)
    assert r["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(ap)


def test_dataset_fallback_path():
    """WaymoDataset.evaluation produces AP/APH numbers in this image."""
    from com_tpu.data.waymo.waymo_dataset import WaymoDataset

    ds = WaymoDataset.__new__(WaymoDataset)
    ds.infos = [_info([BOX], ["Vehicle"], [20])]
    msg, result = WaymoDataset.evaluation(
        ds, [_det([BOX], ["Vehicle"], [0.9])], ["Vehicle"]
    )
    assert "APH" in msg
    assert result["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(1.0)


def test_missing_difficulty_defaults_to_zero():
    """Infos whose annos carry no per-object difficulty (a legal state —
    waymo_dataset.py defaults it to zeros) must evaluate, not crash on a
    None entry defeating the zeros default."""
    info = _info([BOX], ["Vehicle"], [20])
    del info["annos"]["difficulty"]
    dets = [_det([BOX], ["Vehicle"], [0.9])]
    _, d = compute_waymo_ap(dets, [info], ["Vehicle"])
    assert d["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
