"""KITTI detection AP (R40) — pure numpy, vectorized (no numba).

Role of pcdet/datasets/kitti/kitti_object_eval_python/{eval,rotate_iou}.py:
official-style difficulty gating (height / occlusion / truncation), greedy
score-descending matching at class IoU thresholds, 40-point interpolated AP.
BEV and 3D metrics are computed in the lidar frame with the same rotated-IoU
op used across the framework (the reference evaluates in camera coords; the
matching and AP math are identical).
"""
from __future__ import annotations

import numpy as np

from ...ops.iou import boxes_iou3d, boxes_iou_bev

# official difficulty gates: min bbox height, max occlusion, max truncation
DIFFICULTY = {
    0: {"height": 40, "occlusion": 0, "truncation": 0.15},  # easy
    1: {"height": 25, "occlusion": 1, "truncation": 0.30},  # moderate
    2: {"height": 25, "occlusion": 2, "truncation": 0.50},  # hard
}
MIN_OVERLAP = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5,
               "Vehicle": 0.7, "Van": 0.7, "Truck": 0.7}
N_SAMPLE_PTS = 41


def _gt_valid_mask(gt, class_name, difficulty):
    gates = DIFFICULTY[difficulty]
    names = gt["name"]
    n = len(names)
    valid = np.zeros(n, bool)
    ignored = np.zeros(n, bool)
    same = np.char.lower(names.astype(str)) == class_name.lower()
    # neighboring-class ignores (official: Van for Car, Person_sitting for Ped)
    neighbor = {"car": ["van"], "pedestrian": ["person_sitting"]}.get(
        class_name.lower(), []
    )
    occ = gt.get("occluded", np.zeros(n))
    trunc = gt.get("truncated", np.zeros(n))
    hgt = gt.get("bbox_height", np.full(n, 50.0))
    too_hard = (occ > gates["occlusion"]) | (trunc > gates["truncation"]) | (
        hgt <= gates["height"]
    )
    valid = same & ~too_hard
    ignored = (same & too_hard) | np.isin(
        np.char.lower(names.astype(str)), neighbor
    )
    return valid, ignored


def _match_frame(gt_boxes, gt_valid, gt_ignored, det_boxes, det_scores,
                 min_overlap, metric):
    """Returns (tp_scores, fp_flags_per_det, n_valid_gt)."""
    if len(det_boxes) == 0:
        return np.zeros(0), np.zeros(0, bool), int(gt_valid.sum())
    if len(gt_boxes) == 0:
        return np.zeros(0), np.ones(len(det_boxes), bool), 0
    iou_fn = boxes_iou_bev if metric == "bev" else boxes_iou3d
    iou = iou_fn(det_boxes[:, :7], gt_boxes[:, :7], xp=np)
    order = np.argsort(-det_scores)
    assigned = np.zeros(len(gt_boxes), bool)
    tp_scores, fp = [], np.zeros(len(det_boxes), bool)
    for d in order:
        best, best_iou = -1, min_overlap
        for g in range(len(gt_boxes)):
            if assigned[g] or gt_ignored[g] or not gt_valid[g]:
                continue
            if iou[d, g] >= best_iou:
                best, best_iou = g, iou[d, g]
        if best >= 0:
            assigned[best] = True
            tp_scores.append(det_scores[d])
        else:
            # a det matching an ignored GT is neither tp nor fp
            ign = any(
                (gt_ignored[g] or not gt_valid[g]) and iou[d, g] >= min_overlap
                for g in range(len(gt_boxes))
            )
            fp[d] = not ign
    return np.asarray(tp_scores), fp, int(gt_valid.sum())


def eval_class(gt_annos, det_annos, class_name, difficulty, metric):
    """AP(R40) for one (class, difficulty, metric)."""
    min_overlap = MIN_OVERLAP.get(class_name, 0.5)
    all_tp_scores, all_fp_scores = [], []
    total_gt = 0
    per_frame = []
    for gt, det in zip(gt_annos, det_annos):
        gv, gi = _gt_valid_mask(gt, class_name, difficulty)
        det_mask = np.char.lower(det["name"].astype(str)) == class_name.lower()
        det_boxes = det["boxes_lidar"][det_mask]
        det_scores = det["score"][det_mask]
        per_frame.append((gt, gv, gi, det_boxes, det_scores))
        total_gt += int(gv.sum())
        tp_s, fp_flags, _ = _match_frame(
            gt["gt_boxes_lidar"], gv, gi, det_boxes, det_scores, min_overlap, metric
        )
        all_tp_scores.append(tp_s)
        all_fp_scores.append(det_scores[fp_flags])
    if total_gt == 0:
        return 0.0
    tp_scores = np.sort(np.concatenate(all_tp_scores))[::-1]
    fp_scores = np.sort(np.concatenate(all_fp_scores))[::-1]

    # 40-point interpolated AP over recall thresholds
    recalls = np.linspace(0, 1, N_SAMPLE_PTS)[1:]  # skip r=0 (R40)
    precisions = []
    for r in recalls:
        k = int(np.ceil(r * total_gt))
        if k == 0 or len(tp_scores) < k:
            precisions.append(0.0)
            continue
        thresh = tp_scores[k - 1]
        n_tp = k
        n_fp = int((fp_scores >= thresh).sum())
        precisions.append(n_tp / max(n_tp + n_fp, 1))
    precisions = np.asarray(precisions)
    # monotone precision envelope
    for i in range(len(precisions) - 2, -1, -1):
        precisions[i] = max(precisions[i], precisions[i + 1])
    return float(precisions.mean() * 100.0)


def kitti_evaluation(det_annos, gt_annos, class_names):
    """Returns (result_str, result_dict) — get_official_eval_result role."""
    result = {}
    lines = []
    for cls in class_names:
        for metric in ("bev", "3d"):
            aps = [eval_class(gt_annos, det_annos, cls, d, metric) for d in (0, 1, 2)]
            key = f"{cls}_{metric}"
            result[key] = aps
            lines.append(
                f"{cls} AP_{metric} R40 easy/mod/hard: "
                f"{aps[0]:.2f} / {aps[1]:.2f} / {aps[2]:.2f}"
            )
    return "\n".join(lines), result
