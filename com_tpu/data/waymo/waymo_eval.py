"""Official Waymo AP/APH adapter (pcdet/datasets/waymo/waymo_eval.py:23-251 role).

Uses the waymo-open-dataset TF metrics library when installed (same host-side
evaluator the reference uses); raises ImportError otherwise so callers can
fall back (WaymoDataset.evaluation does).
"""
from __future__ import annotations

import numpy as np


def waymo_evaluation(det_annos, infos, class_names, distance_thresh=100.0):
    try:
        import tensorflow as tf  # noqa: F401
        from waymo_open_dataset.metrics.python import detection_metrics
        from waymo_open_dataset.protos import metrics_pb2
    except Exception as e:  # pragma: no cover - optional heavy dep
        raise ImportError(
            "waymo-open-dataset + tensorflow required for official AP/APH"
        ) from e

    # class name -> waymo type enum (1 vehicle, 2 pedestrian, 4 cyclist)
    type_of = {"Vehicle": 1, "Pedestrian": 2, "Sign": 3, "Cyclist": 4}

    def gather(annos, box_key, score_key=None):
        boxes, types, scores, frame_ids, difficulty = [], [], [], [], []
        for fi, a in enumerate(annos):
            b = a[box_key]
            boxes.append(b[:, :7])
            types.append([type_of.get(n, 0) for n in a["name"]])
            scores.append(a[score_key] if score_key else np.ones(len(b)))
            frame_ids.append(np.full(len(b), fi))
            difficulty.append(a.get("difficulty", np.zeros(len(b))))
        return (
            np.concatenate(boxes) if boxes else np.zeros((0, 7)),
            np.concatenate(types).astype(np.int64) if types else np.zeros(0, np.int64),
            np.concatenate(scores) if scores else np.zeros(0),
            np.concatenate(frame_ids).astype(np.int64) if frame_ids else np.zeros(0, np.int64),
            np.concatenate(difficulty).astype(np.int64) if difficulty else np.zeros(0, np.int64),
        )

    gt_annos = [
        {
            "boxes_lidar": info["annos"]["gt_boxes_lidar"],
            "name": info["annos"]["name"],
            "difficulty": info["annos"].get("difficulty"),
        }
        for info in infos
    ]
    pd_box, pd_type, pd_score, pd_frame, _ = gather(det_annos, "boxes_lidar", "score")
    gt_box, gt_type, _, gt_frame, gt_diff = gather(gt_annos, "boxes_lidar")

    import tensorflow as tf

    config = metrics_pb2.Config()
    config_text = """
    breakdown_generator_ids: OBJECT_TYPE
    difficulties { levels: 1 levels: 2 }
    matcher_type: TYPE_HUNGARIAN
    iou_thresholds: 0.0
    iou_thresholds: 0.7
    iou_thresholds: 0.5
    iou_thresholds: 0.5
    iou_thresholds: 0.5
    box_type: TYPE_3D
    """
    from google.protobuf import text_format

    text_format.Merge(config_text, config)
    for x in np.arange(0, 1.05, 0.05):
        config.score_cutoffs.append(float(x))

    metrics = detection_metrics.get_detection_metric_ops(
        config,
        prediction_frame_id=tf.constant(pd_frame),
        prediction_bbox=tf.constant(pd_box, tf.float32),
        prediction_type=tf.constant(pd_type, tf.uint8),
        prediction_score=tf.constant(pd_score, tf.float32),
        prediction_overlap_nlz=tf.zeros_like(tf.constant(pd_frame), tf.bool),
        ground_truth_frame_id=tf.constant(gt_frame),
        ground_truth_bbox=tf.constant(gt_box, tf.float32),
        ground_truth_type=tf.constant(gt_type, tf.uint8),
        ground_truth_difficulty=tf.constant(np.maximum(gt_diff, 1), tf.uint8),
    )
    result = {k: float(v[0].numpy()) for k, v in metrics.items()}
    lines = [f"{k}: {v:.4f}" for k, v in sorted(result.items()) if "AP" in k]
    return "\n".join(lines), result
