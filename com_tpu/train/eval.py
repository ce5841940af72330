"""Evaluation loop (tools/eval_utils/eval_utils.py:12-136 role).

Jitted batched inference -> fixed-shape decode+NMS on device -> host-side
trim to valid detections -> dataset.evaluation adapter.  Recall instrumentation
against GT (detector3d_template.py:286-328 role) built from the same rotated
IoU op used everywhere else.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dense_heads.center_head import decode_center_boxes, post_process_nms
from ..ops.iou import boxes_iou3d


def make_eval_step(net, model_cfg, class_names, meta):
    if "ROI_HEAD" in model_cfg and model_cfg["ROI_HEAD"].get("NAME") not in (
            None,):
        return _make_two_stage_eval_step(net, model_cfg, class_names, meta)
    head_cfg = model_cfg["DENSE_HEAD"]
    if "ANCHOR_GENERATOR_CONFIG" in head_cfg:
        return _make_anchor_eval_step(net, model_cfg, class_names, meta)
    post = head_cfg["POST_PROCESSING"]
    stride = int(head_cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 1))

    def head_groups():
        from .step import _head_groups

        return _head_groups(model_cfg, class_names)

    def eval_step(variables, batch):
        out = net.apply(variables, dict(batch), train=False)
        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for pred_dict, class_ids in zip(out["pred_dicts"], head_groups()):
            boxes, scores, labels, valid = decode_center_boxes(
                pred_dict,
                class_ids,
                meta.point_cloud_range,
                meta.voxel_size,
                stride,
                k=int(post.get("MAX_OBJ_PER_SAMPLE", 500)),
                score_thresh=float(post.get("SCORE_THRESH", 0.1)),
                post_center_limit_range=post.get("POST_CENTER_LIMIT_RANGE"),
                head_order=tuple(head_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"]),
            )
            boxes, scores, labels, valid = post_process_nms(
                boxes, scores, labels, valid, post["NMS_CONFIG"],
                int(post["NMS_CONFIG"].get("NMS_POST_MAXSIZE", 500)),
            )
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_labels.append(labels)
            all_valid.append(valid)
        return (
            jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_labels, axis=1),
            jnp.concatenate(all_valid, axis=1),
        )

    return eval_step


def _make_two_stage_eval_step(net, model_cfg, class_names, meta):
    """Two-stage inference (detector3d_template post_processing role): the
    refined RCNN boxes — not the first-stage proposals — are what gets
    NMS'd and reported.  Heads that already decode (SECONDHead IoU, MPPNet)
    set batch_box_preds/batch_cls_preds; grid/point-pool heads emit raw
    rcnn_cls/rcnn_reg which decode against the RoIs via the inverse
    canonical transform."""
    from ..models.roi_heads.roi_targets import decode_rcnn_boxes
    from ..ops.nms import nms_bev

    post = model_cfg.get("POST_PROCESSING", {})
    nms_cfg = dict(post.get("NMS_CONFIG", {"NMS_THRESH": 0.7}))
    nms_cfg.update(nms_cfg.get("TEST", {}))
    score_thresh = float(post.get("SCORE_THRESH", 0.1))
    post_max = int(nms_cfg.get("NMS_POST_MAXSIZE", 500))
    # IoU-head score fusion (second_net_iou.py post_processing:108-147):
    # rank by the IoU prediction, the first-stage cls score, a fixed blend,
    # or a per-box point-count blend.  Reference default: 'iou'.
    score_type = str(nms_cfg.get("SCORE_TYPE", "iou"))

    def _fused_scores(out, batch, iou_scores, labels):
        if score_type == "iou" or "roi_scores" not in out:
            return iou_scores
        cls_scores = out["roi_scores"]  # normalized by the proposal decode
        if score_type == "cls":
            return cls_scores
        if score_type == "weighted_iou_cls":
            w = nms_cfg.get("SCORE_WEIGHTS", {})
            return (float(w.get("iou", 0.5)) * iou_scores
                    + float(w.get("cls", 0.5)) * cls_scores)
        if score_type == "num_pts_iou_cls":
            # alpha-blend by points-in-box (cal_scores_by_npoints:38-57)
            from ..ops.boxes import points_in_rbbox

            th = nms_cfg.get("SCORE_THRESH", {})
            cls_th = float(th.get("cls", 10.0))
            iou_th = float(th.get("iou", 100.0))
            pts, msk = batch["points"][..., :3], batch["points_mask"]

            def count(p, m, bx):
                inb = points_in_rbbox(p, bx[:, :7], xp=jnp)  # (N, K)
                return (inb & m[:, None]).sum(axis=0).astype(iou_scores.dtype)

            npts = jax.vmap(count)(pts, msk, out["batch_box_preds"])
            alpha = jnp.clip((npts - cls_th) / (iou_th - cls_th), 0.0, 1.0)
            return (1 - alpha) * cls_scores + alpha * iou_scores
        if score_type == "score_by_class":
            by_class = dict(nms_cfg.get("SCORE_BY_CLASS", {}))
            use_iou = jnp.zeros(labels.shape, bool)
            for i, name in enumerate(class_names):
                if str(by_class.get(name, "iou")) == "iou":
                    use_iou = use_iou | (labels == i + 1)
            return jnp.where(use_iou, iou_scores, cls_scores)
        raise NotImplementedError(f"SCORE_TYPE {score_type}")

    def eval_step(variables, batch):
        out = net.apply(variables, dict(batch), train=False)
        cls_labels = None
        if "batch_box_preds" in out:
            boxes = out["batch_box_preds"][..., :7]
            cls = out["batch_cls_preds"]
            # max over the class dim like the reference post_processing
            # (detector3d_template.py); shipped two-stage heads are
            # single-channel, where max == channel 0
            if cls.ndim == 3:
                scores = cls.max(axis=-1)
                if cls.shape[-1] > 1:
                    cls_labels = cls.argmax(axis=-1) + 1
            else:
                scores = cls
            if not out.get("cls_preds_normalized", False):
                scores = jax.nn.sigmoid(scores)
        else:
            boxes = decode_rcnn_boxes(out["rois"][..., :7], out["rcnn_reg"])
            scores = jax.nn.sigmoid(out["rcnn_cls"])
        labels = out.get("roi_labels_sampled", out.get("roi_labels"))
        if labels is None:
            labels = cls_labels if cls_labels is not None else jnp.ones(
                scores.shape, jnp.int32)
        labels = labels.astype(jnp.int32)
        scores = _fused_scores(out, batch, scores, labels)
        # padded / NMS-suppressed roi slots must never surface as
        # detections, however confident the rcnn head is about them
        roi_valid = out.get("roi_valid")
        if roi_valid is None:
            roi_valid = jnp.ones(scores.shape, bool)

        def one(bx, sc, lb, rv):
            valid = (sc > score_thresh) & rv
            sel, sel_valid = nms_bev(
                bx, sc, valid, float(nms_cfg.get("NMS_THRESH", 0.7)),
                min(post_max, bx.shape[0]))
            return bx[sel], sc[sel], lb[sel], sel_valid

        return jax.vmap(one)(boxes, scores, labels, roi_valid)

    return eval_step


def _make_anchor_eval_step(net, model_cfg, class_names, meta):
    """Anchor-path inference: decode all anchors, score-filter, rotated NMS
    (anchor_head_template.generate_predicted_boxes + model post_processing)."""
    from ..models.dense_heads.anchor_head import (
        anchor_post_process,
        build_anchors,
        decode_anchor_boxes,
    )
    from ..ops.boxes import ResidualCoder

    head_cfg = model_cfg["DENSE_HEAD"]
    post = model_cfg.get("POST_PROCESSING", {})
    nms_cfg = post.get("NMS_CONFIG", {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                                      "NMS_PRE_MAXSIZE": 4096, "NMS_POST_MAXSIZE": 500})
    score_thresh = float(post.get("SCORE_THRESH", 0.1))
    anchors_flat, _, _, _, class_ids = build_anchors(
        head_cfg, list(class_names), meta.grid_size, meta.point_cloud_range
    )
    # honor the config's coder exactly as the training loss does
    # (step.py BOX_CODER_CONFIG): code_size 9 / sincos heads emit wider
    # box preds that a default 7-dim coder would mis-decode
    coder_cfg = head_cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
        "BOX_CODER_CONFIG", {})
    coder = ResidualCoder(
        code_size=int(coder_cfg.get("code_size", 7)),
        encode_angle_by_sincos=bool(
            coder_cfg.get("encode_angle_by_sincos", False)),
    )

    def eval_step(variables, batch):
        out = net.apply(variables, dict(batch), train=False)
        boxes, scores, labels = decode_anchor_boxes(
            out, jnp.asarray(anchors_flat), None, len(class_names), coder,
            dir_cfg=head_cfg if head_cfg.get("USE_DIRECTION_CLASSIFIER") else None,
        )
        return anchor_post_process(boxes, scores, labels, nms_cfg, score_thresh,
                                   num_classes=len(class_names))

    return eval_step


def recall_stats(pred_boxes, gt_boxes, thresh_list=(0.3, 0.5, 0.7)):
    """Per-frame recall counts vs GT (rotated 3D IoU)."""
    gt = gt_boxes[gt_boxes[:, -1] > 0]
    out = {f"recall_{t}": 0 for t in thresh_list}
    out["gt"] = len(gt)
    if len(gt) == 0 or len(pred_boxes) == 0:
        return out
    iou = boxes_iou3d(pred_boxes[:, :7], gt[:, :7])
    best = iou.max(axis=0)
    for t in thresh_list:
        out[f"recall_{t}"] = int((best > t).sum())
    return out


def eval_model(eval_step, variables, loader, class_names, logger=None,
               recall_thresh_list=(0.3, 0.5, 0.7), batch_keys=None,
               mesh=None):
    """Run inference over the loader; with ``mesh``, scenes shard over the
    data axis so eval runs data-parallel like training (the reference evals
    DDP-sharded too, eval_utils.py).  Batches not divisible by the mesh run
    unsharded (the trailing partial batch)."""
    eval_step = jax.jit(eval_step)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicate_state

        variables = replicate_state(variables, mesh)
        n_mesh = int(mesh.shape["data"])
    det_annos = []
    recalls = {f"recall_{t}": 0 for t in recall_thresh_list}
    recalls["gt"] = 0
    t0 = time.time()
    n_frames = 0
    for batch in loader:
        host = {k: v for k, v in batch.items()
                if isinstance(v, np.ndarray)
                and (batch_keys is None or k in batch_keys or k == "gt_boxes")}
        if mesh is not None and len(batch["points"]) % n_mesh == 0:
            sh = batch_sharding(mesh)
            host = {k: jax.device_put(v, sh) for k, v in host.items()}
        boxes, scores, labels, valid = jax.device_get(eval_step(variables, host))
        bs = boxes.shape[0]
        n_frames += bs
        for i in range(bs):
            v = valid[i]
            order = np.argsort(-scores[i][v])
            frame_boxes = boxes[i][v][order]
            frame_scores = scores[i][v][order]
            frame_labels = labels[i][v][order]
            frame_id = batch.get("frame_id", [None] * bs)[i]
            anno = {
                "frame_id": frame_id,
                "boxes_lidar": frame_boxes,
                "score": frame_scores,
                "pred_labels": frame_labels,
                "name": np.array([class_names[int(l) - 1] for l in frame_labels]),
            }
            # sample-token metadata (lyft/nuscenes match gt by token)
            md = batch.get("metadata")
            if md is not None and md[i] is not None:
                anno["metadata"] = md[i]
            det_annos.append(anno)
            if "gt_boxes" in batch:
                r = recall_stats(frame_boxes, batch["gt_boxes"][i], recall_thresh_list)
                for k in recalls:
                    recalls[k] += r[k]
    sec_per_example = (time.time() - t0) / max(n_frames, 1)
    if logger:
        gt = max(recalls["gt"], 1)
        logger.info(
            "eval: %d frames, %.4f s/frame, " % (n_frames, sec_per_example)
            + " ".join(f"{k}={recalls[k] / gt:.3f}" for k in recalls if k != "gt")
        )
    return det_annos, recalls, sec_per_example
