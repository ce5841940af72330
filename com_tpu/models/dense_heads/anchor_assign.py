"""Axis-aligned anchor target assignment — vectorized, jittable.

Rebuild of AxisAlignedTargetAssigner / CurriculumAxisAlignedTargetAssigner
(pcdet target_assigner/axis_aligned_target_assigner.py and
curri_axis_aligned_target_assigner.py:8-342): per class, max-IoU matching of
dense anchors to (padded) GT boxes with force-matching of each GT's best
anchor; positive anchors inherit the GT's box target (ResidualCoder) and — in
the curriculum variant — the GT's COM difficulty group id.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.boxes import ResidualCoder


class AnchorTargets(NamedTuple):
    box_cls_labels: jax.Array  # (B, A) int32: class id, 0 bg, -1 ignore
    box_reg_targets: jax.Array  # (B, A, code)
    reg_weights: jax.Array  # (B, A)
    groups: jax.Array  # (B, A) int32 COM group id of matched GT (0 none)


def nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned BEV IoU after snapping headings to the nearest axis —
    ONE implementation: delegates to ops.iou.boxes_iou_aligned_bev
    (box_utils.boxes3d_nearest_bev_iou parity, incl. the >= pi/4 swap
    boundary a local copy had flipped)."""
    from ...ops.iou import boxes_iou_aligned_bev

    return boxes_iou_aligned_bev(boxes_a, boxes_b, xp=jnp)


def assign_anchors_single_class(
    anchors,  # (A, 7)
    gt_boxes,  # (M, 7)
    gt_valid,  # (M,) bool — this class's (non-padded) boxes only
    gt_groups,  # (M,) int32
    matched_threshold: float,
    unmatched_threshold: float,
    box_coder: ResidualCoder,
    class_id: int,
):
    """One class's assignment.  Returns (labels, targets, groups) with
    labels: class_id pos / 0 neg / -1 ignore."""
    a = anchors.shape[0]
    iou = nearest_bev_iou(anchors, gt_boxes)  # (A, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    anchor_best = iou.max(axis=1)
    anchor_best_gt = iou.argmax(axis=1)
    gt_best = iou.max(axis=0)  # (M,)
    # force match: anchors achieving each GT's best IoU (> 0)
    force = (iou == jnp.where(gt_valid & (gt_best > 0), gt_best, jnp.inf)[None, :])
    force_any = force.any(axis=1)
    force_gt = force.argmax(axis=1)

    pos = (anchor_best >= matched_threshold) | force_any
    neg = anchor_best < unmatched_threshold
    labels = jnp.where(pos, class_id, jnp.where(neg, 0, -1)).astype(jnp.int32)

    assigned_gt = jnp.where(force_any, force_gt, anchor_best_gt)
    tgt_boxes = gt_boxes[assigned_gt]
    targets = box_coder.encode(tgt_boxes, anchors, xp=jnp)
    targets = targets * pos[:, None].astype(targets.dtype)
    groups = jnp.where(pos, gt_groups[assigned_gt], 0).astype(jnp.int32)
    return labels, targets, groups


def atss_assign_targets(
    anchors,  # (A, 7) flat anchors
    gt_boxes,  # (B, M, 8) class in last col, 0 pad
    topk: int,
    box_coder: ResidualCoder,
    match_height: bool = False,
):
    """ATSS assignment (target_assigner/atss_target_assigner.py:77-142,
    arXiv 1912.02424), vectorized with padded GT: per GT, the top-k
    closest anchors form candidates; the IoU threshold is their mean+std;
    positives must also have centers inside the GT's BEV rectangle; each
    anchor takes its best surviving GT, and every GT force-claims its
    max-IoU anchor.  Returns AnchorTargets."""
    from ...ops.iou import boxes_iou3d, boxes_iou_bev

    a = anchors.shape[0]
    iou_fn = boxes_iou3d if match_height else boxes_iou_bev
    neg_inf = -1e9

    def per_sample(gt):
        gt_valid = gt[:, -1] > 0
        m = gt.shape[0]
        iou = iou_fn(anchors, gt[:, :7], xp=jnp)  # (A, M)
        iou = jnp.where(gt_valid[None, :], iou, 0.0)

        dist = jnp.linalg.norm(
            anchors[:, None, 0:3] - gt[None, :, 0:3], axis=-1)
        dist = jnp.where(gt_valid[None, :], dist, jnp.inf)
        _, topk_idx = jax.lax.top_k(-dist.T, topk)  # (M, K) anchor ids
        cand_iou = jnp.take_along_axis(iou.T, topk_idx, axis=1)  # (M, K)
        # unbiased std like torch.std (reference ATSS target assigner);
        # ddof=0 sits ~6% lower at topk=9 and admits extra positives
        thr = cand_iou.mean(1) + cand_iou.std(1, ddof=1) + 1e-6  # (M,)
        is_pos = cand_iou >= thr[:, None]

        # candidate anchor centers inside the GT BEV rect
        cand_xyz = anchors[topk_idx][..., 0:3] - gt[:, None, 0:3]
        c, s = jnp.cos(-gt[:, 6]), jnp.sin(-gt[:, 6])
        lx = cand_xyz[..., 0] * c[:, None] - cand_xyz[..., 1] * s[:, None]
        ly = cand_xyz[..., 0] * s[:, None] + cand_xyz[..., 1] * c[:, None]
        in_gt = (jnp.abs(lx) <= gt[:, None, 3] / 2) & (
            jnp.abs(ly) <= gt[:, None, 4] / 2)
        is_pos = is_pos & in_gt & gt_valid[:, None]

        # per-anchor best surviving (anchor, gt) pair
        ious_inf = jnp.full((a, m), neg_inf)
        rows = topk_idx.reshape(-1)
        cols = jnp.broadcast_to(
            jnp.arange(m)[:, None], topk_idx.shape).reshape(-1)
        vals = jnp.where(
            is_pos.reshape(-1), iou[rows, cols], neg_inf)
        ious_inf = ious_inf.at[rows, cols].max(vals)
        # force-match every GT's argmax-iou anchor — but only when it
        # actually overlaps (gt_best > 0): an all-zero IoU column's argmax
        # is anchor 0, which would become a positive toward a GT it never
        # touches (mirrors the axis-aligned path's guard)
        gt_best_anchor = iou.argmax(axis=0)
        gt_best = iou.max(axis=0)
        ious_inf = ious_inf.at[gt_best_anchor, jnp.arange(m)].max(
            jnp.where(gt_valid & (gt_best > 0), gt_best, neg_inf))

        best_val = ious_inf.max(axis=1)
        best_gt = ious_inf.argmax(axis=1)
        pos = best_val > neg_inf
        labels = jnp.where(pos, gt[best_gt, -1].astype(jnp.int32), 0)
        targets = box_coder.encode(gt[best_gt, :7], anchors, xp=jnp)
        targets = targets * pos[:, None].astype(targets.dtype)
        weights = pos.astype(jnp.float32)
        return labels, targets, weights

    labels, targets, weights = jax.vmap(per_sample)(gt_boxes)
    return AnchorTargets(
        box_cls_labels=labels,
        box_reg_targets=targets,
        reg_weights=weights,
        groups=jnp.zeros_like(labels),
    )


def assign_anchor_targets(
    anchors_flat,  # (A, 7) static, prediction layout
    per_class_index,  # list of static (A_c,) int arrays into anchors_flat
    gt_boxes,  # (B, M, 8) class in last col
    gt_groups,  # (B, M) int32
    class_ids,  # tuple of global 1-based class ids, aligned with index list
    matched_thresholds,  # per class
    unmatched_thresholds,
    box_coder: ResidualCoder,
) -> AnchorTargets:
    """Batch assignment over all classes in the flat anchor layout."""
    anchors_flat = jnp.asarray(anchors_flat)
    code = box_coder.code_size

    def per_sample(gt, groups):
        gclass = gt[:, -1].astype(jnp.int32)
        a_total = anchors_flat.shape[0]
        labels = jnp.zeros((a_total,), jnp.int32)
        targets = jnp.zeros((a_total, code), anchors_flat.dtype)
        gout = jnp.zeros((a_total,), jnp.int32)
        for ci, (idx, cid) in enumerate(zip(per_class_index, class_ids)):
            idx = jnp.asarray(idx)
            valid = gclass == cid
            l, t, g = assign_anchors_single_class(
                anchors_flat[idx], gt[:, :7], valid, groups,
                float(matched_thresholds[ci]), float(unmatched_thresholds[ci]),
                box_coder, cid,
            )
            labels = labels.at[idx].set(l)
            targets = targets.at[idx].set(t)
            gout = gout.at[idx].set(g)
        return labels, targets, gout

    labels, targets, groups = jax.vmap(per_sample)(gt_boxes, gt_groups)
    positives = labels > 0
    reg_w = positives.astype(jnp.float32)
    pos_norm = jnp.clip(reg_w.sum(axis=1, keepdims=True), 1.0, None)
    reg_w = reg_w / pos_norm
    return AnchorTargets(
        box_cls_labels=labels,
        box_reg_targets=targets,
        reg_weights=reg_w,
        groups=groups,
    )
