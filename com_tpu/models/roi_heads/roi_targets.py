"""RoI target assignment — fixed-shape, jittable.

Role of pcdet/models/roi_heads/target_assigner/proposal_target_layer.py +
RoIHeadTemplate target/loss plumbing (roi_head_template.py:11-261): match
first-stage proposals to GT by rotated 3D IoU, pick a fixed fg/bg mix, emit
IoU-derived soft classification labels and canonical-frame regression targets.

Sampling: with an `rng` key the fg/bg subsample is random like the
reference's proposal_target_layer (uniform among foregrounds; backgrounds
tiered hard/easy by HARD_BG_RATIO with random draws inside each tier —
sample_bg_inds role), threaded as the flax rng collection "roi_sampling" so
the step stays a pure function of (state, batch, key).  Without a key the
selection is deterministic (top-IoU foregrounds, then hardest backgrounds) —
the fallback used by eval and by callers that pass no rngs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.iou import boxes_iou3d


def _limit_period(val, offset, period):
    return val - jnp.floor(val / period + offset) * period


class RoITargets(NamedTuple):
    rois: jax.Array  # (B, R, 7)
    roi_valid: jax.Array  # (B, R)
    roi_scores: jax.Array  # (B, R)
    roi_labels: jax.Array  # (B, R) int32
    gt_iou: jax.Array  # (B, R) max IoU vs GT
    cls_labels: jax.Array  # (B, R) soft iou labels in [0,1], -1 = ignore
    reg_targets: jax.Array  # (B, R, 7) canonical-frame encodings
    reg_valid: jax.Array  # (B, R) fg mask
    gt_of_rois_src: jax.Array  # (B, R, 7) matched GT boxes in world frame


def canonical_transform(gt_boxes, rois):
    """Encode GT in each RoI's canonical frame (roi_head_template reg target).

    Heading: IoU matching ignores box direction, so a good proposal can
    match a GT rotated ~pi.  The reference flips such opposite-direction
    headings by pi and clamps to [-pi/2, pi/2]
    (roi_head_template.py:125-130) — without the flip the regression target
    sits near +-pi and smooth-L1 spins well-placed boxes half a turn."""
    cos, sin = jnp.cos(-rois[..., 6]), jnp.sin(-rois[..., 6])
    dx = gt_boxes[..., 0] - rois[..., 0]
    dy = gt_boxes[..., 1] - rois[..., 1]
    lx = dx * cos - dy * sin
    ly = dx * sin + dy * cos
    lz = gt_boxes[..., 2] - rois[..., 2]
    h = jnp.mod(gt_boxes[..., 6] - rois[..., 6], 2 * jnp.pi)  # 0 ~ 2pi
    opposite = (h > jnp.pi * 0.5) & (h < jnp.pi * 1.5)
    h = jnp.where(opposite, jnp.mod(h + jnp.pi, 2 * jnp.pi), h)
    h = jnp.where(h > jnp.pi, h - 2 * jnp.pi, h)  # (-pi/2, pi/2)
    heading = jnp.clip(h, -jnp.pi / 2, jnp.pi / 2)
    return jnp.stack(
        [lx, ly, lz,
         gt_boxes[..., 3] - rois[..., 3],
         gt_boxes[..., 4] - rois[..., 4],
         gt_boxes[..., 5] - rois[..., 5],
         heading],
        axis=-1,
    )


def decode_rcnn_boxes(rois, reg):
    """Inverse of canonical_transform: RCNN deltas + RoIs -> world boxes
    (roi_head_template.generate_predicted_boxes role for our raw-delta
    encoding)."""
    yaw = rois[..., 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    dx = reg[..., 0] * cos - reg[..., 1] * sin
    dy = reg[..., 0] * sin + reg[..., 1] * cos
    return jnp.stack(
        [rois[..., 0] + dx,
         rois[..., 1] + dy,
         rois[..., 2] + reg[..., 2],
         rois[..., 3] + reg[..., 3],
         rois[..., 4] + reg[..., 4],
         rois[..., 5] + reg[..., 5],
         yaw + reg[..., 6]],
        axis=-1,
    )


def assign_roi_targets(
    rois,  # (B, P, 7) proposals
    roi_scores,  # (B, P)
    roi_labels,  # (B, P) int32
    roi_valid,  # (B, P)
    gt_boxes,  # (B, M, 8)
    roi_per_image: int = 128,
    fg_ratio: float = 0.5,
    reg_fg_thresh: float = 0.55,
    cls_fg_thresh: float = 0.75,
    cls_bg_thresh: float = 0.25,
    cls_bg_thresh_lo: float = 0.1,
    hard_bg_ratio: float = 0.8,
    rng=None,
) -> RoITargets:
    fg_cap = int(roi_per_image * fg_ratio)
    bg_cap = roi_per_image - fg_cap
    hard_cap = int(bg_cap * hard_bg_ratio)
    if rng is not None:
        keys = jax.random.split(rng, rois.shape[0])
    else:
        keys = jnp.zeros((rois.shape[0], 2), jnp.uint32)

    def per_sample(roi, score, label, valid, gt, key):
        gt_valid = gt[:, -1] > 0
        iou = boxes_iou3d(roi[:, :7], gt[:, :7], xp=jnp)
        iou = jnp.where(gt_valid[None, :] & valid[:, None], iou, 0.0)
        # class-aware matching: only count GT of the same class
        same = label[:, None] == gt[None, :, -1].astype(jnp.int32)
        iou = jnp.where(same, iou, 0.0)
        max_iou = iou.max(axis=1)
        gt_idx = iou.argmax(axis=1)

        is_fg = (max_iou >= reg_fg_thresh) & valid
        is_bg = ~is_fg & valid
        if rng is not None:
            # reference proposal_target_layer: uniform subsample of fg;
            # bg tiered hard (iou >= cls_bg_thresh_lo) / easy with
            # HARD_BG_RATIO of the bg slots going to the hard tier (random
            # within each tier); unfilled hard slots fall through to easy
            u = jax.random.uniform(key, max_iou.shape)
            fg_key = jnp.where(is_fg, u, -jnp.inf)
            hard = is_bg & (max_iou >= cls_bg_thresh_lo)
            easy = is_bg & ~hard
            # priorities: hard in (2, 3) for its quota, then easy in (1, 2),
            # then hard overflow in (0, 1) as filler
            hard_rank_u = jnp.where(hard, u, -jnp.inf)
            hard_order = jnp.argsort(-hard_rank_u)
            hard_pos = jnp.argsort(hard_order)  # rank of each roi among hard
            in_quota = hard & (hard_pos < hard_cap)
            bg_key = jnp.where(in_quota, 2.0 + u,
                               jnp.where(easy, 1.0 + u,
                                         jnp.where(hard, u, -jnp.inf)))
        else:
            # deterministic fallback: fg by IoU desc, then bg by score desc
            # (sentinel -inf: valid backgrounds may carry negative scores)
            fg_key = jnp.where(is_fg, max_iou, -jnp.inf)
            bg_key = jnp.where(is_bg, score, -jnp.inf)
        # combined selection with bg backfill (reference samples
        # fg_num = min(fg_cap, #fg) and gives the UNUSED fg quota to bg —
        # a fixed split would train half-empty RoI batches on sparse
        # scenes).  fg within its quota outranks every bg tier; extra
        # slots flow to backgrounds in tier order.  Deviation kept: the
        # hard-bg quota stays sized by the static bg_cap.
        fg_order = jnp.argsort(-fg_key)
        fg_pos = jnp.argsort(fg_order)  # rank of each roi among fg
        fg_in = is_fg & (fg_pos < fg_cap)
        prio = jnp.where(fg_in, 4.0 + jnp.nan_to_num(fg_key, neginf=0.0),
                         bg_key)
        sel = jnp.argsort(-prio)[:roi_per_image]
        sel_valid = jnp.isfinite(prio[sel])

        sroi = roi[sel]
        siou = max_iou[sel]
        sgt = gt[gt_idx[sel]]
        sfg = fg_in[sel] & sel_valid

        # iou-derived soft cls labels (roi_head_template CLS_SCORE_TYPE roi_iou)
        cls = (siou - cls_bg_thresh) / (cls_fg_thresh - cls_bg_thresh)
        cls = jnp.clip(cls, 0.0, 1.0)
        cls = jnp.where(siou >= cls_fg_thresh, 1.0, cls)
        cls = jnp.where(siou <= cls_bg_thresh, 0.0, cls)
        cls = jnp.where(sel_valid, cls, -1.0)

        reg = canonical_transform(sgt[:, :7], sroi[:, :7])
        return (sroi, sel_valid, score[sel], label[sel], siou, cls, reg, sfg,
                sgt[:, :7])

    outs = jax.vmap(per_sample)(rois, roi_scores, roi_labels, roi_valid,
                                gt_boxes, keys)
    return RoITargets(*outs)
