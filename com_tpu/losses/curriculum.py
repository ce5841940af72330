"""COMLoss — curriculum focal loss for the CenterPoint path.

Vectorized, stateful-but-functional rebuild of FocalLossCenterCurriculum
(pcdet/utils/loss_utils.py:998-1309).  The reference's design:

* per-object prediction confidence = sigmoid heatmap at the GT center;
* an EMA of the mean positive confidence sets the easy/hard threshold;
* each object's weight = h / (1 + exp(e * (p - thr))) + 1 - h/2
  (easy objects upweighted early), stamped as a constant square patch into a
  per-pixel mask (heatmap side) and into box_mask (regression side);
* per-(class, difficulty-group) confidence sums/counts are accumulated and
  fed back to the COMAug sampler at epoch end.

Differences by design (documented, not accidental):
* The reference mutates module attributes and runs a per-object Python loop
  with .item() syncs (loss_utils.py:1227-1291); here the EMA lives in an
  explicit CurriculumState pytree carried by the train state, and the loop is
  one vectorized gather + stamp.
* The reference all_gathers batch statistics per rank then EMAs locally
  (update_scores, :1065-1069); under pjit the batch reductions are already
  global, so the EMA state is identical on every device by construction.
* The reference's heatmap-mask multiply has a broadcasting bug
  ((B,1,C,H,W)x(B,C,H,W) -> (B,B,C,H,W), loss_utils.py:1293-1296); we apply
  the mask correctly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.dense_heads.target_assign import CenterTargets
from ..ops.gaussian import stamp_squares_batched
from .centernet import focal_loss_centernet


class CurriculumState(NamedTuple):
    """EMA statistics carried across steps (checkpointed, unlike the reference
    which silently resets them on resume — SURVEY §5).

    mean/std serve the MERGE_SCORES variant (FocalLossCenterCurriculumMerge,
    loss_utils.py:667-996): EMA of the mean/std of sigmoid scores at positive
    heatmap pixels, which the reference computes from all_gathered
    [sum, sum^2, n] — identical numbers fall out of the global batch
    reductions under pjit."""

    avg_confidence: jax.Array  # () f32 EMA of mean positive confidence
    mean: jax.Array  # () f32 EMA mean of positive-pixel scores
    std: jax.Array  # () f32 EMA std of positive-pixel scores
    initialized: jax.Array  # () bool — first batch seeds the EMA

    @classmethod
    def create(cls):
        return cls(
            avg_confidence=jnp.zeros((), jnp.float32),
            mean=jnp.zeros((), jnp.float32),
            std=jnp.zeros((), jnp.float32),
            initialized=jnp.asarray(False),
        )


class CurriculumAux(NamedTuple):
    confidence_sum: jax.Array  # (num_class, num_groups) per-group conf sums
    confidence_cnt: jax.Array  # (num_class, num_groups) object counts
    avg_confidence: jax.Array  # () batch mean positive confidence
    box_mask: jax.Array  # (B, M) regression weights


def _object_confidences(pred_hm, targets: CenterTargets):
    """Sigmoid heatmap value at each GT center (detached)."""
    b, h, w, c = pred_hm.shape
    flat = jax.lax.stop_gradient(pred_hm).reshape(b, h * w, c)
    at_cell = jnp.take_along_axis(flat, targets.inds[..., None], axis=1)  # (B,M,C)
    p = jnp.take_along_axis(at_cell, targets.class_local[..., None], axis=2)[..., 0]
    return p  # (B, M)


def group_confidences(pred_hm, targets: CenterTargets, num_class, num_groups):
    """Per-(class, group) confidence sums + counts
    (confidence_of_all_groups, loss_utils.py:1160-1177)."""
    p = _object_confidences(pred_hm, targets)
    valid = (targets.mask > 0) & (targets.group >= 1)
    # confidence rows are GLOBAL classes: a multi-head config (one class per
    # head) has class_local == 0 in every head, which would collapse all
    # classes into row 0 of the (num_class, num_groups) tensor
    cls_row = (targets.class_global if targets.class_global is not None
               else targets.class_local)
    seg = cls_row * num_groups + (targets.group - 1)
    seg = jnp.where(valid, seg, num_class * num_groups).reshape(-1)
    n = num_class * num_groups + 1
    sums = jax.ops.segment_sum(jnp.where(valid, p, 0.0).reshape(-1), seg, num_segments=n)
    cnts = jax.ops.segment_sum(valid.astype(jnp.float32).reshape(-1), seg, num_segments=n)
    return (
        sums[:-1].reshape(num_class, num_groups),
        cnts[:-1].reshape(num_class, num_groups),
    )


def focal_loss_center_curriculum(
    pred_hm,  # (B, H, W, C) post-sigmoid
    targets: CenterTargets,
    state: CurriculumState,
    curriculum_cfg: dict,
    epoch,  # int array or python int
    num_class: int,
    num_groups: int,
):
    """Returns (loss, new_state, CurriculumAux)."""
    cfg = curriculum_cfg
    alpha = float(cfg.get("ALPHA", 0.001))
    use_curriculum = bool(cfg.get("UCL", True))
    fix_threshold = bool(cfg.get("FIX", False))
    threshold_cfg = float(cfg.get("THRESHOLD", 0.2))
    elongation = float(cfg.get("ELONGATION", -10))
    height = float(cfg.get("HEIGHT", 1))
    start_epoch = int(cfg.get("START", 0))
    end_epoch = int(cfg.get("END", 30))
    straight = bool(cfg.get("STRAIGHT", False))
    tuning = bool(cfg.get("TUNING", False))
    k_straight = float(cfg.get("K", 1.0))
    add_radius = int(cfg.get("ADD", 0))
    fixed_radius = int(cfg.get("RADIUS", 0))
    only_center = bool(cfg.get("CENTER", False))

    merge_scores = bool(cfg.get("MERGE_SCORES", False))
    offset = float(cfg.get("OFFSET", 0))

    gt = targets.heatmaps
    pos_inds = (gt == 1.0).astype(pred_hm.dtype)
    num_obj = pos_inds.sum()
    p_pos_sum = jax.lax.stop_gradient((pred_hm * pos_inds).sum())
    p_pos_sq = jax.lax.stop_gradient((pred_hm * pred_hm * pos_inds).sum())
    batch_avg_conf = p_pos_sum / jnp.clip(num_obj, 1.0, None)
    batch_var = jnp.clip(
        p_pos_sq / jnp.clip(num_obj, 1.0, None) - batch_avg_conf**2, 0.0, None
    )
    batch_std = jnp.sqrt(batch_var)
    # EMA update (reference seeds avg from 0.0 and always EMAs, :1225; the
    # merge variant seeds mean/std from the first batch, :776-790)
    new_avg = alpha * batch_avg_conf + (1 - alpha) * state.avg_confidence
    has = num_obj > 0
    new_mean = jnp.where(
        has,
        jnp.where(state.initialized,
                  (1 - alpha) * state.mean + alpha * batch_avg_conf, batch_avg_conf),
        state.mean,
    )
    new_std = jnp.where(
        has,
        jnp.where(state.initialized,
                  (1 - alpha) * state.std + alpha * batch_std, batch_std),
        state.std,
    )
    new_state = CurriculumState(
        avg_confidence=new_avg, mean=new_mean, std=new_std,
        initialized=state.initialized | has,
    )

    conf_sum, conf_cnt = group_confidences(pred_hm, targets, num_class, num_groups)

    box_mask = targets.mask
    hm_mask = None
    if use_curriculum:
        p = _object_confidences(pred_hm, targets)  # (B, M)
        if merge_scores:
            threshold = new_mean + offset * new_std
        elif fix_threshold:
            threshold = threshold_cfg
        else:
            threshold = new_avg * threshold_cfg
        if straight:
            weight = k_straight * (p - threshold) + 1.0
        elif tuning:
            weight = jnp.ones_like(p)
        else:
            weight = height / (1.0 + jnp.exp(elongation * (p - threshold))) + 1.0 - height / 2.0

        in_window = (jnp.asarray(epoch) >= start_epoch) & (jnp.asarray(epoch) <= end_epoch)
        valid = targets.mask > 0
        eff_weight = jnp.where(in_window & valid, weight, targets.mask)
        box_mask = eff_weight

        radius = (
            jnp.full_like(targets.radius, fixed_radius)
            if fixed_radius != 0
            else targets.radius + add_radius
        )
        if only_center:
            radius = jnp.zeros_like(radius)
        b, h, w, c = pred_hm.shape
        stamp_valid = valid & jnp.broadcast_to(in_window, valid.shape)
        hm_mask = stamp_squares_batched(
            targets.center_int, radius, targets.class_local, weight,
            stamp_valid, c, h, w, fill=1.0,
        ).astype(pred_hm.dtype)
        hm_mask = jnp.transpose(hm_mask, (0, 2, 3, 1))  # NHWC

    loss = focal_loss_centernet(pred_hm, gt, mask=hm_mask)
    aux = CurriculumAux(
        confidence_sum=conf_sum,
        confidence_cnt=conf_cnt,
        avg_confidence=batch_avg_conf,
        box_mask=box_mask,
    )
    return loss, new_state, aux
