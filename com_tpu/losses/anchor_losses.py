"""Anchor-head losses: sigmoid focal, smooth-L1, dir CE — plus the COM
curriculum variant with explicit EMA state.

Parity targets: SigmoidFocalClassificationLoss (loss_utils.py:10-76),
WeightedSmoothL1Loss / WeightedCrossEntropyLoss (:338-496), and
CurriculumSigmoidFocalClassificationLoss (:79-331) whose semantics are:
per-class EMA mean/std of positive-anchor sigmoid scores set a threshold
T = mean + OFFSET*std; each positive anchor's weight is the COM sigmoid
h/(1+exp(e*(p-T)/var)) + 1 - h/2 with epoch-decayed height, normalized by
Gaussian-CDF halves (pos_norm/neg_norm); per-(class,group) confidence sums
feed COMAug.  The reference mutates module attrs and optionally all_gathers
(DIST); here state is an explicit pytree and reductions are global under pjit.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _norm_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def sigmoid_ce_with_logits(logits, targets):
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """(B, A, C) focal loss, anchor-wise weighted (SigmoidFocal parity)."""
    pred = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred) + (1.0 - targets) * pred
    focal = alpha_w * jnp.power(pt, gamma)
    loss = focal * sigmoid_ce_with_logits(logits, targets)
    if weights.ndim == 2:
        weights = weights[..., None]
    return loss * weights


def weighted_smooth_l1(pred, target, weights, beta=1.0 / 9.0, code_weights=None):
    """(B, A, D) smooth-L1 (WeightedSmoothL1Loss parity)."""
    diff = pred - jnp.where(jnp.isfinite(target), target, pred)
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits, one_hot, weights):
    """(B, A, C) CE with one-hot targets (WeightedCrossEntropyLoss parity)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -(one_hot * logp).sum(-1)
    return loss * weights


class AnchorCurriculumState(NamedTuple):
    """Per-class EMA of positive-anchor score statistics."""

    means: jax.Array  # (C,)
    stds: jax.Array  # (C,)
    initialized: jax.Array  # (C,) bool

    @classmethod
    def create(cls, num_class: int):
        return cls(
            means=jnp.zeros((num_class,), jnp.float32),
            stds=jnp.zeros((num_class,), jnp.float32),
            initialized=jnp.zeros((num_class,), bool),
        )


def anchor_group_confidences(pred_sigmoid, groups, num_class, num_groups=96):
    """Per-(class, group) sums/counts of sigmoid scores over anchors whose
    one-hot-class group id is that group (groups_confidence parity,
    loss_utils.py:204-214)."""
    b, a, c = pred_sigmoid.shape
    g = groups.astype(jnp.int32)  # (B, A, C) group ids, 0 = none
    cls_idx = jnp.broadcast_to(jnp.arange(c)[None, None, :], g.shape)
    valid = g > 0
    seg = jnp.where(valid, cls_idx * num_groups + (g - 1), num_class * num_groups)
    n = num_class * num_groups + 1
    p = jax.lax.stop_gradient(pred_sigmoid)
    sums = jax.ops.segment_sum(jnp.where(valid, p, 0.0).reshape(-1), seg.reshape(-1), num_segments=n)
    cnts = jax.ops.segment_sum(valid.astype(jnp.float32).reshape(-1), seg.reshape(-1), num_segments=n)
    return sums[:-1].reshape(num_class, num_groups), cnts[:-1].reshape(num_class, num_groups)


def curriculum_sigmoid_focal_loss(
    logits,  # (B, A, C)
    one_hot_targets,  # (B, A, C)
    weights,  # (B, A)
    groups,  # (B, A, C) int group ids (0 = none)
    state: AnchorCurriculumState,
    curriculum_cfg: dict,
    epoch,
    gamma=2.0,
    alpha=0.25,
    num_groups=96,
):
    """Returns (weighted loss (B,A,C), curriculum_weight (B,A,C), new_state,
    (conf_sums, conf_cnts))."""
    cfg = curriculum_cfg
    use_cl = bool(cfg.get("UCL", True))
    al = float(cfg.get("ALPHA", 0.001))
    elong = float(cfg.get("ELONGATION", -10))
    height_cfg = cfg.get("HEIGHT", 1)
    offset = float(cfg.get("OFFSET", 0))
    inverse = bool(cfg.get("INV", False))
    use_norm = bool(cfg.get("NORM", False))
    pos_weight = float(cfg.get("POSW", 1))
    fixed = bool(cfg.get("FIXED", False))
    oto = bool(cfg.get("OTO", False))
    start_epoch = int(cfg.get("START", 0))
    end_epoch_cfg = cfg.get("END", 30)
    cut_epoch = int(cfg.get("CUT", 10000))
    sm = bool(cfg.get("SM", False))
    sma = bool(cfg.get("SMA", False))
    sme = int(cfg.get("SME", 20))
    smt = float(cfg.get("SMT", 0.15))

    pos_norm = 0.5 / max(1.0 - _norm_cdf(offset), 1e-8) * pos_weight
    neg_norm = 0.5 / max(_norm_cdf(offset), 1e-8)

    pred = jax.nn.sigmoid(logits)
    p_det = jax.lax.stop_gradient(pred)
    b, a, c = logits.shape
    epoch = jnp.asarray(epoch, jnp.float32)

    conf = anchor_group_confidences(pred, groups, c, num_groups)

    new_state = state
    cw = jnp.ones_like(pred)
    if use_cl:
        # per-class EMA of positive-anchor score mean/std (update_score parity:
        # "positive" = anchors with a group id > 0)
        pos = (groups > 0).astype(jnp.float32)
        n_pos = pos.sum(axis=(0, 1))  # (C,)
        s1 = (p_det * pos).sum(axis=(0, 1))
        s2 = (p_det * p_det * pos).sum(axis=(0, 1))
        mean_b = s1 / jnp.clip(n_pos, 1.0, None)
        var_b = jnp.clip(s2 / jnp.clip(n_pos, 1.0, None) - mean_b**2, 0.0, None)
        std_b = jnp.sqrt(var_b)
        has = n_pos > 0
        means = jnp.where(
            has,
            jnp.where(state.initialized, (1 - al) * state.means + al * mean_b, mean_b),
            state.means,
        )
        stds = jnp.where(
            has,
            jnp.where(state.initialized, (1 - al) * state.stds + al * std_b, std_b),
            state.stds,
        )
        inited = state.initialized | has
        new_state = AnchorCurriculumState(means=means, stds=stds, initialized=inited)

        threshold = jnp.where(inited, means + offset * stds, 0.5)  # (C,)
        var = jnp.where(inited, stds, 0.2) if use_norm else jnp.ones_like(stds)
        var = jnp.clip(var, 1e-6, None)

        heights = jnp.asarray(
            height_cfg if isinstance(height_cfg, (list, tuple)) else [height_cfg] * c,
            jnp.float32,
        )
        ends = jnp.asarray(
            end_epoch_cfg if isinstance(end_epoch_cfg, (list, tuple)) else [end_epoch_cfg] * c,
            jnp.float32,
        )
        # deliberate reference parity (loss_utils.py:267-269): there is NO
        # epoch >= START gate, so with START > 0 the decay exceeds 1 before
        # START and the effective height overshoots HEIGHT (weights can go
        # negative) — the reference behaves identically and the golden
        # suite pins it
        decay = (ends - epoch) / jnp.clip(ends - start_epoch, 1e-6, None)
        if not inverse:
            decay = jnp.clip(decay, 0.0, None)
        h = heights if fixed else heights * decay
        h = jnp.where(epoch > cut_epoch, 0.0, h)  # (C,)

        mask = (groups > 0) if oto else (one_hot_targets > 0)
        w = h / (1.0 + jnp.exp(elong * (p_det - threshold) / var)) + 1.0 - h / 2.0
        w = jnp.where(p_det > threshold, w * pos_norm, w * neg_norm)
        if sm or sma:
            if sma:
                m2 = (one_hot_targets > 0) & (groups <= 0) & (p_det <= smt)
            else:
                m2 = mask & (p_det <= smt)
            cw = jnp.where((epoch >= sme) & m2, 0.5, 1.0)
        else:
            cw = jnp.where(mask, w, 1.0)

    loss = sigmoid_focal_loss(logits, one_hot_targets, weights, gamma, alpha)
    return loss * cw, cw, new_state, conf
