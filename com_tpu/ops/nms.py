"""Jittable NMS: exact rotated-BEV NMS and circle-NMS, static shapes.

Replaces nms_gpu / nms_normal_gpu (pcdet/ops/iou3d_nms/src/iou3d_nms_api.cpp)
and the numba circle_nms (centernet_utils.py:143-167).  The pairwise IoU /
distance matrix is built in one vectorized shot (VPU-friendly), then a
lax.fori_loop runs the inherently-sequential greedy suppression over the
score-sorted candidates.  Inputs/outputs are fixed size with validity masks —
no dynamic shapes anywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou import boxes_iou_bev, boxes_iou_aligned_bev


def _greedy_suppress(pair_matrix: jax.Array, thresh: float, valid: jax.Array):
    """Greedy NMS over score-sorted candidates.

    pair_matrix[i, j] = affinity between candidates i and j (IoU or -dist);
    candidates are already sorted by descending score.  Returns keep mask.

    On TPU the sequential pass runs as a single Pallas kernel with the whole
    (K, K) matrix resident in VMEM (ops/pallas/nms_kernel.py); elsewhere a
    lax.fori_loop fallback (also the test oracle).
    """
    k = pair_matrix.shape[0]
    over = pair_matrix > thresh

    if jax.default_backend() == "tpu" and k <= 1024:
        from .pallas.nms_kernel import greedy_suppress_pallas

        return greedy_suppress_pallas(over, valid)

    def body(i, state):
        suppressed, keep = state
        alive = jnp.logical_not(suppressed[i]) & valid[i]
        keep = keep.at[i].set(alive)
        later = jnp.arange(k) > i
        suppressed = suppressed | (alive & later & over[i])
        return suppressed, keep

    suppressed0 = jnp.logical_not(valid)
    keep0 = jnp.zeros((k,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, k, body, (suppressed0, keep0))
    return keep


def _self_iou(sb, use_rotated_iou: bool, row_block: int = 512):
    """(K, K) self-IoU, row-blocked past 1024 candidates.

    The rotated polygon clip materializes (rows, K, 24, 2)-shaped
    intermediates; at proposal-stage K (4096) that is gigabytes per sample.
    lax.map over row blocks keeps the live intermediate at
    (row_block, K, 24, 2) while still emitting the full (K, K) matrix."""
    k = sb.shape[0]
    f = boxes_iou_bev if use_rotated_iou else boxes_iou_aligned_bev
    if k <= 1024 or k % row_block != 0:
        return f(sb, sb, xp=jnp)
    blocks = sb.reshape(k // row_block, row_block, sb.shape[-1])
    rows = jax.lax.map(lambda ba: f(ba, sb, xp=jnp), blocks)
    return rows.reshape(k, k)


def nms_bev(
    boxes: jax.Array,  # (K, 7)
    scores: jax.Array,  # (K,)
    valid: jax.Array,  # (K,) bool
    thresh: float,
    post_max_size: int,
    use_rotated_iou: bool = True,
):
    """Rotated-BEV NMS.  Returns (selected_idx (post_max,), sel_valid (post_max,)).

    Matches nms_gpu semantics: sort by score, suppress by BEV IoU > thresh.
    """
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    sb = boxes[order]
    sv = valid[order]
    iou = _self_iou(sb, use_rotated_iou)
    keep = _greedy_suppress(iou, thresh, sv)
    # stable-select kept candidates in score order, pad to post_max_size
    kept_rank = jnp.where(keep, jnp.cumsum(keep) - 1, k)
    slots = jnp.full((post_max_size,), k, dtype=jnp.int32)
    slots = slots.at[kept_rank].set(jnp.arange(k, dtype=jnp.int32), mode="drop")
    # slots[r] = sorted-index of r-th kept box (k = empty)
    sel_valid = slots < k
    safe = jnp.clip(slots, 0, k - 1)
    selected = order[safe]
    return selected, sel_valid & (jnp.arange(post_max_size) < keep.sum())


def multi_class_nms_bev(
    boxes: jax.Array,  # (K, 7)
    scores: jax.Array,  # (K,)
    labels: jax.Array,  # (K,) int
    valid: jax.Array,  # (K,) bool
    num_classes: int,
    thresh: float,
    post_max_size: int,
):
    """Per-class rotated NMS (model_nms_utils.multi_classes_nms role): run the
    suppression independently within each class, then keep the top
    post_max_size by score overall.

    One shared score sort + one (K, K) rotated-IoU matrix; per-class
    suppression masks cross-class pairs out of the shared matrix instead of
    re-sorting and re-clipping polygons num_classes times."""
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    sb, sv, sl = boxes[order], valid[order], labels[order]
    iou = _self_iou(sb, True)
    same_cls = sl[:, None] == sl[None, :]
    iou_cls = jnp.where(same_cls, iou, 0.0)
    keep_sorted = _greedy_suppress(iou_cls, thresh, sv & (sl > 0))
    kept = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    keep_scores = jnp.where(kept, scores, -jnp.inf)
    if k < post_max_size:  # top_k requires k_arg <= size; pad with -inf
        keep_scores = jnp.concatenate(
            [keep_scores, jnp.full((post_max_size - k,), -jnp.inf,
                                   keep_scores.dtype)])
    top, idx = jax.lax.top_k(keep_scores, post_max_size)
    return jnp.clip(idx, 0, k - 1), jnp.isfinite(top)


def fast_nms_bev(
    boxes: jax.Array,  # (K, 7)
    scores: jax.Array,  # (K,)
    valid: jax.Array,  # (K,) bool
    thresh: float,
    post_max_size: int,
):
    """One-shot NMS (YOLACT-style "fast NMS"): keep a box iff no
    higher-scoring box overlaps it above thresh.  No sequential loop — one
    IoU matrix + a row-max — so it compiles and runs much faster than exact
    greedy NMS; slightly more aggressive (a suppressed box can still suppress
    others).  Select with NMS_TYPE: fast_nms."""
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    sb, sv = boxes[order], valid[order]
    iou = _self_iou(sb, True)
    upper = jnp.triu(jnp.ones((k, k), bool), 1)  # [i, j]: i higher than j
    suppressed = ((iou > thresh) & upper & sv[:, None]).any(axis=0)
    keep = sv & ~suppressed
    kept_rank = jnp.where(keep, jnp.cumsum(keep) - 1, k)
    slots = jnp.full((post_max_size,), k, dtype=jnp.int32)
    slots = slots.at[kept_rank].set(jnp.arange(k, dtype=jnp.int32), mode="drop")
    sel_valid = slots < k
    safe = jnp.clip(slots, 0, k - 1)
    # the rank-k sentinel writes of non-kept boxes land in slot k when
    # post_max_size > K — the count guard invalidates those slots
    return order[safe], sel_valid & (jnp.arange(post_max_size) < keep.sum())


def circle_nms(
    centers_xy: jax.Array,  # (K, 2)
    scores: jax.Array,  # (K,)
    valid: jax.Array,  # (K,) bool
    dist_thresh: float,
    post_max_size: int,
):
    """Center-distance NMS (circle_nms parity: suppress if dist^2 <= thresh)."""
    k = centers_xy.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    sc = centers_xy[order]
    sv = valid[order]
    d2 = ((sc[:, None, :] - sc[None, :, :]) ** 2).sum(-1)
    keep = _greedy_suppress(-d2, -float(dist_thresh) - 1e-12, sv)
    kept_rank = jnp.where(keep, jnp.cumsum(keep) - 1, k)
    slots = jnp.full((post_max_size,), k, dtype=jnp.int32)
    slots = slots.at[kept_rank].set(jnp.arange(k, dtype=jnp.int32), mode="drop")
    sel_valid = slots < k
    safe = jnp.clip(slots, 0, k - 1)
    selected = order[safe]
    return selected, sel_valid & (jnp.arange(post_max_size) < keep.sum())
