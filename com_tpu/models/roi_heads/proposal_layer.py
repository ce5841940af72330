"""Two-stage proposal layer (roi_head_template.py proposal_layer role):
score top-k prefilter, rotated-BEV NMS per sample, fixed-size RoI output.
Jittable, static shapes."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.nms import fast_nms_bev, nms_bev


def proposal_layer(
    boxes,  # (B, N, 7)
    scores,  # (B, N) raw (pre-sigmoid ok; only ranking matters)
    labels,  # (B, N) int32
    nms_pre: int = 4096,
    nms_post: int = 512,
    nms_thresh: float = 0.8,
    use_fast_nms: bool = False,
):
    """Returns (rois (B, P, 7), roi_scores (B, P), roi_labels (B, P),
    roi_valid (B, P)) with P = nms_post."""
    nms_pre = min(nms_pre, boxes.shape[1])

    def per_sample(b, s, l):
        top, idx = jax.lax.top_k(s, nms_pre)
        bb, ll = b[idx], l[idx]
        valid = jnp.isfinite(top)
        nms = fast_nms_bev if use_fast_nms else nms_bev
        sel, sel_valid = nms(bb[:, :7], top, valid, nms_thresh, nms_post)
        f = sel_valid.astype(b.dtype)[:, None]
        return bb[sel] * f, top[sel] * f[:, 0], ll[sel] * sel_valid, sel_valid

    return jax.vmap(per_sample)(boxes, scores, labels)
