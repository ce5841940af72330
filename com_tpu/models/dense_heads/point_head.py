"""Point heads: per-keypoint foreground supervision (PV-RCNN auxiliary).

Role of pcdet/models/dense_heads/point_head_simple.py (+ template): an MLP
over the VSA keypoint features predicts per-point foreground score, supervised
by point-in-gt-box membership; the focal loss is added to the PV-RCNN total
(detectors/pv_rcnn.py:24-36 loss composition).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import points_in_rbbox
from ...utils.registry import DENSE_HEADS
from ..layers import MaskedBatchNorm


@DENSE_HEADS.register
class PointHeadSimple(nn.Module):
    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = batch["point_features"]  # (B, S, C)
        for i, ch in enumerate(self.model_cfg.get("CLS_FC", [256, 256])):
            x = nn.Dense(ch, use_bias=False, name=f"cls_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"cls_bn_{i}")(
                x, mask=batch.get("point_valid"), use_running_average=not train
            )
            x = nn.relu(x)
        batch["point_cls_scores_raw"] = nn.Dense(1, name="cls_out")(x)[..., 0]
        return batch


def point_head_loss(batch, extra_width=(0.2, 0.2, 0.2)):
    """Focal loss on keypoint fg/bg vs enlarged-GT membership
    (point_head_template assign_stack_targets + get_cls_layer_loss roles)."""
    from ...losses.anchor_losses import sigmoid_ce_with_logits

    logits = batch["point_cls_scores_raw"]  # (B, S)
    kp = batch["point_coords"]  # (B, S, 3)
    kp_valid = batch.get("point_valid", jnp.ones(logits.shape, bool))
    gt = batch["gt_boxes"]  # (B, M, 8)

    def fg_one(p, g):
        boxes = jnp.concatenate(
            [g[:, :3], g[:, 3:6] + jnp.asarray(extra_width), g[:, 6:7]], axis=1
        )
        inside = points_in_rbbox(p, boxes, xp=jnp) & (g[:, -1] > 0)[None, :]
        return inside.any(axis=1)

    fg = jax.vmap(fg_one)(kp, gt).astype(jnp.float32)
    pred = jax.nn.sigmoid(logits)
    alpha, gamma = 0.25, 2.0
    alpha_w = fg * alpha + (1 - fg) * (1 - alpha)
    pt = fg * (1 - pred) + (1 - fg) * pred
    loss = alpha_w * jnp.power(pt, gamma) * sigmoid_ce_with_logits(logits, fg)
    loss = loss * kp_valid.astype(loss.dtype)
    pos = (fg * kp_valid).sum()
    return loss.sum() / jnp.clip(pos, 1.0, None)
