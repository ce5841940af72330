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


@DENSE_HEADS.register
class PointIntraPartOffsetHead(nn.Module):
    """Per-point fg score + intra-object part location (point_intra_part_head
    PointIntraPartOffsetHead role, PartA2 first stage): two MLP branches over
    the UNet point features; part targets are the canonical-box-relative
    coordinates in [0, 1]."""

    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = True):
        feats = batch["point_features"]  # (B, S, C)
        valid = batch.get("point_valid")

        def branch(x, fcs, out_ch, name):
            for i, ch in enumerate(fcs):
                x = nn.Dense(ch, use_bias=False, name=f"{name}_fc_{i}")(x)
                x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
                    x, mask=valid, use_running_average=not train)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{name}_out")(x)

        cls = branch(feats, self.model_cfg.get("CLS_FC", [128]), self.num_class,
                     "cls")
        part = branch(feats, self.model_cfg.get("PART_FC", [128]), 3, "part")
        batch["point_cls_scores_raw"] = cls.max(axis=-1)
        batch["point_cls_preds"] = cls
        batch["point_part_offset"] = jax.nn.sigmoid(part)
        batch["point_part_logits"] = part
        batch["point_cls_scores"] = jax.nn.sigmoid(cls.max(axis=-1))

        if "REG_FC" in self.model_cfg:
            # PartA2-free mode (point_intra_part_head.py with box layers):
            # the part head doubles as the proposal generator, so it also
            # regresses a PointResidualCoder box per point like PointHeadBox
            from ...ops.boxes import PointResidualCoder

            coder = PointResidualCoder(
                **self.model_cfg.get("TARGET_CONFIG", {}).get(
                    "BOX_CODER_CONFIG", {})
            )
            box = branch(feats, self.model_cfg["REG_FC"], coder.code_size,
                         "box")
            batch["point_box_preds_raw"] = box
            pred_classes = cls.argmax(axis=-1) + 1
            batch["point_box_preds"] = coder.decode(
                box, batch["point_coords"], pred_classes, xp=jnp)
            batch["point_pred_labels"] = pred_classes
        return batch


@DENSE_HEADS.register
class PointHeadBox(nn.Module):
    """Point-wise cls + box regression head (point_head_box.py PointHeadBox,
    PointRCNN first stage): per-point class scores and a PointResidualCoder
    box per point; foreground points' decoded boxes become the proposals."""

    model_cfg: dict
    num_class: int = 3

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from ...ops.boxes import PointResidualCoder

        feats = batch["point_features"]
        valid = batch.get("point_valid")

        def branch(x, fcs, out_ch, name):
            for i, ch in enumerate(fcs):
                x = nn.Dense(ch, use_bias=False, name=f"{name}_fc_{i}")(x)
                x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
                    x, mask=valid, use_running_average=not train)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{name}_out")(x)

        cls = branch(feats, self.model_cfg.get("CLS_FC", [256, 256]),
                     self.num_class, "cls")
        coder = PointResidualCoder(
            **self.model_cfg.get("TARGET_CONFIG", {}).get("BOX_CODER_CONFIG", {})
        )
        box = branch(feats, self.model_cfg.get("REG_FC", [256, 256]),
                     coder.code_size, "box")

        batch["point_cls_preds"] = cls  # (B, N, num_class)
        batch["point_box_preds_raw"] = box
        batch["point_cls_scores"] = jax.nn.sigmoid(cls.max(axis=-1))
        pred_classes = cls.argmax(axis=-1) + 1
        batch["point_box_preds"] = coder.decode(
            box, batch["point_coords"], pred_classes, xp=jnp)
        batch["point_pred_labels"] = pred_classes
        return batch


def point_head_box_loss(batch, model_cfg):
    """PointHeadBox losses (point_head_template get_cls_layer_loss +
    get_box_layer_loss): focal cls on per-point class targets (in-box
    membership, enlarged-box band ignored) + smooth-l1 on coder encodings
    for foreground points."""
    from ...losses.anchor_losses import sigmoid_ce_with_logits
    from ...ops.boxes import PointResidualCoder, points_in_rbbox

    tc = model_cfg.get("TARGET_CONFIG", {})
    extra = tuple(tc.get("GT_EXTRA_WIDTH", [0.2, 0.2, 0.2]))
    coder = PointResidualCoder(**tc.get("BOX_CODER_CONFIG", {}))

    logits = batch["point_cls_preds"]  # (B, N, C)
    box_raw = batch["point_box_preds_raw"]
    pts = batch["point_coords"]
    pvalid = batch.get("point_valid", jnp.ones(pts.shape[:2], bool))
    gt = batch["gt_boxes"]
    num_class = logits.shape[-1]

    def targets_one(p, g):
        gt_valid = g[:, -1] > 0
        inside = points_in_rbbox(p, g[:, :7], xp=jnp) & gt_valid[None, :]
        ext = jnp.concatenate(
            [g[:, :3], g[:, 3:6] + jnp.asarray(extra), g[:, 6:7]], axis=1)
        inside_ext = points_in_rbbox(p, ext, xp=jnp) & gt_valid[None, :]
        fg = inside.any(axis=1)
        ignore = inside_ext.any(axis=1) & ~fg
        gidx = jnp.argmax(inside, axis=1)
        box = g[gidx]
        cls_t = jnp.where(fg, box[:, -1].astype(jnp.int32), 0)
        cls_t = jnp.where(ignore, -1, cls_t)
        enc = coder.encode(box[:, :7], p, jnp.maximum(cls_t, 1), xp=jnp)
        return cls_t, enc

    cls_t, enc_t = jax.vmap(targets_one)(pts, gt)
    one_hot = jax.nn.one_hot(jnp.clip(cls_t, 0, None), num_class + 1)[..., 1:]
    cls_valid = (cls_t >= 0) & pvalid
    pred = jax.nn.sigmoid(logits)
    alpha, gamma = 0.25, 2.0
    alpha_w = one_hot * alpha + (1 - one_hot) * (1 - alpha)
    pt = one_hot * (1 - pred) + (1 - one_hot) * pred
    per = alpha_w * jnp.power(pt, gamma) * sigmoid_ce_with_logits(logits, one_hot)
    pos = ((cls_t > 0) & pvalid).sum()
    cls_loss = (per.sum(-1) * cls_valid).sum() / jnp.clip(pos, 1, None)

    fg = ((cls_t > 0) & pvalid).astype(jnp.float32)
    d = (box_raw - enc_t)
    ad = jnp.abs(d)
    beta = 1.0 / 9.0
    sl1 = jnp.where(ad < beta, 0.5 * d**2 / beta, ad - 0.5 * beta).sum(-1)
    box_loss = (sl1 * fg).sum() / jnp.clip(fg.sum(), 1.0, None)

    lw = model_cfg.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
    total = (cls_loss * float(lw.get("point_cls_weight", 1.0))
             + box_loss * float(lw.get("point_box_weight", 1.0)))
    return total, {"point_loss_cls": cls_loss, "point_loss_box": box_loss}


def point_part_targets(points, gt_boxes, extra_width=(0.2, 0.2, 0.2)):
    """Per-point (fg, part_xyz in [0,1]) targets (point_intra_part_head
    assign_targets: fg = inside GT; part = canonical offset / dims + 0.5)."""
    def one(p, g):
        gt_valid = g[:, -1] > 0
        inside = points_in_rbbox(p, g[:, :7], xp=jnp) & gt_valid[None, :]
        ext = jnp.concatenate(
            [g[:, :3], g[:, 3:6] + jnp.asarray(extra_width), g[:, 6:7]], axis=1)
        inside_ext = points_in_rbbox(p, ext, xp=jnp) & gt_valid[None, :]
        fg = inside.any(axis=1)
        ignore = inside_ext.any(axis=1) & ~fg  # boundary band -> label -1
        gidx = jnp.argmax(inside, axis=1)
        box = g[gidx]
        shifted = p - box[:, 0:3]
        c, s = jnp.cos(-box[:, 6]), jnp.sin(-box[:, 6])
        lx = shifted[:, 0] * c - shifted[:, 1] * s
        ly = shifted[:, 0] * s + shifted[:, 1] * c
        lz = shifted[:, 2]
        part = jnp.stack([lx, ly, lz], axis=1) / jnp.clip(box[:, 3:6], 1e-5, None) + 0.5
        part = jnp.clip(part, 0.0, 1.0) * fg[:, None]
        label = jnp.where(ignore, -1.0, fg.astype(jnp.float32))
        return label, part

    return jax.vmap(one)(points, gt_boxes)


def point_part_loss(batch, extra_width=(0.2, 0.2, 0.2), include_cls=True):
    """Focal fg loss + BCE part-offset loss (point_head_template
    get_cls_layer_loss + get_part_layer_loss).

    include_cls=False when the box branch's loss already supervised the
    (shared) cls logits — the PartA2-free composition computes the cls
    loss exactly once in the reference."""
    from ...losses.anchor_losses import sigmoid_ce_with_logits

    logits = batch["point_cls_scores_raw"]  # (B, S)
    part_logits = batch["point_part_logits"]  # (B, S, 3)
    kp = batch["point_coords"]
    kp_valid = batch.get("point_valid", jnp.ones(logits.shape, bool))
    label, part_t = point_part_targets(kp, batch["gt_boxes"], extra_width)

    fg = jnp.clip(label, 0.0, 1.0)
    cls_valid = (label >= 0) & kp_valid
    pred = jax.nn.sigmoid(logits)
    alpha, gamma = 0.25, 2.0
    alpha_w = fg * alpha + (1 - fg) * (1 - alpha)
    pt = fg * (1 - pred) + (1 - fg) * pred
    cls_loss = alpha_w * jnp.power(pt, gamma) * sigmoid_ce_with_logits(logits, fg)
    cls_loss = (cls_loss * cls_valid).sum() / jnp.clip(
        (fg * cls_valid).sum(), 1.0, None)

    fg_mask = (label > 0) & kp_valid
    part_bce = sigmoid_ce_with_logits(part_logits, part_t)
    part_loss = (part_bce.mean(-1) * fg_mask).sum() / jnp.clip(
        fg_mask.sum(), 1.0, None)
    if not include_cls:
        return part_loss, {"point_loss_part": part_loss}
    return cls_loss + part_loss, {"point_loss_cls": cls_loss,
                                  "point_loss_part": part_loss}


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
