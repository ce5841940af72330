"""Anchor heads: AnchorHeadSingle + COM curriculum variants.

Module side of pcdet anchor_head_{template,single}.py and the curriculum
variants (anchor_head_curriculum.py:12-308, curri_anchor_head_single.py:7-139,
head_zoo.py:12-140).  As with the center path, the flax module only predicts;
target assignment (anchor_assign.py) and losses (losses/anchor_losses.py) are
pure functions in the train step, and the per-class EMA statistics live in the
train state.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import ResidualCoder
from ...ops.nms import nms_bev
from ...utils.registry import DENSE_HEADS
from .anchor_generator import generate_anchors


def build_anchors(model_cfg, class_names, grid_size, point_cloud_range):
    """Static anchors in the *prediction layout*: location-major with classes
    interleaved at each cell — matching the (B, H, W, A_loc*X) conv output
    flattened to (B, H*W*A_loc, X) (pcdet cats per-class anchors along the
    size axis before flattening, anchor_head_template.py get_box_reg_layer_loss).

    Returns (anchors_flat (A,7) np, per_class_index list of (A_c,) np,
    matched/unmatched thresholds, class_ids)."""
    agc = model_cfg["ANCHOR_GENERATOR_CONFIG"]
    per_class, _ = generate_anchors(agc, grid_size, point_cloud_range)
    # each per_class[i]: (H, W, Z, S_c, R, 7); classes concat on the S axis
    combined = np.concatenate(per_class, axis=3)  # (H, W, Z, S_total, R, 7)
    h, w, z, s_total, r, _ = combined.shape
    anchors_flat = combined.reshape(-1, 7)

    # class id per anchor slot in the interleaved S axis
    slot_class = np.concatenate([
        np.full(p.shape[3], class_names.index(cfg["class_name"]) + 1, np.int32)
        for cfg, p in zip(agc, per_class)
    ])  # (S_total,)
    class_of_anchor = np.broadcast_to(
        slot_class[None, None, None, :, None], (h, w, z, s_total, r)
    ).reshape(-1)

    per_class_index, matched, unmatched, class_ids = [], [], [], []
    for cfg in agc:
        cid = class_names.index(cfg["class_name"]) + 1
        per_class_index.append(np.where(class_of_anchor == cid)[0].astype(np.int32))
        matched.append(cfg["matched_threshold"])
        unmatched.append(cfg["unmatched_threshold"])
        class_ids.append(cid)
    return anchors_flat, per_class_index, matched, unmatched, tuple(class_ids)


@DENSE_HEADS.register
class AnchorHeadSingle(nn.Module):
    """1x1 conv heads for cls/box/dir over the BEV feature map."""

    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = batch["spatial_features_2d"]
        num_anchors = sum(
            len(c["anchor_sizes"]) * len(c["anchor_rotations"]) * len(c["anchor_bottom_heights"])
            for c in self.model_cfg["ANCHOR_GENERATOR_CONFIG"]
        )
        # emit the coder's full encoding width (BOX_CODER_CONFIG: sincos
        # adds a channel, code_size 9 adds velocity residuals) — the loss
        # and eval reshape by the same coder
        coder_cfg = self.model_cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
            "BOX_CODER_CONFIG", {})
        code_size = int(coder_cfg.get("code_size", 7)) + (
            1 if coder_cfg.get("encode_angle_by_sincos", False) else 0)
        cls_preds = nn.Conv(
            num_anchors * self.num_class, (1, 1), use_bias=True,
            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))),
            name="conv_cls",
        )(x)
        box_preds = nn.Conv(num_anchors * code_size, (1, 1), use_bias=True, name="conv_box")(x)
        batch["cls_preds_raw"] = cls_preds
        batch["box_preds_raw"] = box_preds
        if self.model_cfg.get("USE_DIRECTION_CLASSIFIER", False):
            nbins = int(self.model_cfg.get("NUM_DIR_BINS", 2))
            batch["dir_cls_preds_raw"] = nn.Conv(
                num_anchors * nbins, (1, 1), use_bias=True, name="conv_dir_cls"
            )(x)
        return batch


for _name in (
    "AnchorHeadCurriculum",
    "CurriculumAnchorHeadSingle",
    "CurriculumAnchorHeadSingle_x1",
    "CurriculumAnchorHeadSingle_car",
    "CurriculumAnchorHeadSingle_car_x2",
):
    DENSE_HEADS.register(AnchorHeadSingle, name=_name)


@DENSE_HEADS.register
class AnchorHeadMulti(nn.Module):
    """Grouped multi-head RPN (anchor_head_multi.py role): a shared conv
    followed by one small head per class group (RPN_HEAD_CFGS), each with
    its own cls / (optionally attribute-separated) box / dir convs.

    Output lands in the SAME flat class-blocked anchor layout as
    AnchorHeadSingle (per-cell head blocks concatenated in config order),
    so the downstream assigner/losses/decoders run unchanged; classes a
    head does not predict get constant -20 logits (sigmoid ~ 2e-9 — the
    reference simply never computes them)."""

    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from ..layers import ConvBNReLU

        cfg = self.model_cfg
        x = batch["spatial_features_2d"]
        shared_ch = int(cfg.get("SHARED_CONV_NUM_FILTER", 64))
        x = ConvBNReLU(shared_ch, kernel=3, name="shared_conv")(x, train)
        b, h, w, _ = x.shape

        agc = cfg["ANCHOR_GENERATOR_CONFIG"]
        anchors_per_cls = {
            c["class_name"]: len(c["anchor_sizes"]) * len(c["anchor_rotations"])
            * len(c["anchor_bottom_heights"])
            for c in agc
        }
        sep_reg = cfg.get("SEPARATE_REG_CONFIG", None)
        code_size = (
            sum(int(s.split(":")[1]) for s in sep_reg["REG_LIST"])
            if sep_reg else 7
        )
        nbins = int(cfg.get("NUM_DIR_BINS", 2))
        use_dir = cfg.get("USE_DIRECTION_CLASSIFIER", False)

        cls_blocks, box_blocks, dir_blocks = [], [], []
        for hi, head_cfg in enumerate(cfg["RPN_HEAD_CFGS"]):
            names = list(head_cfg["HEAD_CLS_NAME"])
            a_h = sum(anchors_per_cls[n] for n in names)
            ch = len(names)
            hx = x
            if sep_reg:
                for mi in range(int(sep_reg.get("NUM_MIDDLE_CONV", 0))):
                    hx = ConvBNReLU(
                        int(sep_reg.get("NUM_MIDDLE_FILTER", shared_ch)),
                        kernel=3, name=f"h{hi}_mid{mi}")(hx, train)
            cls = nn.Conv(
                a_h * ch, (1, 1), use_bias=True,
                bias_init=nn.initializers.constant(
                    -float(np.log((1 - 0.01) / 0.01))),
                name=f"h{hi}_cls")(hx)
            if sep_reg:
                regs = [
                    nn.Conv(a_h * int(s.split(":")[1]), (1, 1), use_bias=True,
                            name=f"h{hi}_reg_{s.split(':')[0]}")(hx)
                    .reshape(b, h, w, a_h, int(s.split(":")[1]))
                    for s in sep_reg["REG_LIST"]
                ]
                box = jnp.concatenate(regs, axis=-1)  # (B,H,W,A_h,code)
            else:
                box = nn.Conv(a_h * code_size, (1, 1), use_bias=True,
                              name=f"h{hi}_box")(hx).reshape(
                    b, h, w, a_h, code_size)

            # expand per-head cls to global class channels (-20 filler)
            cls = cls.reshape(b, h, w, a_h, ch)
            full = jnp.full((b, h, w, a_h, self.num_class), -20.0, cls.dtype)
            for ci, n in enumerate(names):
                gi = self.class_names.index(n)
                full = full.at[..., gi].set(cls[..., ci])
            cls_blocks.append(full)
            box_blocks.append(box)
            if use_dir:
                dir_blocks.append(
                    nn.Conv(a_h * nbins, (1, 1), use_bias=True,
                            name=f"h{hi}_dir")(hx).reshape(
                        b, h, w, a_h, nbins))

        cls_all = jnp.concatenate(cls_blocks, axis=3)
        batch["cls_preds_raw"] = cls_all.reshape(b, h, w, -1)
        batch["box_preds_raw"] = jnp.concatenate(box_blocks, axis=3).reshape(
            b, h, w, -1)
        if use_dir:
            batch["dir_cls_preds_raw"] = jnp.concatenate(
                dir_blocks, axis=3).reshape(b, h, w, -1)
        return batch


def reshape_anchor_preds(batch, num_class, code_size=7, nbins=2):
    """(B, H, W, A*X) -> (B, H*W*A, X) flat anchor-major layout matching the
    concat order of build_anchors (class-blocked anchors per location)."""
    cls = batch["cls_preds_raw"]
    b, h, w, _ = cls.shape

    def flat(t, x):
        return t.reshape(b, h * w, -1, x).reshape(b, -1, x)

    cls_flat = flat(cls, num_class)  # (B, A_total, C)
    box_flat = flat(batch["box_preds_raw"], code_size)
    dir_flat = (
        flat(batch["dir_cls_preds_raw"], nbins)
        if "dir_cls_preds_raw" in batch
        else None
    )
    return cls_flat, box_flat, dir_flat


def decode_anchor_boxes(batch, anchors_flat, anchor_class_ids, num_class,
                        box_coder: ResidualCoder, dir_cfg=None):
    """Decode per-anchor predictions to boxes + scores + labels (fixed K).

    anchors_flat: (A, 7) concat over classes in the same order as preds.
    anchor_class_ids: (A,) global 1-based class of each anchor.
    """
    cls_flat, box_flat, dir_flat = reshape_anchor_preds(
        batch, num_class, code_size=box_coder.code_size)
    cls_scores = jax.nn.sigmoid(cls_flat)  # (B, A, C)
    scores = cls_scores.max(axis=-1)
    boxes = box_coder.decode(box_flat, anchors_flat[None], xp=jnp)
    if dir_flat is not None and dir_cfg is not None:
        dir_offset = float(dir_cfg.get("DIR_OFFSET", 0.78539))
        dir_limit = float(dir_cfg.get("DIR_LIMIT_OFFSET", 0.0))
        nbins = int(dir_cfg.get("NUM_DIR_BINS", 2))
        dir_labels = dir_flat.argmax(axis=-1)
        period = 2 * jnp.pi / nbins
        rot = boxes[..., 6] - dir_offset
        rot = rot - jnp.floor(rot / period + dir_limit) * period
        boxes = boxes.at[..., 6].set(rot + dir_offset + period * dir_labels)
    labels = cls_scores.argmax(axis=-1).astype(jnp.int32) + 1
    return boxes, scores, labels


def anchor_post_process(boxes, scores, labels, nms_cfg, score_thresh=0.1,
                        num_classes: int | None = None):
    """Score filter + topk-presort + rotated NMS, fixed shapes.

    MULTI_CLASSES_NMS (model_nms_utils.multi_classes_nms role) suppresses
    within each class independently; requires num_classes."""
    from ...ops.nms import multi_class_nms_bev

    pre = int(nms_cfg.get("NMS_PRE_MAXSIZE", 4096))
    post = int(nms_cfg.get("NMS_POST_MAXSIZE", 500))
    multi = bool(nms_cfg.get("MULTI_CLASSES_NMS", False)) and num_classes

    def one(bx, sc, lb):
        k = min(pre, sc.shape[0])
        top_sc, idx = jax.lax.top_k(sc, k)
        top_bx, top_lb = bx[idx], lb[idx]
        valid = top_sc > score_thresh
        if multi:
            sel, sel_valid = multi_class_nms_bev(
                top_bx, top_sc, top_lb, valid, int(num_classes),
                float(nms_cfg["NMS_THRESH"]), post)
        else:
            sel, sel_valid = nms_bev(
                top_bx, top_sc, valid, float(nms_cfg["NMS_THRESH"]), post)
        return top_bx[sel], top_sc[sel], top_lb[sel], sel_valid

    return jax.vmap(one)(boxes, scores, labels)
