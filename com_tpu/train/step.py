"""The jitted train/eval step for CenterPoint-family detectors.

One pure function replaces the reference's train_one_epoch inner body
(tools/train_utils/train_utils.py:12-123): forward, target assignment,
COM/plain losses, grad clip, optimizer update, curriculum statistics — all
inside a single jit/pjit program.  Under a batch-sharded mesh the batch
reductions (loss normalizers, EMA stats, per-group confidence sums) become
global automatically; the reference needed explicit NCCL all_gathers for the
same numbers (loss_utils.py:1065-1069, train_utils.py:269-289).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..losses.centernet import (
    focal_loss_centernet,
    reg_loss_centernet,
    sigmoid_clamped,
)
from ..losses.curriculum import (
    CurriculumAux,
    focal_loss_center_curriculum,
    group_confidences,
)
from ..models.dense_heads.target_assign import (
    assign_centerpoint_targets,
    cluster_com_groups,
)
from .state import TrainState

HEAD_ORDER_DEFAULT = ("center", "center_z", "dim", "rot")


def _head_groups(model_cfg, class_names):
    groups = []
    for names in model_cfg["DENSE_HEAD"]["CLASS_NAMES_EACH_HEAD"]:
        groups.append(tuple(class_names.index(n) + 1 for n in names if n in class_names))
    return groups


def _is_curriculum_head(model_cfg):
    return "LOSS_CURRICULUM" in model_cfg.get("DENSE_HEAD", {})


_VEHICLE_NAMES = ("vehicle", "car", "truck", "bus", "van", "trailer",
                  "construction_vehicle")


def vehicle_class_ids(class_names):
    """Global 1-based ids of classes using the 96-group vehicle scheme.

    Case-insensitive: Waymo/KITTI capitalize (Vehicle, Car) while the
    nuScenes/Lyft taxonomies are lowercase (car, truck, bus, ...)."""
    return tuple(i + 1 for i, n in enumerate(class_names)
                 if str(n).lower() in _VEHICLE_NAMES)


def conf_shape_for(model_cfg, class_names):
    """(num_class, num_groups) of the curriculum confidence tensor.

    head_zoo parity: 3-class head -> (3, 96); single-class Vehicle (or any
    vehicle-like class, e.g. KITTI Car) -> (1, 96); single-class
    Pedestrian/Cyclist -> (1, 15)."""
    n = len(class_names)
    groups = 96 if (vehicle_class_ids(class_names) or n > 1) else 15
    return (n, groups)


def com_groups_for(batch, gt_boxes, is_cur, class_names):
    """Per-object COM group ids, or zeros when the curriculum is off /
    the COM side-arrays are absent (shared by the center and anchor
    loss paths)."""
    if is_cur and "true_object" in batch:
        return cluster_com_groups(
            gt_boxes,
            batch["true_object"],
            batch.get("occupancy_ratio", jnp.zeros(gt_boxes.shape[:2])),
            batch.get("facade_type", jnp.zeros(gt_boxes.shape[:2])),
            vehicle_ids=vehicle_class_ids(class_names) or (-1,),
        )
    return jnp.zeros(gt_boxes.shape[:2], jnp.int32)


def compute_centerpoint_loss(
    batch,
    model_cfg,
    class_names,
    meta,
    curriculum_states,
    epoch,
    fmap_hw,
):
    """Loss over all head groups.  Returns (loss, new_states, aux_list, tb)."""
    head_cfg = model_cfg["DENSE_HEAD"]
    ta_cfg = head_cfg["TARGET_ASSIGNER_CONFIG"]
    lw = head_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    stride = int(ta_cfg.get("FEATURE_MAP_STRIDE", 1))
    curriculum_cfg = head_cfg.get("LOSS_CURRICULUM", None)
    is_cur = curriculum_cfg is not None
    num_class, num_groups = conf_shape_for(model_cfg, class_names)

    # the heatmap's own spatial dims are authoritative (fmap_hw argument can
    # disagree for stride>1 heads, e.g. CenterPoint-voxel at stride 8)
    hm0 = batch["pred_dicts"][0]["hm"]
    fmap_hw = (int(hm0.shape[1]), int(hm0.shape[2]))

    gt_boxes = batch["gt_boxes"]
    npgt = batch.get("num_points_in_gt", jnp.zeros(gt_boxes.shape[:2]))
    group = com_groups_for(batch, gt_boxes, is_cur, class_names)

    fmap_h, fmap_w = fmap_hw
    total = 0.0
    new_states = []
    aux_list = []
    tb = {}
    for idx, (pred_dict, class_ids) in enumerate(
        zip(batch["pred_dicts"], _head_groups(model_cfg, class_names))
    ):
        targets = assign_centerpoint_targets(
            gt_boxes,
            npgt,
            group,
            class_ids,
            fmap_h,
            fmap_w,
            meta.point_cloud_range,
            meta.voxel_size,
            stride,
            gaussian_overlap=float(ta_cfg.get("GAUSSIAN_OVERLAP", 0.1)),
            min_radius=int(ta_cfg.get("MIN_RADIUS", 2)),
            min_points=int(ta_cfg.get("MIN_POINTS", 0)),
            epoch_gate=jnp.asarray(epoch) <= int(ta_cfg.get("EPOCH_THRED", 100)),
        )
        hm = sigmoid_clamped(pred_dict["hm"])
        if is_cur:
            hm_loss, new_state, aux = focal_loss_center_curriculum(
                hm,
                targets,
                curriculum_states[idx],
                curriculum_cfg,
                epoch,
                num_class,
                num_groups,
            )
            box_mask = aux.box_mask
        else:
            hm_loss = focal_loss_centernet(hm, targets.heatmaps)
            new_state = curriculum_states[idx] if curriculum_states else None
            conf_sum, conf_cnt = group_confidences(hm, targets, num_class, num_groups)
            aux = CurriculumAux(
                confidence_sum=conf_sum,
                confidence_cnt=conf_cnt,
                avg_confidence=jnp.zeros(()),
                box_mask=targets.mask,
            )
            box_mask = targets.mask
        hm_loss = hm_loss * float(lw.get("cls_weight", 1.0))

        head_order = tuple(head_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])
        pred_boxes = jnp.concatenate([pred_dict[n] for n in head_order], axis=-1)
        reg = reg_loss_centernet(pred_boxes, targets.inds, targets.target_boxes, box_mask)
        code_w = jnp.asarray(lw["code_weights"], reg.dtype)
        loc_loss = (reg * code_w).sum() * float(lw.get("loc_weight", 2.0))

        total = total + hm_loss + loc_loss
        new_states.append(new_state)
        aux_list.append(aux)
        tb[f"hm_loss_head_{idx}"] = hm_loss
        tb[f"loc_loss_head_{idx}"] = loc_loss
        tb[f"confidence_head_{idx}"] = aux.avg_confidence
    return total, tuple(new_states), aux_list, tb


def compute_anchor_loss(batch, model_cfg, class_names, meta, curriculum_states, epoch):
    """Anchor-path loss (anchor_head_template get_loss + curriculum variants).

    cls: (curriculum) sigmoid focal over (B, A, C) one-hot; reg: smooth-L1 with
    sin-difference heading encoding, weighted by the per-anchor curriculum
    weight; dir: CE over direction bins, same weighting
    (anchor_head_curriculum.py:150-256 parity).
    """
    from ..losses.anchor_losses import (
        AnchorCurriculumState,
        anchor_group_confidences,
        curriculum_sigmoid_focal_loss,
        sigmoid_focal_loss,
        weighted_cross_entropy,
        weighted_smooth_l1,
    )
    from ..models.dense_heads.anchor_assign import assign_anchor_targets
    from ..models.dense_heads.anchor_head import build_anchors, reshape_anchor_preds
    from ..ops.boxes import ResidualCoder

    head_cfg = model_cfg["DENSE_HEAD"]
    lw = head_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    curriculum_cfg = head_cfg.get("LOSS_CURRICULUM", None)
    is_cur = curriculum_cfg is not None
    num_class = len(class_names)
    # the per-(class, group) confidence tensor must match the TrainState
    # accumulators (conf_shape_for), not a hardcoded 96: single-class
    # Pedestrian/Cyclist/Car-free configs run 15 groups
    _, num_groups = conf_shape_for(model_cfg, class_names)

    anchors_flat, per_class_index, matched, unmatched, class_ids = build_anchors(
        head_cfg, list(class_names), meta.grid_size, meta.point_cloud_range
    )
    coder_cfg = head_cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
        "BOX_CODER_CONFIG", {})
    coder = ResidualCoder(
        code_size=int(coder_cfg.get("code_size", 7)),
        encode_angle_by_sincos=bool(
            coder_cfg.get("encode_angle_by_sincos", False)),
    )

    gt_boxes = batch["gt_boxes"]
    group = com_groups_for(batch, gt_boxes, is_cur, class_names)

    ta_cfg = head_cfg.get("TARGET_ASSIGNER_CONFIG", {})
    if ta_cfg.get("NAME") == "ATSSTargetAssigner":
        from ..models.dense_heads.anchor_assign import atss_assign_targets

        targets = atss_assign_targets(
            jnp.asarray(anchors_flat), gt_boxes,
            topk=int(ta_cfg.get("TOPK", 9)), box_coder=coder,
            match_height=bool(ta_cfg.get("MATCH_HEIGHT", False)),
        )
    else:
        targets = assign_anchor_targets(
            anchors_flat, per_class_index, gt_boxes, group, class_ids,
            matched, unmatched, coder,
        )
    cls_flat, box_flat, dir_flat = reshape_anchor_preds(
        batch, num_class, code_size=coder.code_size)
    b = cls_flat.shape[0]

    labels = targets.box_cls_labels
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_w = (negatives.astype(jnp.float32) + positives.astype(jnp.float32))
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
    cls_w = cls_w / pos_norm * cared.astype(jnp.float32)
    one_hot = jax.nn.one_hot(jnp.where(cared, labels, 0), num_class + 1)[..., 1:]

    # per-anchor group ids spread into the one-hot class layout
    groups_oh = one_hot.astype(jnp.int32) * targets.groups[..., None]

    aux_states = []
    if is_cur:
        state0 = curriculum_states[0] if curriculum_states else AnchorCurriculumState.create(num_class)
        cls_loss_src, cw, new_state, (conf_sum, conf_cnt) = curriculum_sigmoid_focal_loss(
            cls_flat, one_hot, cls_w, groups_oh, state0, curriculum_cfg, epoch,
            num_groups=num_groups,
        )
        # reduce per-class weight to per-anchor (reference squeezes the class
        # dim for its single-class configs; multi-class uses the max)
        cw_anchor = cw.max(axis=-1)
        aux_states.append(new_state)
    else:
        cls_loss_src = sigmoid_focal_loss(cls_flat, one_hot, cls_w)
        conf_sum, conf_cnt = anchor_group_confidences(
            jax.nn.sigmoid(cls_flat), groups_oh, num_class, num_groups
        )
        cw_anchor = jnp.ones_like(cls_w)
        if curriculum_states:
            aux_states.append(curriculum_states[0])
    cls_loss = cls_loss_src.sum() / b * float(lw.get("cls_weight", 1.0))

    # sin-difference heading encoding (add_sin_difference parity)
    anchors_b = jnp.asarray(anchors_flat)[None]
    p6, t6 = box_flat[..., 6:7], targets.box_reg_targets[..., 6:7]
    box_p = jnp.concatenate(
        [box_flat[..., :6], jnp.sin(p6) * jnp.cos(t6), box_flat[..., 7:]], axis=-1
    )
    box_t = jnp.concatenate(
        [targets.box_reg_targets[..., :6], jnp.cos(p6) * jnp.sin(t6),
         targets.box_reg_targets[..., 7:]], axis=-1
    )
    loc_src = weighted_smooth_l1(
        box_p, box_t, targets.reg_weights * cw_anchor,
        code_weights=lw.get("code_weights"),
    )
    loc_loss = loc_src.sum() / b * float(lw.get("loc_weight", 2.0))

    total = cls_loss + loc_loss
    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    if dir_flat is not None:
        dir_offset = float(head_cfg.get("DIR_OFFSET", 0.78539))
        nbins = int(head_cfg.get("NUM_DIR_BINS", 2))
        rot_gt = targets.box_reg_targets[..., 6] + anchors_b[..., 6]
        off = rot_gt - dir_offset
        off = off - jnp.floor(off / (2 * jnp.pi)) * (2 * jnp.pi)
        dir_t = jnp.clip((off / (2 * jnp.pi / nbins)).astype(jnp.int32), 0, nbins - 1)
        dir_oh = jax.nn.one_hot(dir_t, nbins)
        dw = positives.astype(jnp.float32)
        dw = dw / jnp.clip(dw.sum(axis=-1, keepdims=True), 1.0, None)
        dir_loss = weighted_cross_entropy(dir_flat, dir_oh, dw * cw_anchor)
        dir_loss = dir_loss.sum() / b * float(lw.get("dir_weight", 0.2))
        total = total + dir_loss
        tb["rpn_loss_dir"] = dir_loss

    aux = CurriculumAux(
        confidence_sum=conf_sum, confidence_cnt=conf_cnt,
        avg_confidence=jnp.zeros(()), box_mask=targets.reg_weights,
    )
    return total, tuple(aux_states), [aux], tb


def compute_roi_loss(batch, model_cfg):
    """Second-stage losses (roi_head_template.py:150-261 role): BCE on the
    IoU-derived soft cls labels + smooth-L1 on canonical-frame reg targets
    for foreground RoIs."""
    from ..losses.anchor_losses import sigmoid_ce_with_logits, weighted_smooth_l1

    lw = model_cfg.get("ROI_HEAD", {}).get("LOSS_CONFIG", {}).get(
        "LOSS_WEIGHTS", {}
    )
    t = batch["roi_targets"]
    cls_logit = batch["rcnn_cls"]  # (B, R)
    valid = t.cls_labels >= 0
    labels = jnp.clip(t.cls_labels, 0.0, 1.0)
    cls_loss = sigmoid_ce_with_logits(cls_logit, labels)
    cls_loss = (cls_loss * valid).sum() / jnp.clip(valid.sum(), 1.0, None)
    cls_loss = cls_loss * float(lw.get("rcnn_cls_weight", 1.0))

    fg = t.reg_valid.astype(jnp.float32)
    reg = weighted_smooth_l1(batch["rcnn_reg"], t.reg_targets, fg)
    reg_loss = reg.sum() / jnp.clip(fg.sum(), 1.0, None)
    reg_loss = reg_loss * float(lw.get("rcnn_reg_weight", 1.0))
    tb = {"rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss}
    total = cls_loss + reg_loss

    loss_cfg = model_cfg.get("ROI_HEAD", {}).get("LOSS_CONFIG", {})
    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        # decode fg refinements in world frame and penalize corner distance
        # vs the matched GT (roi_head_template.py:230-247)
        from ..ops.boxes import corner_loss as corner_loss_fn

        rois = t.rois.reshape(-1, 7)
        reg_pred = batch["rcnn_reg"].reshape(-1, batch["rcnn_reg"].shape[-1])
        lx, ly = reg_pred[:, 0], reg_pred[:, 1]
        cos, sin = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
        gx = lx * cos - ly * sin + rois[:, 0]
        gy = lx * sin + ly * cos + rois[:, 1]
        boxes = jnp.stack(
            [gx, gy, reg_pred[:, 2] + rois[:, 2],
             reg_pred[:, 3] + rois[:, 3], reg_pred[:, 4] + rois[:, 4],
             reg_pred[:, 5] + rois[:, 5], reg_pred[:, 6] + rois[:, 6]],
            axis=-1)
        per = corner_loss_fn(boxes, t.gt_of_rois_src.reshape(-1, 7), xp=jnp)
        fgf = fg.reshape(-1)
        c_loss = (per * fgf).sum() / jnp.clip(fgf.sum(), 1.0, None)
        c_loss = c_loss * float(lw.get("rcnn_corner_weight", 1.0))
        total = total + c_loss
        tb["rcnn_loss_corner"] = c_loss
    return total, tb


def is_anchor_head(model_cfg) -> bool:
    return "ANCHOR_GENERATOR_CONFIG" in model_cfg.get("DENSE_HEAD", {})


def device_batch_keys(model_cfg) -> set:
    """The batch keys the model/loss actually consume.  Shipping unused
    arrays to the device wastes tunnel bandwidth and — worse — anything with
    a data-dependent shape would retrigger compilation."""
    keys = {"gt_boxes", "num_points_in_gt", "true_object", "occupancy_ratio",
            "facade_type"}
    vfe = model_cfg.get("VFE", {}).get("NAME", "")
    if vfe.startswith("Dynamic") or model_cfg.get("VFE", {}).get(
            "VOXELIZE_ON_DEVICE"):
        keys |= {"points", "points_mask"}
    elif vfe == "ImageVFE":
        keys |= {"images", "depth_maps", "trans_lidar_to_cam",
                 "trans_cam_to_img", "gt_boxes2d", "image_shape"}
    else:
        keys |= {"voxels", "voxel_coords", "voxel_num_points"}
    if model_cfg.get("PFE") is not None:  # keypoint abstraction reads raw points
        keys |= {"points", "points_mask"}
    if model_cfg.get("BACKBONE_3D", {}).get("USE_IMG"):
        # focal multimodal fusion: image features gathered at projected
        # voxel centers, with the world augs reversed
        keys |= {"images", "image_shape", "trans_lidar_to_cam",
                 "trans_cam_to_img", "noise_rot", "noise_scale",
                 "flip_x", "flip_y"}
    return keys


def make_train_step(net, model_cfg, class_names, meta, tx, fmap_hw, seed=17):
    """Build the jittable train step: (state, batch, epoch) -> (state, metrics).

    ``seed`` feeds the per-step RoI-sampling/dropout RNG so runs configured
    with different --seed values draw different streams (the reference gets
    this implicitly from torch's globally seeded RNG, train.py:86-88)."""
    anchor_path = is_anchor_head(model_cfg)

    def train_step(state: TrainState, batch: dict, epoch):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            # per-step keys: RoI fg/bg subsampling + head dropout randomness
            # (reference train_utils relies on torch's global RNG; here the
            # key is folded from the step counter so the step stays pure)
            step_key = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            k_roi, k_drop = jax.random.split(step_key)
            out, mut = net.apply(
                variables, dict(batch), train=True, mutable=["batch_stats"],
                rngs={"roi_sampling": k_roi, "dropout": k_drop})
            if "DENSE_HEAD" not in model_cfg:
                # point-proposal detectors (PointRCNN): no dense-head loss
                zero = jnp.zeros((len(class_names), 1))
                loss = jnp.zeros(())
                new_cur = state.curriculum
                aux_list = [CurriculumAux(zero, zero, jnp.zeros(()),
                                          jnp.zeros((1, 1)))]
                tb = {}
            elif anchor_path:
                loss, new_cur, aux_list, tb = compute_anchor_loss(
                    out, model_cfg, class_names, meta, state.curriculum, epoch
                )
            else:
                loss, new_cur, aux_list, tb = compute_centerpoint_loss(
                    out, model_cfg, class_names, meta, state.curriculum, epoch, fmap_hw
                )
            if "rcnn_cls" in out:  # two-stage: add the refinement losses
                roi_loss, roi_tb = compute_roi_loss(out, model_cfg)
                loss = loss + roi_loss
                tb.update(roi_tb)
            elif "rcnn_iou" in out:  # IoU-scoring stage (SECONDNetIoU)
                from ..models.roi_heads.second_head import second_iou_loss

                iou_loss = second_iou_loss(
                    out, model_cfg.get("ROI_HEAD", {}).get("LOSS_CONFIG", {}))
                loss = loss + iou_loss
                tb["rcnn_loss_iou"] = iou_loss
            if "focal_probs" in out and "gt_boxes" in out:
                from ..models.backbone3d import focal_conv_loss

                f_loss = focal_conv_loss(out, meta.voxel_size,
                                         meta.point_cloud_range)
                loss = loss + f_loss
                tb["loss_box_of_pts"] = f_loss
            if "depth_logits" in out and "depth_maps" in out:
                from ..models.image_vfe import ddn_loss

                d_loss = ddn_loss(out, model_cfg["VFE"])
                loss = loss + d_loss
                tb["ddn_loss"] = d_loss
            if "point_box_preds_raw" in out and "gt_boxes" in out:
                from ..models.dense_heads.point_head import point_head_box_loss

                p_loss, p_tb = point_head_box_loss(
                    out, model_cfg.get("POINT_HEAD", {}))
                loss = loss + p_loss
                tb.update(p_tb)
            # NOT elif: the PartA2-free composition emits BOTH the box
            # branch (REG_FC) and the part offsets — an elif starved the
            # part head of all supervision.  The cls logits are SHARED, so
            # skip the part loss's cls term when the box loss already
            # supervised them (reference computes cls once).
            if "point_part_logits" in out and "gt_boxes" in out:
                from ..models.dense_heads.point_head import point_part_loss

                p_loss, p_tb = point_part_loss(
                    out, include_cls="point_box_preds_raw" not in out)
                loss = loss + p_loss
                tb.update(p_tb)
            elif ("point_cls_scores_raw" in out and "gt_boxes" in out
                  and "point_box_preds_raw" not in out):
                # plain fg/bg point supervision (PointHeadSimple) — heads
                # whose cls logits were already trained by the box or part
                # loss above must not be counted again
                from ..models.dense_heads.point_head import point_head_loss

                p_loss = point_head_loss(out)
                loss = loss + p_loss
                tb["point_loss_cls"] = p_loss
            return loss, (mut["batch_stats"], new_cur, aux_list, tb)

        (loss, (bs, new_cur, aux_list, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        conf_sum = sum(a.confidence_sum for a in aux_list)
        conf_cnt = sum(a.confidence_cnt for a in aux_list)
        # accumulate epoch curriculum stats on device — no per-iter sync.
        # (None stays None: a state created without conf accumulators keeps
        # the same pytree structure across steps)
        acc_sum = None if state.conf_sum is None else state.conf_sum + conf_sum
        acc_cnt = None if state.conf_cnt is None else state.conf_cnt + conf_cnt
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=bs,
            opt_state=opt_state,
            curriculum=new_cur,
            conf_sum=acc_sum,
            conf_cnt=acc_cnt,
        )
        metrics = {"loss": loss, **tb,
                   "confidence_sum": conf_sum, "confidence_cnt": conf_cnt}
        return new_state, metrics

    return train_step
