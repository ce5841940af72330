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


def conf_shape_for(model_cfg, class_names):
    """(num_class, num_groups) of the curriculum confidence tensor.

    head_zoo parity: 3-class head -> (3, 96); single-class Vehicle -> (1, 96);
    single-class Pedestrian/Cyclist -> (1, 15)."""
    n = len(class_names)
    groups = 96 if ("Vehicle" in class_names or n > 1) else 15
    return (n, groups)


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

    gt_boxes = batch["gt_boxes"]
    npgt = batch.get("num_points_in_gt", jnp.zeros(gt_boxes.shape[:2]))
    if is_cur and "true_object" in batch:
        group = cluster_com_groups(
            gt_boxes,
            batch["true_object"],
            batch.get("occupancy_ratio", jnp.zeros(gt_boxes.shape[:2])),
            batch.get("facade_type", jnp.zeros(gt_boxes.shape[:2])),
        )
    else:
        group = jnp.zeros(gt_boxes.shape[:2], jnp.int32)

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


def make_train_step(net, model_cfg, class_names, meta, tx, fmap_hw):
    """Build the jittable train step: (state, batch, epoch) -> (state, metrics)."""

    def train_step(state: TrainState, batch: dict, epoch):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mut = net.apply(variables, dict(batch), train=True, mutable=["batch_stats"])
            loss, new_cur, aux_list, tb = compute_centerpoint_loss(
                out, model_cfg, class_names, meta, state.curriculum, epoch, fmap_hw
            )
            return loss, (mut["batch_stats"], new_cur, aux_list, tb)

        (loss, (bs, new_cur, aux_list, tb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=bs,
            opt_state=opt_state,
            curriculum=new_cur,
        )
        conf_sum = sum(a.confidence_sum for a in aux_list)
        conf_cnt = sum(a.confidence_cnt for a in aux_list)
        metrics = {"loss": loss, **tb,
                   "confidence_sum": conf_sum, "confidence_cnt": conf_cnt}
        return new_state, metrics

    return train_step
