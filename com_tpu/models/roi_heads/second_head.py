"""SECOND IoU head (pcdet/models/roi_heads/second_head.py:10-188).

Rotated RoI-aligned pooling from the dense BEV feature map: the reference
uses torch affine_grid + grid_sample per batch sample; here the rotated
GxG sample lattice is built directly (same affine math, align_corners=True)
and bilinearly interpolated with 4-corner gathers — fully jittable.
The head predicts a single IoU score per RoI (no box refinement);
boxes pass through unchanged (second_head.py:142-151).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import ROI_HEADS
from ..layers import MaskedBatchNorm


def bilinear_sample(fmap, px, py):
    """fmap (H, W, C); px/py (...,) pixel coords (x along W, y along H).
    Zero padding outside (grid_sample padding_mode='zeros')."""
    h, w, _ = fmap.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            v = fmap[
                jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                jnp.clip(xi, 0, w - 1).astype(jnp.int32),
            ]
            wgt = ((wx if dx else 1 - wx) * (wy if dy else 1 - wy))
            out = out + v * (wgt * inside)[..., None]
    return out


def rotated_roi_grid_sample(fmap, rois, pc_range, voxel_size, downsample,
                            grid_size: int):
    """(H, W, C) BEV map + (R, 7) rois -> (R, G, G, C) pooled features.

    Matches the reference affine_grid construction (second_head.py:90-117):
    sample lattice u,v in linspace(-1, 1, G) (align_corners=True),
    px = cx + ex*(u cos - v sin), py = cy + ey*(u sin + v cos), where
    cx/cy/ex/ey are the box center / half-extents in feature-map pixels.
    """
    g = grid_size
    x1 = (rois[:, 0] - rois[:, 3] / 2 - pc_range[0]) / (voxel_size[0] * downsample)
    x2 = (rois[:, 0] + rois[:, 3] / 2 - pc_range[0]) / (voxel_size[0] * downsample)
    y1 = (rois[:, 1] - rois[:, 4] / 2 - pc_range[1]) / (voxel_size[1] * downsample)
    y2 = (rois[:, 1] + rois[:, 4] / 2 - pc_range[1]) / (voxel_size[1] * downsample)
    cx, ex = (x1 + x2) / 2, (x2 - x1) / 2
    cy, ey = (y1 + y2) / 2, (y2 - y1) / 2
    cos, sin = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])

    lin = jnp.linspace(-1.0, 1.0, g)
    u = lin[:, None].repeat(g, 1).reshape(-1)  # (G*G,) row-major (u, v)
    v = lin[None, :].repeat(g, 0).reshape(-1)
    px = cx[:, None] + ex[:, None] * (u[None] * cos[:, None] - v[None] * sin[:, None])
    py = cy[:, None] + ey[:, None] * (u[None] * sin[:, None] + v[None] * cos[:, None])
    out = bilinear_sample(fmap, px, py)  # (R, G*G, C)
    return out.reshape(rois.shape[0], g, g, -1)


@ROI_HEADS.register
class SECONDHead(nn.Module):
    """IoU-scoring second stage (second_head.py)."""

    model_cfg: dict
    num_class: int = 1
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)
    voxel_size: tuple = (0.05, 0.05, 0.1)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        pool = cfg["ROI_GRID_POOL"]
        g = int(pool["GRID_SIZE"])
        ds = float(pool.get("DOWNSAMPLE_RATIO", 8))
        dp = float(cfg.get("DP_RATIO", 0.0))

        rois = jax.lax.stop_gradient(batch["rois"])  # (B, R, 7)
        fmap = jax.lax.stop_gradient(batch["spatial_features_2d"])  # (B,H,W,C)
        b, r = rois.shape[:2]

        pooled = jax.vmap(
            lambda f, ro: rotated_roi_grid_sample(
                f, ro, self.point_cloud_range, self.voxel_size, ds, g)
        )(fmap, rois)  # (B, R, G, G, C)
        x = pooled.reshape(b, r, -1)

        shared_fc = list(cfg.get("SHARED_FC", [256, 256]))
        for i, ch in enumerate(shared_fc):
            x = nn.Dense(ch, use_bias=False, name=f"shared_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"shared_bn_{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
            if dp > 0 and i != len(shared_fc) - 1:  # no dropout after last
                x = nn.Dropout(dp, deterministic=not train)(x)
        for i, ch in enumerate(list(cfg.get("IOU_FC", [256, 256]))):
            x = nn.Dense(ch, use_bias=False, name=f"iou_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"iou_bn_{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        rcnn_iou = nn.Dense(1, name="rcnn_iou")(x)[..., 0]  # (B, R)

        batch["rcnn_iou"] = rcnn_iou
        # boxes pass through; IoU becomes the cls score (second_head.py:142-146)
        batch["batch_box_preds"] = rois
        batch["batch_cls_preds"] = rcnn_iou[..., None]
        batch["cls_preds_normalized"] = False
        return batch


def second_iou_loss(batch, loss_cfg):
    """IoU-regression BCE/L2/smooth-l1 loss (second_head.py:153-188)."""
    iou = batch["rcnn_iou"].reshape(-1)
    t = batch["roi_targets"]
    labels = t.cls_labels.reshape(-1)
    valid = (labels >= 0).astype(jnp.float32)
    kind = loss_cfg.get("IOU_LOSS", "BinaryCrossEntropy")
    if kind == "BinaryCrossEntropy":
        p = jax.nn.sigmoid(iou)
        per = -(labels * jnp.log(jnp.clip(p, 1e-7, 1.0))
                + (1 - labels) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0)))
    elif kind == "L2":
        per = (iou - labels) ** 2
    elif kind == "smoothL1":
        d = jnp.abs(iou - labels)
        beta = 1.0 / 9.0
        per = jnp.where(d < beta, 0.5 * d**2 / beta, d - 0.5 * beta)
    else:
        raise NotImplementedError(kind)
    loss = (per * valid).sum() / jnp.clip(valid.sum(), 1.0, None)
    return loss * float(loss_cfg["LOSS_WEIGHTS"].get("rcnn_iou_weight", 1.0))


def fuse_scores_by_npoints(cls_scores, iou_scores, num_points_in_box,
                           cls_thresh=10, iou_thresh=100):
    """Score fusion by point count (second_net_iou.py:38-57): alpha ramps
    0 -> 1 between cls_thresh and iou_thresh points."""
    alpha = jnp.clip(
        (num_points_in_box - cls_thresh) / (iou_thresh - cls_thresh), 0.0, 1.0)
    return (1 - alpha) * cls_scores + alpha * iou_scores
