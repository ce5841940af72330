"""Box geometry ops, usable with numpy (host pipeline) and jax.numpy (device).

Covers the roles of pcdet/utils/box_utils.py and the points-in-boxes native
kernels (pcdet/ops/roiaware_pool3d): corner extraction, point-in-rotated-box
tests, box enlarging, and point carve-out for GT-paste augmentation.  All
functions are branch-free and written against an array-namespace argument so
one implementation serves the numpy host path and the jittable device path.
"""
from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def boxes_to_corners_bev(boxes, xp=np):
    """(N, 7) [x y z dx dy dz heading] -> (N, 4, 2) BEV corners (ccw)."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., 6]
    # corner template in box frame, counter-clockwise
    tx = xp.stack([dx / 2, -dx / 2, -dx / 2, dx / 2], axis=-1)
    ty = xp.stack([dy / 2, dy / 2, -dy / 2, -dy / 2], axis=-1)
    cos, sin = xp.cos(yaw)[..., None], xp.sin(yaw)[..., None]
    cx = tx * cos - ty * sin + x[..., None]
    cy = tx * sin + ty * cos + y[..., None]
    return xp.stack([cx, cy], axis=-1)


def boxes_to_corners_3d(boxes, xp=np):
    """(N, 7) -> (N, 8, 3) corners; z from center-z +/- dz/2."""
    bev = boxes_to_corners_bev(boxes, xp=xp)  # (N, 4, 2)
    z = boxes[..., 2]
    dz = boxes[..., 5]
    z_lo = (z - dz / 2)[..., None]
    z_hi = (z + dz / 2)[..., None]
    lo = xp.concatenate([bev, xp.broadcast_to(z_lo[..., None], bev.shape[:-1] + (1,))], axis=-1)
    hi = xp.concatenate([bev, xp.broadcast_to(z_hi[..., None], bev.shape[:-1] + (1,))], axis=-1)
    return xp.concatenate([lo, hi], axis=-2)


def points_in_rbbox(points, boxes, xp=np, z_axis=True):
    """(N, 3+) points x (M, 7) boxes -> (N, M) bool containment mask.

    Replaces the roiaware_pool3d points_in_boxes kernels
    (pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu) with a
    rotate-into-box-frame test that vectorizes on the VPU.
    """
    px = points[:, 0][:, None] - boxes[None, :, 0]
    py = points[:, 1][:, None] - boxes[None, :, 1]
    cos = xp.cos(-boxes[:, 6])[None, :]
    sin = xp.sin(-boxes[:, 6])[None, :]
    lx = px * cos - py * sin
    ly = px * sin + py * cos
    in_xy = (xp.abs(lx) <= boxes[None, :, 3] / 2) & (xp.abs(ly) <= boxes[None, :, 4] / 2)
    if not z_axis:
        return in_xy
    pz = points[:, 2][:, None] - boxes[None, :, 2]
    return in_xy & (xp.abs(pz) <= boxes[None, :, 5] / 2)


def enlarge_box3d(boxes, extra_width=(0.0, 0.0, 0.0), xp=np):
    """Grow dx/dy/dz by extra widths (box_utils.enlarge_box3d parity)."""
    out = xp.concatenate(
        [
            boxes[:, :3],
            boxes[:, 3:6] + xp.asarray(extra_width, dtype=boxes.dtype)[None, :],
            boxes[:, 6:],
        ],
        axis=1,
    )
    return out


def remove_points_in_boxes3d(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Host-side carve-out used by GT-paste (box_utils.remove_points_in_boxes3d).

    Uses the native C++ kernel when built (com_tpu.ops.native)."""
    if len(boxes) == 0 or len(points) == 0:
        return points
    try:
        from .native import points_in_rbbox_native

        mask = points_in_rbbox_native(points, boxes[:, :7]).any(axis=1)
    except Exception:
        mask = points_in_rbbox(points[:, :3], boxes[:, :7], xp=np).any(axis=1)
    return points[~mask]


def mask_boxes_outside_range(boxes, limit_range, min_num_corners=1, xp=np):
    """Keep boxes with >= min_num_corners BEV corners inside the range."""
    corners = boxes_to_corners_bev(boxes[:, :7], xp=xp)  # (N, 4, 2)
    lo = xp.asarray(limit_range[:2])
    hi = xp.asarray(limit_range[3:5])
    inside = ((corners >= lo) & (corners <= hi)).all(axis=-1)  # (N, 4)
    return inside.sum(axis=-1) >= min_num_corners


def corner_loss(pred_boxes, gt_boxes, xp=None):
    """Corner alignment loss (loss_utils.get_corner_loss_lidar role): mean
    smooth-L1 over the 8 corner distances, min over the flipped heading."""
    import jax.numpy as _jnp

    xp = xp or _jnp
    pc = boxes_to_corners_3d(pred_boxes, xp=xp)
    gc = boxes_to_corners_3d(gt_boxes, xp=xp)
    flip = xp.concatenate(
        [gt_boxes[..., :6], gt_boxes[..., 6:7] + xp.pi], axis=-1
    )
    gcf = boxes_to_corners_3d(flip, xp=xp)
    d = xp.minimum(
        xp.sqrt(((pc - gc) ** 2).sum(-1) + 1e-8).mean(-1),
        xp.sqrt(((pc - gcf) ** 2).sum(-1) + 1e-8).mean(-1),
    )
    # huber with delta 1
    return xp.where(d < 1.0, 0.5 * d * d, d - 0.5)


class PointResidualCoder:
    """Point-based box coder (box_coder_utils.PointResidualCoder role):
    encodes boxes relative to point positions with class-mean size priors."""

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        self.mean_size = np.asarray(
            mean_size if mean_size is not None
            else [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]],
            np.float32,
        )

    def encode(self, boxes, points, gt_classes, xp=np):
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = (xp.clip(boxes[..., i], 1e-5, None) for i in (3, 4, 5))
        rg = boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            m = xp.asarray(self.mean_size)[gt_classes - 1]
            dxa, dya, dza = m[..., 0], m[..., 1], m[..., 2]
            diag = xp.sqrt(dxa**2 + dya**2)
            xt, yt = (xg - xa) / diag, (yg - ya) / diag
            zt = (zg - za) / dza
            dxt, dyt, dzt = xp.log(dxg / dxa), xp.log(dyg / dya), xp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = xp.log(dxg), xp.log(dyg), xp.log(dzg)
        return xp.stack(
            [xt, yt, zt, dxt, dyt, dzt, xp.cos(rg), xp.sin(rg)], axis=-1
        )

    def decode(self, encodings, points, pred_classes, xp=np):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = (
            encodings[..., i] for i in range(8)
        )
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            m = xp.asarray(self.mean_size)[pred_classes - 1]
            dxa, dya, dza = m[..., 0], m[..., 1], m[..., 2]
            diag = xp.sqrt(dxa**2 + dya**2)
            xg, yg = xt * diag + xa, yt * diag + ya
            zg = zt * dza + za
            dxg, dyg, dzg = xp.exp(dxt) * dxa, xp.exp(dyt) * dya, xp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = xp.exp(dxt), xp.exp(dyt), xp.exp(dzt)
        rg = xp.arctan2(sint, cost)
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class ResidualCoder:
    """SECOND-style 7(+C)-dim anchor box coder (pcdet box_coder_utils.ResidualCoder).

    Works with either numpy or jnp arrays (pass xp).
    """

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors, xp=np):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]
        dxa = xp.clip(dxa, 1e-5, None)
        dya = xp.clip(dya, 1e-5, None)
        dza = xp.clip(dza, 1e-5, None)
        dxg = xp.clip(dxg, 1e-5, None)
        dyg = xp.clip(dyg, 1e-5, None)
        dzg = xp.clip(dzg, 1e-5, None)
        diag = xp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = xp.log(dxg / dxa)
        dyt = xp.log(dyg / dya)
        dzt = xp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [xp.cos(rg) - xp.cos(ra), xp.sin(rg) - xp.sin(ra)]
        else:
            rts = [rg - ra]
        extra = [boxes[..., i] - anchors[..., i] for i in range(7, boxes.shape[-1])]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *extra], axis=-1)

    def decode(self, encodings, anchors, xp=np):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = [
                encodings[..., i] for i in range(8)
            ]
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = [encodings[..., i] for i in range(7)]
        diag = xp.sqrt(dxa**2 + dya**2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = xp.exp(dxt) * dxa
        dyg = xp.exp(dyt) * dya
        dzg = xp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = xp.arctan2(sint + xp.sin(ra), cost + xp.cos(ra))
        else:
            rg = rt + ra
        n_extra = encodings.shape[-1] - (8 if self.encode_angle_by_sincos else 7)
        extra = [
            encodings[..., -(n_extra - i)] + anchors[..., 7 + i] for i in range(n_extra)
        ]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extra], axis=-1)
