"""PV-RCNN second stage: RoI-grid pooling over keypoints + refinement head.

Role of pcdet/models/roi_heads/pvrcnn_head.py:8-175 (RoI-grid pooling via
pointnet2_stack) re-expressed with the jittable pointnet2 ops: each RoI hosts
a GRID_SIZE^3 lattice of grid points; each grid point ball-queries the VSA
keypoints; a mini PointNet pools neighbors; flattened grid features feed
shared FCs and cls/reg branches.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import pointnet2 as pn2
from ...utils.registry import ROI_HEADS
from ..layers import MaskedBatchNorm
from ..pfe import PointNetBlock


def _fc_branch(cfg, x, out_ch: int, name: str, train: bool):
    """CLS_FC / REG_FC branch stack + output layer, reference
    make_fc_layers parity (roi_head_template.py:29-43): Dense+BN+ReLU per
    entry with Dropout(DP_RATIO) after the FIRST layer only, then the
    biased output Dense.  An empty/absent FC list degrades to the bare
    output layer."""
    dp = float(cfg.get("DP_RATIO", 0.0))
    for i, ch in enumerate(list(cfg.get(f"{name.upper()}_FC", []))):
        x = nn.Dense(ch, use_bias=False, name=f"{name}_fc_{i}")(x)
        x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
            x, use_running_average=not train)
        x = nn.relu(x)
        if dp > 0 and i == 0:
            x = nn.Dropout(dp, deterministic=not train)(x)
    return nn.Dense(out_ch, name=f"rcnn_{name}")(x)


def roi_grid_points(rois, grid_size: int):
    """(R, 7) rois -> (R, G^3, 3) world-frame grid point coordinates."""
    g = grid_size
    idx = np.stack(np.meshgrid(*([np.arange(g)] * 3), indexing="ij"), -1).reshape(-1, 3)
    frac = jnp.asarray((idx + 0.5) / g - 0.5, jnp.float32)  # (-0.5, 0.5)
    local = frac[None, :, :] * rois[:, None, 3:6]
    cos, sin = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    x = local[..., 0] * cos[:, None] - local[..., 1] * sin[:, None]
    y = local[..., 0] * sin[:, None] + local[..., 1] * cos[:, None]
    out = jnp.stack([x, y, local[..., 2]], axis=-1)
    return out + rois[:, None, :3]


@ROI_HEADS.register
class PVRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        grid_size = int(cfg.get("ROI_GRID_POOL", {}).get("GRID_SIZE", 6))
        radius = float(cfg.get("ROI_GRID_POOL", {}).get("RADIUS", 0.8))
        nsample = int(cfg.get("ROI_GRID_POOL", {}).get("NSAMPLE", 16))
        mlps = tuple(cfg.get("ROI_GRID_POOL", {}).get("MLPS", [[64, 64]])[0])
        fc_sizes = list(cfg.get("SHARED_FC", [256, 256]))
        code_size = 7

        rois = batch["rois"]  # (B, R, 7)
        kp = batch["point_coords"]  # (B, S, 3)
        kp_feats = batch["point_features"]  # (B, S, C)
        kp_valid = batch.get("point_valid")
        b, r = rois.shape[:2]

        block = PointNetBlock(mlps, name="roi_grid_pointnet")

        def pool_one(roi, kpts, kfeat, kvalid):
            grid = roi_grid_points(roi, grid_size)  # (R, G3, 3)
            g3 = grid.shape[1]
            grouped, idx, empty, slot = pn2.query_and_group(
                radius, nsample, kpts, grid.reshape(-1, 3), kfeat, valid=kvalid
            )
            return grouped, empty, slot

        grouped, empty, slot = jax.vmap(pool_one)(rois, kp, kp_feats, kp_valid)
        gshape = grouped.shape  # (B, R*G3, K, C)
        pooled = block(grouped.reshape(-1, *gshape[2:]), empty.reshape(-1),
                       train, slot_valid=slot.reshape(-1, gshape[2]))
        g3 = grid_size**3
        pooled = pooled.reshape(b, r, g3 * pooled.shape[-1])

        x = pooled
        for i, ch in enumerate(fc_sizes):
            x = nn.Dense(ch, use_bias=False, name=f"shared_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"shared_bn_{i}")(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        batch["rcnn_cls"] = _fc_branch(
            cfg, x, self.num_class, "cls", train)[..., 0]
        batch["rcnn_reg"] = _fc_branch(cfg, x, code_size, "reg", train)
        return batch


# VoxelRCNNHead lives in voxelrcnn_head.py (real voxel-query grid pooling).


@ROI_HEADS.register
class PVRCNNPlusPlusHead(nn.Module):
    """PV-RCNN++ RoI head: grid points aggregate keypoint features through
    VectorPool local-structure pooling instead of ball-query PointNets
    (pvrcnn_head.py with VectorPoolAggregationModuleMSG, pointnet2_stack
    vector_pool ops)."""

    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        pool_cfg = cfg.get("ROI_GRID_POOL", {})
        grid_size = int(pool_cfg.get("GRID_SIZE", 6))
        groups_cfg = pool_cfg.get("GROUPS", [
            {"NUM_LOCAL_VOXEL": [2, 2, 2], "MAX_NEIGHBOR_DISTANCE": 0.8,
             "NEIGHBOR_NSAMPLE": 32, "POST_MLPS": [64, 64]},
            {"NUM_LOCAL_VOXEL": [3, 3, 3], "MAX_NEIGHBOR_DISTANCE": 1.6,
             "NEIGHBOR_NSAMPLE": 32, "POST_MLPS": [64, 64]},
        ])
        agg_type = pool_cfg.get("LOCAL_AGGREGATION_TYPE", "local_interpolation")
        fc_sizes = list(cfg.get("SHARED_FC", [256, 256]))

        rois = batch["rois"]
        kp = batch["point_coords"]
        kp_feats = batch["point_features"]
        kp_valid = batch.get("point_valid")
        if kp_valid is None:
            kp_valid = jnp.ones(kp.shape[:2], bool)
        b, r = rois.shape[:2]
        g3 = grid_size**3

        grids = jax.vmap(lambda ro: roi_grid_points(ro, grid_size))(rois)
        grids = grids.reshape(b, r * g3, 3)

        group_feats = []
        for gi, gc in enumerate(groups_cfg):
            def pool_one(k, f, v, q, gc=gc):
                return pn2.vector_pool_features(
                    k, f, v, q, gc["NUM_LOCAL_VOXEL"],
                    float(gc["MAX_NEIGHBOR_DISTANCE"]),
                    int(gc.get("NEIGHBOR_NSAMPLE", 32)), agg_type)

            pooled, empty = jax.vmap(pool_one)(kp, kp_feats, kp_valid, grids)
            x = pooled
            for li, ch in enumerate(list(gc.get("POST_MLPS", [64]))):
                x = nn.Dense(ch, use_bias=False, name=f"g{gi}_mlp_{li}")(x)
                x = MaskedBatchNorm(name=f"g{gi}_bn_{li}")(
                    x, mask=~empty, use_running_average=not train)
                x = nn.relu(x)
            group_feats.append(x * (~empty)[..., None].astype(x.dtype))

        x = jnp.concatenate(group_feats, axis=-1)  # (B, R*G3, C)
        x = x.reshape(b, r, g3 * x.shape[-1])
        for i, ch in enumerate(fc_sizes):
            x = nn.Dense(ch, use_bias=False, name=f"shared_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"shared_bn_{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        batch["rcnn_cls"] = _fc_branch(
            cfg, x, self.num_class, "cls", train)[..., 0]
        batch["rcnn_reg"] = _fc_branch(cfg, x, 7, "reg", train)
        return batch
