"""Voxel-RCNN head with real voxel-query grid pooling
(pcdet/models/roi_heads/voxelrcnn_head.py:1-262).

Each RoI hosts a GRID_SIZE^3 lattice; each grid point voxel-queries the
backbone's multi-scale sparse feature volumes (x_conv2/3/4), groups the
neighbor voxel features with relative voxel-center offsets, pools with a
mini-PointNet per scale, and feeds shared FCs + cls/reg branches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ...utils.registry import ROI_HEADS
from ..layers import MaskedBatchNorm
from ..pfe import PointNetBlock
from .pvrcnn_head import roi_grid_points

STRIDE_OF = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}


@ROI_HEADS.register
class VoxelRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)
    voxel_size: tuple = (0.05, 0.05, 0.1)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        pool_cfg = cfg["ROI_GRID_POOL"]
        g = int(pool_cfg.get("GRID_SIZE", 6))
        sources = list(pool_cfg.get("FEATURES_SOURCE",
                                    ["x_conv2", "x_conv3", "x_conv4"]))
        rois = jax.lax.stop_gradient(batch["rois"])  # (B, R, 7)
        multi = batch["multi_scale_3d_features"]
        b, r = rois.shape[:2]
        g3 = g**3

        grid = jax.vmap(lambda ro: roi_grid_points(ro, g))(rois)  # (B,R,G3,3)
        grid = grid.reshape(b, r * g3, 3)

        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        pooled_all = []
        for src in sources:
            feats, coords, valid, sgrid = multi[src]
            stride = STRIDE_OF[src]
            lcfg = pool_cfg["POOL_LAYERS"][src]
            nsample = int(lcfg.get("NSAMPLE", [16])[0])
            qr = int(lcfg.get("QUERY_RANGES", [[4, 4, 4]])[0][0])
            radius = float(lcfg.get("POOL_RADIUS", [0.4])[0])
            mlps = tuple(lcfg.get("MLPS", [[32, 32]])[0])
            cell_zyx = (vz * stride, vy * stride, vx * stride)

            qv = jnp.stack(
                [
                    (grid[..., 2] - z0) / (vz * stride),
                    (grid[..., 1] - y0) / (vy * stride),
                    (grid[..., 0] - x0) / (vx * stride),
                ],
                axis=-1,
            )  # (B, R*G3, 3) zyx voxel space

            def query_one(f, c, v, q):
                idx, empty, slot = sp.voxel_query(
                    q, c, v, sgrid, max_range=qr, nsample=nsample,
                    cell_zyx=cell_zyx, radius_world=radius)
                nf = f[idx]  # (S, K, C)
                centers = c[idx].astype(f.dtype)  # zyx voxel coords
                return nf, centers, empty, slot

            nf, centers, empty, slot = jax.vmap(query_one)(feats, coords,
                                                           valid, qv)
            # relative offsets in world scale (voxel centers - grid point)
            cw = jnp.stack(
                [
                    centers[..., 2] * (vx * stride) + vx * stride / 2 + x0,
                    centers[..., 1] * (vy * stride) + vy * stride / 2 + y0,
                    centers[..., 0] * (vz * stride) + vz * stride / 2 + z0,
                ],
                axis=-1,
            )
            rel = cw - grid[:, :, None, :]
            grouped = jnp.concatenate([rel, nf], axis=-1)
            if pool_cfg.get("PRE_MLP", False) and len(mlps) == 2:
                # Reference factorization (voxel_pool_modules.py:90-126):
                # per-neighbor fused layer + relu -> MAX over neighbors ->
                # out Dense+BN+relu on the POOLED grid point.  pre_{src}
                # is the exact eval fold of the reference's mlps_in +
                # mlps_pos BN pairs (utils/torch_import.fold_voxelrcnn_pool);
                # running the out MLP after the max matches the reference
                # math and cuts its cost from S*K rows to S.  Deviation:
                # empty balls pool to zero here, while the reference feeds
                # its BN biases through (a learned constant).
                h = nn.relu(nn.Dense(mlps[0], name=f"pre_{src}")(grouped))
                h = jnp.where(slot[..., None], h, 0.0)  # pad slots (h >= 0)
                pooled = h.max(axis=2)  # (B, S, C0)
                pooled = nn.Dense(mlps[1], use_bias=False,
                                  name=f"out_{src}")(pooled)
                pooled = MaskedBatchNorm(name=f"out_bn_{src}")(
                    pooled, mask=~empty, use_running_average=not train)
                pooled = nn.relu(pooled)
                pooled *= (~empty)[..., None].astype(pooled.dtype)
            else:
                if pool_cfg.get("PRE_MLP", False):
                    grouped = nn.relu(
                        nn.Dense(mlps[0], name=f"pre_{src}")(grouped))
                bsz, s_, k_, c_ = grouped.shape
                pooled = PointNetBlock(mlps, name=f"pool_{src}")(
                    grouped.reshape(bsz * s_, k_, c_), empty.reshape(-1),
                    train, slot_valid=slot.reshape(bsz * s_, k_)
                ).reshape(bsz, s_, -1)
            pooled_all.append(pooled)

        x = jnp.concatenate(pooled_all, axis=-1).reshape(b, r, -1)

        for i, ch in enumerate(list(cfg.get("SHARED_FC", [256, 256]))):
            x = nn.Dense(ch, use_bias=False, name=f"shared_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"shared_bn_{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
            if cfg.get("DP_RATIO", 0) > 0 and i != len(cfg.get("SHARED_FC")) - 1:
                x = nn.Dropout(float(cfg["DP_RATIO"]),
                               deterministic=not train)(x)

        def fc_branch(x, fcs, out_ch, name):
            for i, ch in enumerate(fcs):
                x = nn.Dense(ch, use_bias=False, name=f"{name}_fc_{i}")(x)
                x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
                    x, use_running_average=not train)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{name}_out")(x)

        batch["rcnn_cls"] = fc_branch(
            x, list(cfg.get("CLS_FC", [256, 256])), self.num_class, "cls")[..., 0]
        batch["rcnn_reg"] = fc_branch(
            x, list(cfg.get("REG_FC", [256, 256])), 7, "reg")
        return batch
