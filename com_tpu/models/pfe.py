"""Point feature extraction: VoxelSetAbstraction (PV-RCNN keypoints).

Rebuild of pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:124-440 over
the jittable pointnet2 ops: FPS-sampled keypoints aggregate (a) raw points,
(b) multi-scale sparse-conv voxel features (ball query + max-pooled PointNet
blocks), and (c) bilinear BEV features.  Fixed keypoint/neighbor counts make
everything static-shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pointnet2 as pn2
from ..utils.registry import BACKBONES_3D
from .layers import MaskedBatchNorm


class PointNetBlock(nn.Module):
    """Per-neighbor MLP + max over neighbors (SA-layer mini PointNet)."""

    mlps: tuple

    @nn.compact
    def __call__(self, grouped, empty, train: bool, slot_valid=None):
        # grouped: (S, K, C); slot_valid (S, K) marks real neighbors so the
        # BN statistics exclude zeroed/duplicate-padded rows (at minimum,
        # rows of fully-empty groups)
        mask = slot_valid
        if mask is None:
            mask = jnp.broadcast_to((~empty)[:, None], grouped.shape[:2])
        x = grouped
        for ch in self.mlps:
            x = nn.Dense(ch, use_bias=False)(x)
            x = MaskedBatchNorm()(x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        x = x.max(axis=1)  # (S, C)
        return x * (~empty)[:, None].astype(x.dtype)


@BACKBONES_3D.register
class VoxelSetAbstraction(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple
    voxel_size: tuple
    point_cloud_range: tuple

    def _voxel_centers(self, coords, stride):
        """(V, 3) zyx int coords at a given stride -> world xyz centers."""
        vx, vy, vz = (s * stride for s in self.voxel_size)
        x0, y0, z0 = self.point_cloud_range[:3]
        x = (coords[:, 2].astype(jnp.float32) + 0.5) * vx + x0
        y = (coords[:, 1].astype(jnp.float32) + 0.5) * vy + y0
        z = (coords[:, 0].astype(jnp.float32) + 0.5) * vz + z0
        return jnp.stack([x, y, z], axis=1)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        num_keypoints = int(cfg.get("NUM_KEYPOINTS", 2048))
        nsample = int(cfg.get("NSAMPLE", 16))
        features_source = list(cfg.get("FEATURES_SOURCE",
                                       ["bev", "raw_points", "x_conv3", "x_conv4"]))
        sa_cfg = cfg.get("SA_LAYER", {})

        points = batch["points"]  # (B, N, F)
        pmask = batch["points_mask"]
        b = points.shape[0]

        # keypoints: plain FPS or sectorized-proposal-centric sampling
        # (voxel_set_abstraction.py:206-282 'SPC': restrict to points near
        # RoIs via sample_points_with_roi, then sector_fps)
        sample_method = cfg.get("SAMPLE_METHOD", "FPS")
        spc_cfg = cfg.get("SPC_SAMPLING", {})
        num_sectors = int(spc_cfg.get("NUM_SECTORS", 6))
        roi_radius = float(spc_cfg.get("SAMPLE_RADIUS_WITH_ROI", 1.6))
        rois = batch.get("rois") if sample_method == "SPC" else None

        def sample_one(p, m, ro=None):
            if sample_method == "SPC":
                if ro is not None:
                    roi_valid = jnp.abs(ro[:, 3:6]).sum(-1) > 0
                    m = pn2.sample_points_with_roi(
                        ro[:, :7], roi_valid, p[:, :3], m, roi_radius)
                idx, kv = pn2.sector_fps(p[:, :3], m, num_keypoints,
                                         num_sectors)
                return p[idx, :3], kv
            idx = pn2.farthest_point_sample(p[:, :3], m, num_keypoints)
            return p[idx, :3], m[idx]

        if rois is not None:
            keypoints, kp_valid = jax.vmap(sample_one)(points, pmask, rois)
        else:
            keypoints, kp_valid = jax.vmap(sample_one)(points, pmask)
        batch["point_coords"] = keypoints  # (B, S, 3)

        feats = []
        if "bev" in features_source and "spatial_features" in batch:
            bev = batch["spatial_features"]  # (B, H, W, C)
            stride = int(batch.get("spatial_features_stride", 8))
            vx, vy = self.voxel_size[0] * stride, self.voxel_size[1] * stride
            x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]

            def interp_one(bevmap, kp):
                fx = (kp[:, 0] - x0) / vx - 0.5
                fy = (kp[:, 1] - y0) / vy - 0.5
                x0i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, bevmap.shape[1] - 2)
                y0i = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, bevmap.shape[0] - 2)
                ax = jnp.clip(fx - x0i, 0, 1)[:, None]
                ay = jnp.clip(fy - y0i, 0, 1)[:, None]
                f00 = bevmap[y0i, x0i]
                f01 = bevmap[y0i, x0i + 1]
                f10 = bevmap[y0i + 1, x0i]
                f11 = bevmap[y0i + 1, x0i + 1]
                return (f00 * (1 - ax) * (1 - ay) + f01 * ax * (1 - ay)
                        + f10 * (1 - ax) * ay + f11 * ax * ay)

            feats.append(jax.vmap(interp_one)(bev.astype(jnp.float32), keypoints))

        if "raw_points" in features_source:
            radius = float(sa_cfg.get("raw_points", {}).get("RADIUS", [1.2])[0])
            mlps = tuple(sa_cfg.get("raw_points", {}).get("MLPS", [[16, 16]])[0])
            block = PointNetBlock(mlps, name="sa_raw")

            def group_raw(p, m, kp):
                grouped, idx, empty, slot = pn2.query_and_group(
                    radius, nsample, p[:, :3], kp, p[:, 3:], valid=m
                )
                return grouped, empty, slot

            grouped, empty, slot = jax.vmap(group_raw)(points, pmask, keypoints)
            gshape = grouped.shape
            out = block(grouped.reshape(-1, *gshape[2:]), empty.reshape(-1),
                        train, slot_valid=slot.reshape(-1, gshape[2]))
            feats.append(out.reshape(b, num_keypoints, -1))

        multi = batch.get("multi_scale_3d_features", {})
        for src in features_source:
            if not src.startswith("x_conv") or src not in multi:
                continue
            x, crd, vld, grid = multi[src]
            stride = 2 ** (int(src[-1]) - 1)
            radius = float(sa_cfg.get(src, {}).get("RADIUS", [stride * 0.8])[0])
            mlps = tuple(sa_cfg.get(src, {}).get("MLPS", [[32, 32]])[0])
            block = PointNetBlock(mlps, name=f"sa_{src}")

            def group_voxels(xf, c, v, kp):
                centers = self._voxel_centers(c, stride)
                grouped, idx, empty, slot = pn2.query_and_group(
                    radius, nsample, centers, kp, xf, valid=v
                )
                return grouped, empty, slot

            grouped, empty, slot = jax.vmap(group_voxels)(x, crd, vld, keypoints)
            gshape = grouped.shape
            out = block(grouped.reshape(-1, *gshape[2:]), empty.reshape(-1),
                        train, slot_valid=slot.reshape(-1, gshape[2]))
            feats.append(out.reshape(b, num_keypoints, -1))

        point_features = jnp.concatenate(feats, axis=-1)
        out_ch = int(cfg.get("NUM_OUTPUT_FEATURES", 128))
        fused = nn.Dense(out_ch, use_bias=False, name="vsa_point_feature_fusion")(
            point_features
        )
        fused = MaskedBatchNorm(name="vsa_fusion_bn")(
            fused, mask=kp_valid, use_running_average=not train
        )
        fused = nn.relu(fused)
        batch["point_features_before_fusion"] = point_features
        batch["point_features"] = fused  # (B, S, C)
        batch["point_valid"] = kp_valid
        return batch
