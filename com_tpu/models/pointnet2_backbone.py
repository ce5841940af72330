"""PointNet++ MSG backbone (pcdet/models/backbones_3d/pointnet2_backbone.py
PointNet2MSG, used by PointRCNN): set-abstraction pyramid (FPS + multi-radius
ball-query grouping + mini-PointNets) followed by feature-propagation
(3-NN inverse-distance interpolation + MLPs) back to full resolution.

Built on the jittable pointnet2 ops (com_tpu/ops/pointnet2.py), vmapped over
the batch; all shapes static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pointnet2 as pn2
from ..utils.registry import BACKBONES_3D
from .layers import MaskedBatchNorm
from .pfe import PointNetBlock


class SAModuleMSG(nn.Module):
    """Multi-scale-group set abstraction (PointnetSAModuleMSG role)."""

    npoint: int
    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of tuples

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool):
        # xyz (B, N, 3); feats (B, N, C) or None; valid (B, N)
        def sample_one(x, v):
            idx = pn2.farthest_point_sample(x, v, self.npoint)
            return x[idx], v[idx]

        new_xyz, new_valid = jax.vmap(sample_one)(xyz, valid)

        outs = []
        for ri, (r, ns) in enumerate(zip(self.radii, self.nsamples)):
            def group_one(x, f, v, nx):
                return pn2.query_and_group(float(r), int(ns), x, nx, f, valid=v)

            grouped, _, empty, slot = jax.vmap(group_one)(
                xyz, feats, valid, new_xyz
            )  # (B, S, K, 3+C)
            b, s_, k_, c_ = grouped.shape
            pooled = PointNetBlock(tuple(self.mlps[ri]), name=f"mlp_{ri}")(
                grouped.reshape(b * s_, k_, c_), empty.reshape(-1), train,
                slot_valid=slot.reshape(b * s_, k_)
            ).reshape(b, s_, -1)
            outs.append(pooled)
        return new_xyz, jnp.concatenate(outs, axis=-1), new_valid


class FPModule(nn.Module):
    """Feature propagation (PointnetFPModule role): 3-NN interpolate the
    coarse features to the fine set, concat skip, MLP."""

    mlp: tuple

    @nn.compact
    def __call__(self, xyz_fine, xyz_coarse, feats_fine, feats_coarse,
                 valid_fine, valid_coarse, train: bool):
        def interp_one(xf, xc, fc, vc):
            dist, idx = pn2.three_nn(xf, xc, known_valid=vc)
            return pn2.three_interpolate(fc, idx, dist)

        interp = jax.vmap(interp_one)(xyz_fine, xyz_coarse, feats_coarse,
                                      valid_coarse)
        x = interp if feats_fine is None else jnp.concatenate(
            [feats_fine, interp], axis=-1)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, use_bias=False, name=f"fc_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(
                x, mask=valid_fine, use_running_average=not train)
            x = nn.relu(x)
        return x * valid_fine[..., None].astype(x.dtype)


@BACKBONES_3D.register
class PointNet2MSG(nn.Module):
    model_cfg: dict
    input_channels: int

    @nn.compact
    def __call__(self, batch, train: bool = True):
        points = batch["points"]  # (B, N, F) xyz first
        valid = batch["points_mask"]
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        sa_cfg = self.model_cfg["SA_CONFIG"]
        npoints = list(sa_cfg["NPOINTS"])
        l_xyz, l_feats, l_valid = [xyz], [feats], [valid]
        for k in range(len(npoints)):
            nx, nf, nv = SAModuleMSG(
                npoint=int(npoints[k]),
                radii=tuple(sa_cfg["RADIUS"][k]),
                nsamples=tuple(sa_cfg["NSAMPLE"][k]),
                mlps=tuple(tuple(m) for m in sa_cfg["MLPS"][k]),
                name=f"sa_{k}",
            )(l_xyz[k], l_feats[k], l_valid[k], train)
            l_xyz.append(nx)
            l_feats.append(nf)
            l_valid.append(nv)

        fp_mlps = [tuple(m) for m in self.model_cfg["FP_MLPS"]]
        for i in range(len(fp_mlps) - 1, -1, -1):
            l_feats[i] = FPModule(mlp=fp_mlps[i], name=f"fp_{i}")(
                l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1],
                l_valid[i], l_valid[i + 1], train)

        batch["point_features"] = l_feats[0]  # (B, N, C)
        batch["point_coords"] = xyz
        batch["point_valid"] = valid
        return batch
