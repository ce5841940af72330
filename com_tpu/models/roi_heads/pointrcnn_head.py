"""PointRCNN refinement head (pcdet/models/roi_heads/pointrcnn_head.py:10-179).

RoI point pooling (canonical-frame member points + [score, depth] prefix),
xyz-up/merge 1x1 MLPs, a small SA stack over the pooled points, cls/reg FCs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import pointnet2 as pn2
from ...ops.boxes import enlarge_box3d
from ...ops.roiaware import roipoint_pool3d
from ...utils.registry import ROI_HEADS
from ..layers import MaskedBatchNorm
from ..pfe import PointNetBlock


class SAModule(nn.Module):
    """Single-scale SA; npoint None -> group-all (PointnetSAModule role)."""

    npoint: int | None
    radius: float
    nsample: int
    mlp: tuple

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool):
        b = xyz.shape[0]
        if self.npoint is None:  # group all
            x = jnp.concatenate([xyz, feats], axis=-1)
            pooled = PointNetBlock(tuple(self.mlp), name="mlp")(
                x, ~valid.any(axis=1), train)
            return (jnp.zeros((b, 1, 3), xyz.dtype), pooled[:, None, :],
                    valid.any(axis=1)[:, None])

        def sample_one(x, v):
            idx = pn2.farthest_point_sample(x, v, self.npoint)
            return x[idx], v[idx]

        new_xyz, new_valid = jax.vmap(sample_one)(xyz, valid)

        def group_one(x, f, v, nx):
            return pn2.query_and_group(self.radius, self.nsample, x, nx, f,
                                       valid=v)

        grouped, _, empty, slot = jax.vmap(group_one)(xyz, feats, valid, new_xyz)
        bs, s_, k_, c_ = grouped.shape
        pooled = PointNetBlock(tuple(self.mlp), name="mlp")(
            grouped.reshape(bs * s_, k_, c_), empty.reshape(-1), train,
            slot_valid=slot.reshape(bs * s_, k_)
        ).reshape(bs, s_, -1)
        return new_xyz, pooled, new_valid


@ROI_HEADS.register
class PointRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        pool_cfg = cfg["ROI_POINT_POOL"]
        num_pts = int(pool_cfg.get("NUM_SAMPLED_POINTS", 512))
        depth_norm = float(pool_cfg.get("DEPTH_NORMALIZER", 70.0))
        extra_w = list(pool_cfg.get("POOL_EXTRA_WIDTH", [0.0, 0.0, 0.0]))

        rois = jax.lax.stop_gradient(batch["rois"])  # (B, R, 7)
        pc = batch["point_coords"]  # (B, S, 3)
        pf = batch["point_features"]  # (B, S, C)
        pv = batch.get("point_valid", jnp.ones(pc.shape[:2], bool))
        scores = jax.lax.stop_gradient(batch["point_cls_scores"])  # (B, S)
        b, r = rois.shape[:2]

        depth = jnp.linalg.norm(pc, axis=-1) / depth_norm - 0.5
        feats_all = jnp.concatenate(
            [scores[..., None], depth[..., None], pf], axis=-1)

        def pool_one(p, f, v, ro):
            big = enlarge_box3d(ro[:, :7], extra_w, xp=jnp)
            return roipoint_pool3d(p, f, v, big, num_pts)

        pooled, empty = jax.vmap(pool_one)(pc, feats_all, pv, rois)
        # pooled: (B, R, K, 3 + 2 + C) — local xyz already canonical (the
        # pooling rotates into the enlarged roi frame = same center/heading)
        pooled = pooled * (~empty)[..., None, None].astype(pooled.dtype)
        br = b * r
        pooled = pooled.reshape(br, num_pts, -1)
        pvalid = jnp.abs(pooled).sum(-1) > 0

        def mlp1x1(x, chans, name):
            for i, ch in enumerate(chans):
                x = nn.Dense(ch, use_bias=False, name=f"{name}_{i}")(x)
                x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
                    x, mask=pvalid, use_running_average=not train)
                x = nn.relu(x)
            return x

        xyz_up = list(cfg.get("XYZ_UP_LAYER", [128, 128]))
        xyz_in = pooled[..., :5]  # local xyz + score + depth
        xyz_feat = mlp1x1(xyz_in, xyz_up, "xyz_up")
        pt_feat = pooled[..., 5:]
        merged = jnp.concatenate([xyz_feat, pt_feat], axis=-1)
        merged = mlp1x1(merged, [xyz_up[-1]], "merge_down")

        sa_cfg = cfg["SA_CONFIG"]
        xyz = pooled[..., :3]
        feats = merged
        valid = pvalid
        for k, np_k in enumerate(list(sa_cfg["NPOINTS"])):
            xyz, feats, valid = SAModule(
                npoint=None if int(np_k) == -1 else int(np_k),
                radius=float(sa_cfg["RADIUS"][k]),
                nsample=int(sa_cfg["NSAMPLE"][k]),
                mlp=tuple(sa_cfg["MLPS"][k]),
                name=f"sa_{k}",
            )(xyz, feats, valid, train)

        shared = feats[:, 0, :]  # (BR, C) after group-all

        def fc_branch(x, fcs, out_ch, name):
            for i, ch in enumerate(fcs):
                x = nn.Dense(ch, use_bias=False, name=f"{name}_fc_{i}")(x)
                x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
                    x, use_running_average=not train)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f"{name}_out")(x)

        rcnn_cls = fc_branch(shared, list(cfg.get("CLS_FC", [256, 256])),
                             self.num_class, "cls")
        rcnn_reg = fc_branch(shared, list(cfg.get("REG_FC", [256, 256])), 7,
                             "reg")
        batch["rcnn_cls"] = rcnn_cls.reshape(b, r)
        batch["rcnn_reg"] = rcnn_reg.reshape(b, r, 7)
        return batch
