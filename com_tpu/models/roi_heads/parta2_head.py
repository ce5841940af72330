"""PartA2 aggregation head (pcdet/models/roi_heads/partA2_head.py:10-224).

RoI-aware pooling of (a) part offsets + seg score (avg pool) and (b) UNet
point features (max pool) into a POOL_SIZE^3 canonical grid per RoI; two
small 3D conv stacks (the reference's sparse convs over the pooled grid are
expressed as dense convs + non-empty masking — identical math since empty
cells are zero); the full pooled grid flattens into shared FCs and cls/reg
branches, like the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roiaware import roiaware_pool3d
from ...utils.registry import ROI_HEADS
from ..layers import MaskedBatchNorm


class Conv3DBNReLU(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x (N, D, H, W, C); mask (N, D, H, W) non-empty cells
        x = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                    use_bias=False)(x)
        x = x * mask[..., None].astype(x.dtype)  # submanifold masking
        x = MaskedBatchNorm()(x, mask=mask, use_running_average=not train)
        return nn.relu(x)


@ROI_HEADS.register
class PartA2FCHead(nn.Module):
    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        pool_cfg = cfg["ROI_AWARE_POOL"]
        ps = int(pool_cfg.get("POOL_SIZE", 12))
        nf = int(pool_cfg.get("NUM_FEATURES", 128))
        max_pts = int(pool_cfg.get("MAX_POINTS_PER_ROI", 512))
        c0 = nf // 2
        thresh = float(cfg.get("SEG_MASK_SCORE_THRESH", 0.3))

        rois = jax.lax.stop_gradient(batch["rois"])  # (B, R, 7)
        pc = batch["point_coords"]  # (B, S, 3)
        pf = batch["point_features"]  # (B, S, C)
        pv = batch.get("point_valid", jnp.ones(pc.shape[:2], bool))
        seg = jax.lax.stop_gradient(batch["point_cls_scores"])  # (B, S)
        part = batch["point_part_offset"]  # (B, S, 3)
        b, r = rois.shape[:2]

        # part features: [part_offset, seg_score]; zero offsets below the
        # seg threshold (partA2_head.py:121-126)
        gate = (seg >= thresh)[..., None].astype(part.dtype)
        part_feat = jnp.concatenate([part * gate, seg[..., None]], axis=-1)

        pooled_part = jax.vmap(
            lambda p, f, v, ro: roiaware_pool3d(p, f, v, ro, ps, max_pts, "avg")
        )(pc, part_feat, pv, rois)  # (B, R, ps, ps, ps, 4)
        pooled_rpn = jax.vmap(
            lambda p, f, v, ro: roiaware_pool3d(p, f, v, ro, ps, max_pts, "max")
        )(pc, pf, pv, rois)  # (B, R, ps, ps, ps, C)

        br = b * r
        pooled_part = pooled_part.reshape(br, ps, ps, ps, -1)
        pooled_rpn = pooled_rpn.reshape(br, ps, ps, ps, -1)
        nonempty = jnp.abs(pooled_part).sum(-1) > 0  # (BR, ps, ps, ps)

        x_part = Conv3DBNReLU(64, name="conv_part_0")(pooled_part, nonempty, train)
        x_part = Conv3DBNReLU(c0, name="conv_part_1")(x_part, nonempty, train)
        x_rpn = Conv3DBNReLU(64, name="conv_rpn_0")(pooled_rpn, nonempty, train)
        x_rpn = Conv3DBNReLU(c0, name="conv_rpn_1")(x_rpn, nonempty, train)

        merged = jnp.concatenate([x_rpn, x_part], axis=-1)  # (BR, ps^3 grid, NF)
        # the full dense ps^3 grid flattens into the shared FCs, exactly
        # like the reference partA2_head
        x = merged.reshape(br, -1)

        dp = float(cfg.get("DP_RATIO", 0.0))
        shared_fc = list(cfg.get("SHARED_FC", [256, 256]))
        for i, ch in enumerate(shared_fc):
            x = nn.Dense(ch, use_bias=False, name=f"shared_fc_{i}")(x)
            x = MaskedBatchNorm(name=f"shared_bn_{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
            if i != len(shared_fc) - 1 and dp > 0:  # never after the last
                x = nn.Dropout(dp, deterministic=not train)(x)

        def fc_branch(x, fcs, out_ch, name):
            # make_fc_layers parity: Dropout(DP_RATIO) after the FIRST
            # branch layer (roi_head_template.py:39-40)
            for i, ch in enumerate(fcs):
                x = nn.Dense(ch, use_bias=False, name=f"{name}_fc_{i}")(x)
                x = MaskedBatchNorm(name=f"{name}_bn_{i}")(
                    x, use_running_average=not train)
                x = nn.relu(x)
                if dp > 0 and i == 0:
                    x = nn.Dropout(dp, deterministic=not train)(x)
            return nn.Dense(out_ch, name=f"{name}_out")(x)

        rcnn_cls = fc_branch(x, list(cfg.get("CLS_FC", [256, 256])),
                             self.num_class, "cls")
        rcnn_reg = fc_branch(x, list(cfg.get("REG_FC", [256, 256])), 7, "reg")

        batch["rcnn_cls"] = rcnn_cls.reshape(b, r)
        batch["rcnn_reg"] = rcnn_reg.reshape(b, r, 7)
        return batch
