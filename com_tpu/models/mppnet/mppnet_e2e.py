"""MPPNetE2E — streaming inference with a rolling memory bank.

Rebuild of pcdet/models/detectors/mppnet_e2e.py +
roi_heads/mppnet_memory_bank_e2e.py (580 LoC): instead of re-cropping and
re-encoding all F frames per step, the per-frame proxy GEOMETRY features of
past frames are cached; each step computes only the current frame's
features, rolls the bank, links trajectories against the banked proposals,
and gathers the matched past features.

The reference keeps the bank in module attributes (self.memory_*); here it
is an explicit pytree (MemoryBank) threaded through the step — jit-safe and
checkpointable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .mppnet_head import (
    MPPNetHead,
    crop_trajectory_points,
    generate_trajectory_with_idx,
)


class MemoryBank(NamedTuple):
    rois: jax.Array  # (B, F, P, D) per-frame proposals, newest first
    roi_labels: jax.Array  # (B, F, P)
    roi_scores: jax.Array  # (B, F, P)
    geo: jax.Array  # (B, F, P, G3, C) cached current-frame proxy features


def init_bank(rois, labels, scores, geo, num_frames: int) -> MemoryBank:
    """First frame of a sequence: replicate like mppnet_e2e.py:46-50."""
    rep = lambda x: jnp.repeat(x[:, None], num_frames, axis=1)
    return MemoryBank(rep(rois), rep(labels), rep(scores), rep(geo))


def push_bank(bank: MemoryBank, rois, labels, scores, geo) -> MemoryBank:
    """Insert the newest frame at index 0, drop the oldest
    (mppnet_e2e.py:51-58 pop/insert)."""
    sh = lambda old, new: jnp.concatenate(
        [new[:, None], old[:, :-1]], axis=1)
    return MemoryBank(
        sh(bank.rois, rois), sh(bank.roi_labels, labels),
        sh(bank.roi_scores, scores), sh(bank.geo, geo),
    )


from ...utils.registry import ROI_HEADS


@ROI_HEADS.register
class MPPNetHeadE2E(MPPNetHead):
    """Memory-bank head (mppnet_memory_bank_e2e.py MPPNetHeadE2E role):
    geometry features come from the bank for past frames; only frame 0 is
    cropped/pooled.  Expects batch["memory_bank"] = MemoryBank and the
    current frame's proposals in batch["rois"/"roi_scores"/"roi_labels"]."""

    def __call__(self, batch, train: bool = False):
        bank: MemoryBank = batch["memory_bank"]
        rois = batch["rois"]  # (B, R, D) current proposals
        points = batch["points"]
        pmask = batch["points_mask"]
        b, r, d = rois.shape
        f = self.num_frames
        g3 = self.num_proxy_points

        trajectory, valid_length, match_idx = generate_trajectory_with_idx(
            rois, bank.rois)
        batch["trajectory_rois"] = trajectory
        batch["valid_length"] = valid_length

        # current-frame crop only (timestamp 0 points)
        traj0 = trajectory[:, :1]
        src0 = crop_trajectory_points(
            points, pmask, traj0, valid_length[:, :1], self.num_lidar_points)
        br = b * r
        src0 = src0.reshape(br, self.num_lidar_points, -1)
        valid_pts0 = jnp.abs(src0[..., 0:3]).sum(-1) > 0
        traj_br0 = trajectory[:, 0].reshape(br, d)[:, :7][:, None, :]

        geo0, proxy0 = self.geometry_features(src0, traj_br0, valid_pts0)
        # geo0: (BR, G3, C) current frame
        geo_cur = geo0.reshape(b, r, g3, -1)
        batch["geometry_feature_memory"] = geo_cur

        # past frames: gather banked features at the matched proposal index
        past = []
        for i in range(1, f):
            gi = jnp.clip(match_idx[:, i], 0, bank.geo.shape[2] - 1)
            gathered = jnp.take_along_axis(
                bank.geo[:, i], gi[..., None, None], axis=1)
            ok = (match_idx[:, i] >= 0).astype(gathered.dtype)
            past.append(gathered * ok[..., None, None])
        geo_all = jnp.concatenate([geo_cur[:, :, None],
                                   jnp.stack(past, 2)], axis=2)
        # (B, R, F, G3, C) -> (BR, F*G3, C)
        feat_geo = geo_all.transpose(0, 1, 2, 3, 4).reshape(br, f * g3, -1)

        # motion features over the full trajectory's proxy points
        traj_br = trajectory.transpose(0, 2, 1, 3).reshape(br, f, d)[..., :7]
        from .mppnet_head import proxy_points_of_roi

        proxy_g, _ = proxy_points_of_roi(traj_br, self.grid_size)
        proxy = proxy_g.reshape(br, f * g3, 3)
        motion = self.motion_features(proxy, traj_br)
        feat = feat_geo + motion

        if self.model_cfg.get("USE_TRAJ_EMPTY_MASK", True):
            empty = trajectory[:, 0, :, :6].sum(-1) == 0
            feat = feat * (~empty).reshape(br, 1, 1).astype(feat.dtype)

        box_reg, feat_box = self.trajectory_branch(
            trajectory.transpose(0, 2, 1, 3).reshape(br, f, d), train)

        g = self.grid_size
        grid_index = jnp.asarray(
            [[x, y, z] for x in range(g) for y in range(g) for z in range(g)],
            jnp.float32)
        pos = self.grid_pos_embeded(grid_index)
        pos = jnp.concatenate(
            [jnp.zeros((1, self.hidden_dim), pos.dtype), pos], axis=0)

        hs, token_list = self.transformer(feat, pos=pos, train=train)
        point_cls = jnp.stack(
            [self.class_embed(tok[0]) for tok in token_list], axis=0)
        hs_flat = hs.transpose(1, 0, 2).reshape(br, -1)
        joint_reg = self.jointembed(
            jnp.concatenate([hs_flat, feat_box], axis=-1))

        rois0 = trajectory[:, 0, :, :7]
        batch["batch_cls_preds"] = point_cls[-1].reshape(b, r, 1)
        batch["batch_box_preds"] = self.decode_boxes(
            rois0, joint_reg.reshape(b, r, -1))
        batch["cls_preds_normalized"] = False
        return batch


def mppnet_e2e_stream_step(head, variables, batch, bank, is_first: bool):
    """One streaming-inference step: roll/initialize the bank with the
    current first-stage proposals, run the banked head, push the new
    geometry features.  Returns (batch_out, new_bank)."""
    rois = batch["rois"]
    labels = batch["roi_labels"]
    scores = batch["roi_scores"]
    f = int(head.model_cfg["Transformer"]["num_frames"])

    if is_first:
        g3 = int(head.model_cfg["Transformer"]["num_proxy_points"])
        c = int(head.model_cfg["TRANS_INPUT"])
        zero_geo = jnp.zeros((*rois.shape[:2], g3, c), jnp.float32)
        bank = init_bank(rois, labels, scores, zero_geo, f)
    else:
        bank = push_bank(bank, rois, labels, scores,
                         jnp.zeros_like(bank.geo[:, 0]))

    batch = dict(batch)
    batch["memory_bank"] = bank
    out = head.apply(variables, batch, train=False)
    # write the just-computed current-frame features into slot 0
    geo = out["geometry_feature_memory"]
    bank = bank._replace(geo=bank.geo.at[:, 0].set(geo))
    return out, bank
