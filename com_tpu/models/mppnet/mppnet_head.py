"""MPPNet multi-frame proposal-refinement head (flax, static shapes).

TPU-native rebuild of pcdet/models/roi_heads/mppnet_head.py (992 LoC) +
the trajectory/target logic of ProposalTargetLayerMPPNet.  Everything the
reference does with per-batch/per-roi python loops (trajectory linking,
point cropping, per-roi random sampling) is vectorized over fixed-size
(B, F, R, ...) tensors.

Documented deviations from the reference (behavioral, not structural):
* Previous-frame point sampling uses the same mask-topk gather the reference
  applies to the current frame, instead of np.random.choice(seed=0) per roi
  (mppnet_head.py:529-536) — deterministic either way, different subset when
  a roi holds more than num_lidar_points points.
* RoI fg/bg subsampling is deterministic (IoU-/score-ranked) like the rest
  of this codebase's RoI heads; USE_ROI_AUG noise is applied with fixed
  jax PRNG streams rather than torch's global RNG.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import ResidualCoder, corner_loss
from ...ops.iou import boxes_iou3d
from ...ops.pointnet2 import query_and_group
from ...utils.registry import ROI_HEADS
from .transformer import MLP, MPPNetTransformer, SeqBoxEmbed


def rotate_z(points, angle):
    """Rotate (..., 3) points by angle (...,) about +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c - points[..., 1] * s
    y = points[..., 0] * s + points[..., 1] * c
    return jnp.stack([x, y, points[..., 2]], axis=-1)


def corner_points_of_roi(rois):
    """8 box corners in global frame (mppnet_head.py:367-401).

    rois (..., 7) -> (..., 8, 3); corner order = binary meshgrid {0,1}^3 of
    (dx, dy, dz) offsets minus half-size, rotated by heading, plus center.
    """
    dims = rois[..., 3:6]
    bits = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        rois.dtype,
    )  # (8, 3)
    local = bits * dims[..., None, :] - dims[..., None, :] / 2
    rot = rotate_z(local, rois[..., None, 6])
    return rot + rois[..., None, 0:3]


def grid_index(g: int, dtype=jnp.float32):
    """(G^3, 3) x-major grid indices — the ONE flattening order shared by
    proxy points and their positional embeddings."""
    return jnp.asarray(
        [[x, y, z] for x in range(g) for y in range(g) for z in range(g)],
        dtype,
    )


def proxy_points_of_roi(rois, grid_size: int):
    """Dense grid_size^3 proxy points (mppnet_head.py:381-390, 444-452).

    rois (..., 7) -> global (..., G^3, 3); grid flattened in (x, y, z) order.
    """
    idx = grid_index(grid_size, rois.dtype)  # (G^3, 3)
    dims = rois[..., 3:6]
    local = (idx + 0.5) / grid_size * dims[..., None, :] - dims[..., None, :] / 2
    rot = rotate_z(local, rois[..., None, 6])
    return rot + rois[..., None, 0:3], local


def spherical_coordinate(src, diag_dist):
    """(..., 27) xyz-triplet offsets -> (dist/diag, phi, theta) per anchor
    (mppnet_head.py:454-468)."""
    x = src[..., 0::3]
    y = src[..., 1::3]
    z = src[..., 2::3]
    dis = jnp.sqrt(x**2 + y**2 + z**2)
    phi = jnp.arctan(y / (x + 1e-5))
    the = jnp.arccos(jnp.clip(z / (dis + 1e-5), -1.0, 1.0))
    dis = dis / (diag_dist + 1e-5)
    return jnp.concatenate([dis, phi, the], axis=-1)


def generate_trajectory_with_idx(cur_boxes, proposals_list, iou_thresh=0.5):
    """generate_trajectory that also returns, per (frame, roi), the index of
    the matched proposal in that frame's list (-1 when unmatched) — needed
    by the E2E memory bank to gather cached per-frame features."""
    b, f, p, d = proposals_list.shape
    r = cur_boxes.shape[1]
    traj = [cur_boxes]
    valid = [jnp.ones((b, r), bool)]
    idxs = [jnp.arange(r, dtype=jnp.int32)[None].repeat(b, 0)]
    prev = cur_boxes
    for i in range(1, f):
        pred_xy = prev[..., 0:2] + prev[..., 7:9]
        pred = jnp.concatenate([pred_xy, prev[..., 2:]], axis=-1)
        iou = jax.vmap(lambda a, c: boxes_iou3d(a[:, :7], c[:, :7], xp=jnp))(
            pred, proposals_list[:, i]
        )
        best = iou.argmax(axis=2)
        maxov = iou.max(axis=2)
        ok = maxov >= iou_thresh
        matched = jnp.take_along_axis(
            proposals_list[:, i], best[..., None], axis=1)
        stored = jnp.where(ok[..., None], matched, cur_boxes)
        traj.append(stored)
        valid.append(ok)
        idxs.append(jnp.where(ok, best.astype(jnp.int32), -1))
        # the reference predicts frame i+1 from trajectory_rois[:, i] — the
        # STORED row (frame-0 box when unmatched), not the propagated
        # prediction (mppnet_head.py:644-646)
        prev = stored
    return (jnp.stack(traj, 1), jnp.stack(valid, 1).astype(jnp.float32),
            jnp.stack(idxs, 1))


def generate_trajectory(cur_boxes, proposals_list, iou_thresh=0.5):
    """Link current-frame boxes backward through per-frame proposals
    (mppnet_head.py:635-659).

    cur_boxes: (B, R, D>=9) frame-0 boxes with velocity at cols 7:9.
    proposals_list: (B, F, P, D) per-frame proposals.
    Returns trajectory (B, F, R, D) and valid_length (B, F, R).
    """
    b, f, p, d = proposals_list.shape
    r = cur_boxes.shape[1]
    traj = [cur_boxes]
    valid = [jnp.ones((b, r), bool)]
    prev = cur_boxes
    for i in range(1, f):
        pred_xy = prev[..., 0:2] + prev[..., 7:9]
        pred = jnp.concatenate([pred_xy, prev[..., 2:]], axis=-1)
        iou = jax.vmap(lambda a, c: boxes_iou3d(a[:, :7], c[:, :7], xp=jnp))(
            pred, proposals_list[:, i]
        )  # (B, R, P)
        best = iou.argmax(axis=2)
        maxov = iou.max(axis=2)
        ok = maxov >= iou_thresh
        matched = jnp.take_along_axis(
            proposals_list[:, i], best[..., None], axis=1
        )
        # unmatched rois keep the frame-0 box (reference init semantics);
        # the next frame's prediction starts from this stored row, not the
        # accumulated prediction (mppnet_head.py:644-646)
        stored = jnp.where(ok[..., None], matched, cur_boxes)
        traj.append(stored)
        valid.append(ok)
        prev = stored
    return jnp.stack(traj, axis=1), jnp.stack(valid, axis=1).astype(jnp.float32)


def crop_trajectory_points(points, pmask, trajectory, valid_length,
                           num_lidar_points: int, frame_dt: float = 0.1):
    """Gather up to K points per (roi, frame) within each trajectory box's
    BEV circle (mppnet_head.py:470-549, vectorized mask-topk).

    points: (B, P, C) with per-point timestamp in the LAST channel.
    trajectory: (B, F, R, D).  Returns src (B, R, F*K, C-1): xyz + features
    (timestamp dropped like USE_TIMESTAMP=None path).
    """
    b, p, c = points.shape
    f, r = trajectory.shape[1], trajectory.shape[2]
    k = num_lidar_points
    xy = points[..., 0:2]
    t = points[..., -1]
    outs = []
    for i in range(f):
        boxes = trajectory[:, i]  # (B, R, D)
        radii2 = ((boxes[..., 3] / 2) ** 2 + (boxes[..., 4] / 2) ** 2) * (1.1**2)
        d2 = ((xy[:, None, :, :] - boxes[..., None, 0:2]) ** 2).sum(-1)  # (B,R,P)
        tmask = jnp.abs(t - i * frame_dt) < 1e-3
        ok = (d2 <= radii2[..., None]) & tmask[:, None, :] & pmask[:, None, :]
        score, idx = jax.lax.top_k(ok.astype(jnp.float32), k)  # (B,R,K)
        hit = score > 0
        idx = jnp.where(hit, idx, idx[..., :1])  # pad by repeating first hit
        pts = jnp.take_along_axis(
            points[:, None, :, :], idx[..., None], axis=2
        )  # (B,R,K,C)
        any_hit = hit.any(axis=-1, keepdims=True)
        keep = any_hit & (valid_length[:, i, :, None] > 0 if i > 0
                          else jnp.ones_like(any_hit))
        pts = pts * keep[..., None].astype(pts.dtype)
        outs.append(pts[..., : c - 1])
    return jnp.concatenate(outs, axis=2)  # (B, R, F*K, C-1)


@ROI_HEADS.register
class MPPNetHead(nn.Module):
    """Multi-frame transformer refinement head (mppnet_head.py:298-999)."""

    model_cfg: dict
    num_class: int = 1

    def setup(self):
        tcfg = self.model_cfg["Transformer"]
        self.num_lidar_points = int(tcfg["num_lidar_points"])
        self.num_proxy_points = int(tcfg["num_proxy_points"])
        self.num_groups = int(tcfg["num_groups"])
        self.num_frames = int(tcfg["num_frames"])
        self.num_enc_layers = int(tcfg["enc_layers"])
        self.hidden_dim = int(self.model_cfg["TRANS_INPUT"])
        self.grid_size = int(self.model_cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        self.box_coder = ResidualCoder()
        code = self.box_coder.code_size

        pool_cfg = self.model_cfg["ROI_GRID_POOL"]
        self.pool_radii = [float(x) for x in pool_cfg["POOL_RADIUS"]]
        self.pool_nsamples = [int(x) for x in pool_cfg["NSAMPLE"]]
        self.pool_mlps = [list(m) for m in pool_cfg["MLPS"]]

        num_radius = len(self.pool_radii)
        self.up_dimension_geometry = MLP(64, self.hidden_dim // num_radius, 3)
        self.up_dimension_motion = MLP(64, self.hidden_dim, 3)
        self.seqboxembed = SeqBoxEmbed(self.hidden_dim)
        self.jointembed = MLP(int(tcfg["hidden_dim"]), code * self.num_class, 4)
        self.transformer = MPPNetTransformer(
            d_model=self.hidden_dim,
            nhead=int(tcfg["nheads"]),
            num_encoder_layers=self.num_enc_layers,
            dim_feedforward=int(tcfg["dim_feedforward"]),
            num_proxy_points=self.num_proxy_points,
            num_groups=self.num_groups,
            num_frames=self.num_frames,
            sequence_stride=int(tcfg.get("sequence_stride", 1)),
            mixer_hidden=int(tcfg["use_mlp_mixer"]["hidden_dim"]),
            grid_size=self.grid_size,
            dropout=float(tcfg.get("dropout", 0.1)),
        )
        self.class_embed = nn.Dense(1)
        self.bbox_embed = [
            MLP(int(tcfg["hidden_dim"]), code * self.num_class, 4,
                name=f"bbox_embed_{i}")
            for i in range(self.num_groups)
        ]
        self.grid_pos_embeded = MLP(256, self.hidden_dim, 2)
        # per-radius grouping MLP stacks (StackSAModuleMSG role)
        self.pool_denses = [
            [nn.Dense(c, name=f"pool_r{ri}_l{li}")
             for li, c in enumerate(mlp)]
            for ri, mlp in enumerate(self.pool_mlps)
        ]

    # ---- feature extraction -------------------------------------------
    def roi_grid_pool(self, src_xyz, src_feat, trajectory, valid_mask):
        """Ball-query pooling around per-frame proxy points
        (mppnet_head.py:403-442).

        src_xyz: (BR, F*K, 3) cropped points; src_feat (BR, F*K, Cg).
        trajectory: (BR, F, 7).  Returns (BR, F*G^3, hidden) and the global
        proxy points (BR, F*G^3, 3).
        """
        br = src_xyz.shape[0]
        f = trajectory.shape[1]  # frames follow the trajectory, not config
        k, g3 = self.num_lidar_points, self.num_proxy_points
        proxy_g, _ = proxy_points_of_roi(trajectory, self.grid_size)
        proxy = proxy_g.reshape(br, f * g3, 3)

        xyz_f = src_xyz.reshape(br * f, k, 3)
        feat_f = src_feat.reshape(br * f, k, -1)
        new_f = proxy_g.reshape(br * f, g3, 3)
        valid_f = valid_mask.reshape(br * f, k)

        pooled_all = []
        for ri, radius in enumerate(self.pool_radii):
            ns = self.pool_nsamples[ri]

            def pool_one(xyz, feat, new_xyz, valid):
                grouped, _, empty, _ = query_and_group(
                    radius, ns, xyz, new_xyz, feat, valid=valid, use_xyz=True
                )  # (g3, ns, 3+Cg)
                return grouped, empty

            grouped, empty = jax.vmap(pool_one)(xyz_f, feat_f, new_f, valid_f)
            x = grouped
            for dense in self.pool_denses[ri]:
                x = nn.relu(dense(x))
            x = x.max(axis=2)  # (br*f, g3, c)
            x = x * (~empty)[..., None].astype(x.dtype)
            pooled_all.append(x)
        pooled = jnp.concatenate(pooled_all, axis=-1)
        return pooled.reshape(br, f * g3, -1), proxy

    def geometry_features(self, src, trajectory, valid_pts):
        """Proposal-aware geometry features (mppnet_head.py:551-575).

        src: (BR, F*K, C) cropped points (xyz + extra feats).
        trajectory: (BR, F, 7).
        """
        br = src.shape[0]
        f, k = trajectory.shape[1], self.num_lidar_points
        feats = []
        for i in range(f):
            roi = trajectory[:, i]
            corners = corner_points_of_roi(roi).reshape(br, 24)
            anchor = jnp.concatenate([corners, roi[:, 0:3]], axis=-1)  # (BR,27)
            pts = src[:, i * k : (i + 1) * k, 0:3]
            rel = jnp.tile(pts, (1, 1, 9)) - anchor[:, None, :]
            diag = jnp.linalg.norm(roi[:, 3:6], axis=-1)[:, None, None]
            feats.append(spherical_coordinate(rel, diag))
        geo = jnp.concatenate(feats, axis=1)  # (BR, F*K, 27)
        geo = jnp.concatenate([geo, src[..., 3:]], axis=-1)  # + point feats
        geo = self.up_dimension_geometry(geo)
        pooled, proxy = self.roi_grid_pool(src[..., 0:3], geo, trajectory,
                                           valid_pts)
        return pooled, proxy

    def motion_features(self, proxy, trajectory):
        """Frame-0-anchored motion features (mppnet_head.py:577-606)."""
        br, n, _ = proxy.shape
        g3 = self.num_proxy_points
        roi0 = trajectory[:, 0]
        corners = corner_points_of_roi(roi0).reshape(br, 24)
        anchor = jnp.concatenate([corners, roi0[:, 0:3]], axis=-1)
        rel = jnp.tile(proxy, (1, 1, 9)) - anchor[:, None, :]
        diag = jnp.linalg.norm(roi0[:, 3:6], axis=-1)[:, None, None]
        sph = spherical_coordinate(rel, diag)
        frame_ids = jnp.repeat(
            jnp.arange(self.num_frames, dtype=proxy.dtype), g3
        ) * 0.1
        time_pad = jnp.broadcast_to(
            jnp.stack([jnp.zeros_like(frame_ids), jnp.zeros_like(frame_ids),
                       frame_ids], axis=-1)[None],
            (br, n, 3),
        )
        return self.up_dimension_motion(
            jnp.concatenate([sph, time_pad], axis=-1)
        )

    def trajectory_branch(self, trajectory, train):
        """Canonical box-sequence embedding (mppnet_head.py:608-633)."""
        br, f, _ = trajectory.shape
        ts = (jnp.arange(f, dtype=trajectory.dtype) * 0.1)[None, :, None]
        seq = jnp.concatenate(
            [trajectory[..., :7],
             jnp.broadcast_to(ts, (br, f, 1))], axis=-1)
        seq = seq.at[..., 0:3].set(seq[..., 0:3] - seq[:, 0:1, 0:3])
        ry0 = seq[:, 0, 6] % (2 * jnp.pi)
        rot_xyz = rotate_z(seq[..., 0:3], -ry0[:, None])
        seq = jnp.concatenate(
            [rot_xyz, seq[..., 3:6], jnp.zeros_like(seq[..., 6:7]),
             seq[..., 7:8]], axis=-1)
        return self.seqboxembed(seq, train)

    # ---- forward --------------------------------------------------------
    def __call__(self, batch, train: bool = True):
        trajectory = batch["trajectory_rois"]  # (B, F, R, D)
        valid_length = batch["valid_length"]  # (B, F, R)
        points = batch["points"]  # (B, P, C) timestamp last
        pmask = batch["points_mask"]
        b, f, r, d = trajectory.shape

        src = crop_trajectory_points(
            points, pmask, trajectory, valid_length, self.num_lidar_points
        )  # (B, R, F*K, C-1)
        br = b * r
        src = src.reshape(br, f * self.num_lidar_points, -1)
        valid_pts = jnp.abs(src[..., 0:3]).sum(-1) > 0
        traj_br = trajectory.transpose(0, 2, 1, 3).reshape(br, f, d)[..., :7]

        geo, proxy = self.geometry_features(src, traj_br, valid_pts)
        motion = self.motion_features(proxy, traj_br)
        feat = geo + motion

        if self.model_cfg.get("USE_TRAJ_EMPTY_MASK", True):
            empty = trajectory[:, 0, :, :6].sum(-1) == 0  # (B, R)
            feat = feat * (~empty).reshape(br, 1, 1).astype(feat.dtype)

        box_reg, feat_box = self.trajectory_branch(
            trajectory.transpose(0, 2, 1, 3).reshape(br, f, d), train)

        # same flattening order as proxy_points_of_roi — a divergent copy
        # would silently pair positional embeddings with the wrong proxies
        pos = self.grid_pos_embeded(grid_index(self.grid_size))  # (G^3, C)
        pos = jnp.concatenate(
            [jnp.zeros((1, self.hidden_dim), pos.dtype), pos], axis=0)

        hs, token_list = self.transformer(feat, pos=pos, train=train)
        # per-layer cls on group 0 token; per-(layer, group) reg
        point_cls = jnp.stack(
            [self.class_embed(tok[0]) for tok in token_list], axis=0
        )  # (L, BR, 1)
        point_reg = jnp.stack(
            [self.bbox_embed[gi](tok[gi]) for gi in range(self.num_groups)
             for tok in token_list], axis=0
        )  # (G*L, BR, code)
        hs_flat = hs.transpose(1, 0, 2).reshape(br, -1)  # (BR, G*C)
        joint_reg = self.jointembed(
            jnp.concatenate([hs_flat, feat_box], axis=-1))  # (BR, code)

        out = {
            "rcnn_cls": point_cls,  # (L, BR, 1)
            "rcnn_reg": joint_reg,  # (BR, code)
            "point_reg": point_reg,  # (G*L, BR, code)
            "box_reg": box_reg,  # (BR, code)
        }
        batch["mppnet_preds"] = out
        # decoded boxes for eval / recall
        rois0 = trajectory[:, 0, :, :7]
        batch_cls = point_cls[-1].reshape(b, r, 1)
        batch_box = self.decode_boxes(rois0, joint_reg.reshape(b, r, -1))
        batch["batch_cls_preds"] = batch_cls
        batch["batch_box_preds"] = batch_box
        batch["cls_preds_normalized"] = False
        return batch

    def decode_boxes(self, rois, reg):
        """Decode canonical regression vs rois (mppnet_head.py:962-999)."""
        local = rois.at[..., 0:3].set(0.0)
        local = local.at[..., 6].set(0.0)
        dec = self.box_coder.decode(reg[..., :7], local, xp=jnp)
        rot = rotate_z(dec[..., 0:3], rois[..., 6])
        return jnp.concatenate(
            [rot + rois[..., 0:3], dec[..., 3:6],
             (dec[..., 6:7] + rois[..., 6:7])], axis=-1)


def mppnet_loss(preds, targets, loss_cfg, box_coder=None):
    """MPPNet training loss (mppnet_head.py:801-960), pure function.

    preds: dict from MPPNetHead (rcnn_cls (L,BR,1), rcnn_reg (BR,7),
    point_reg (GL,BR,7), box_reg (BR,7)).
    targets: dict with rois (B,R,7), gt_of_rois_ct (B,R,7) canonical GT,
    gt_of_rois_src (B,R,7) global GT, cls_labels (B,R), reg_valid (B,R).
    """
    w = loss_cfg["LOSS_WEIGHTS"]
    code_w = jnp.asarray(w["code_weights"], jnp.float32)
    coder = box_coder or ResidualCoder()

    rois = targets["rois"].reshape(-1, 7)
    gt_ct = targets["gt_of_rois_ct"].reshape(-1, 7)
    gt_src = targets["gt_of_rois_src"].reshape(-1, 7)
    cls_labels = targets["cls_labels"].reshape(-1)
    fg = targets["reg_valid"].reshape(-1).astype(jnp.float32)
    fg_sum = jnp.clip(fg.sum(), 1.0, None)

    # --- cls: per-layer BCE vs soft iou labels, averaged over layers
    cls_valid = (cls_labels >= 0).astype(jnp.float32)
    labels = jnp.clip(cls_labels, 0.0, 1.0)
    logits = preds["rcnn_cls"][..., 0]  # (L, BR)
    p = jax.nn.sigmoid(logits)
    bce = -(labels[None] * jnp.log(jnp.clip(p, 1e-7, 1.0))
            + (1 - labels[None]) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0)))
    loss_cls = (bce * cls_valid[None]).sum(axis=1) / jnp.clip(
        cls_valid.sum(), 1.0, None)
    loss_cls = loss_cls.mean() * w["rcnn_cls_weight"]

    # --- reg: smooth-l1 vs ResidualCoder targets against size-only anchors
    anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = coder.encode(gt_ct, anchor, xp=jnp)

    def smooth_l1(pred):
        diff = (pred - reg_targets) * code_w[None]
        ad = jnp.abs(diff)
        per = jnp.where(ad < 1.0, 0.5 * diff**2, ad - 0.5)
        return (per.sum(-1) * fg).sum() / fg_sum

    traj_w = w.get("traj_reg_weight", [2.0, 2.0, 2.0])
    loss_reg = smooth_l1(preds["rcnn_reg"]) * w["rcnn_reg_weight"] * traj_w[0]
    gl = preds["point_reg"].shape[0]
    point_loss = sum(
        smooth_l1(preds["point_reg"][i]) for i in range(gl)
    ) / gl * w["rcnn_reg_weight"] * traj_w[2]
    seq_loss = smooth_l1(preds["box_reg"]) * w["rcnn_reg_weight"] * traj_w[1]
    loss_reg = loss_reg + point_loss + seq_loss

    loss_corner = jnp.zeros(())
    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        local = anchor
        dec = coder.decode(preds["rcnn_reg"][:, :7], local, xp=jnp)
        rot = rotate_z(dec[..., 0:3], rois[:, 6])
        boxes = jnp.concatenate(
            [rot + rois[:, 0:3], dec[..., 3:6], dec[..., 6:7] + rois[:, 6:7]],
            axis=-1)
        per = corner_loss(boxes, gt_src, xp=jnp)
        loss_corner = (per * fg).sum() / fg_sum * w["rcnn_corner_weight"]

    total = loss_cls + loss_reg + loss_corner
    return total, {
        "rcnn_loss_cls": loss_cls,
        "rcnn_loss_reg": loss_reg,
        "rcnn_loss_corner": loss_corner,
    }
