"""Sparse 3D voxel backbones (VoxelBackBone8x / VoxelResBackBone8x roles).

pcdet/models/backbones_3d/spconv_backbone.py:69-293 re-expressed over the
gather-scatter sparse conv engine (com_tpu/ops/sparse.py): four stages at
strides 1/2/4/8 with channels 16/32/64/128, plus the final (2,1,1)-stride
z-compression conv; emits the dense (B, D, H/8, W/8, C) tensor consumed by
HeightCompression and per-scale sparse features for PV-RCNN-style PFEs.

Fixed per-stage voxel caps keep every shape static; caps default to a
geometric decay of the input cap and are configurable via VOXEL_CAPS.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse as sp
from ..utils.registry import BACKBONES_3D
from .layers import MaskedBatchNorm


class SparseConvBlock(nn.Module):
    """One sparse conv (submanifold or strided) + masked BN + ReLU.

    Batch handled internally: inputs are (B, V, C) / (B, V, 3) / (B, V); the
    conv vmaps over the batch with shared kernel weights while BN reduces over
    the whole batch (matching spconv + BatchNorm1d semantics).
    """

    out_channels: int
    stride: tuple | None = None  # None -> submanifold
    out_cap: int | None = None
    kernel: int | tuple = 3  # per-axis (kz, ky, kx) for strided convs
    pad: int | tuple = 1  # spconv padding (conv4 uses (0,1,1), conv_out 0)
    use_bias: bool = False  # SparseBasicBlock convs carry a bias
    relu: bool = True  # res blocks relu AFTER the identity add

    @nn.compact
    def __call__(self, feats, coords, valid, grid_zyx, train: bool,
                 nidx=None):
        cin = feats.shape[-1]
        ker = ((self.kernel,) * 3 if isinstance(self.kernel, int)
               else tuple(int(k) for k in self.kernel))
        k3 = ker[0] * ker[1] * ker[2]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k3, cin, self.out_channels),
            jnp.float32,
        )
        if self.stride is None:
            assert ker[0] == ker[1] == ker[2], "submanifold kernels are cubic"
            if nidx is None:
                out = jax.vmap(
                    lambda f, c, v: sp.submanifold_conv3d(
                        f, c, v, w, grid_zyx, ker[0])
                )(feats, coords, valid)
            else:  # shared per-stage rulebook (see sp.subm_rulebook)
                out = jax.vmap(
                    lambda f, c, v, ni: sp.submanifold_conv3d(
                        f, c, v, w, grid_zyx, ker[0], nidx=ni)
                )(feats, coords, valid, nidx)
            ncoords, nvalid, ngrid = coords, valid, grid_zyx
        else:
            out, ncoords, nvalid, _ = jax.vmap(
                lambda f, c, v: sp.strided_conv3d(
                    f, c, v, w, grid_zyx, self.out_cap, self.stride, ker,
                    pad=self.pad,
                )
            )(feats, coords, valid)
            # spconv output extent: (g + 2p - k)//s + 1 per axis — NOT
            # ceil(g/s); conv4's z-pad 0 and conv_out's (3,1,1) kernel
            # genuinely shrink z (spconv_backbone.py:104-116 comments)
            pd = ((self.pad,) * 3 if isinstance(self.pad, int)
                  else tuple(int(p) for p in self.pad))
            ngrid = tuple(
                (int(grid_zyx[a]) + 2 * pd[a] - ker[a]) // self.stride[a] + 1
                for a in range(3)
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
            out = out + b
        out = MaskedBatchNorm()(out, mask=nvalid, use_running_average=not train)
        if self.relu:
            out = nn.relu(out)
        out = out * nvalid[..., None].astype(out.dtype)
        return out, ncoords, nvalid, ngrid


class SparseResBlock(nn.Module):
    """Residual pair of submanifold convs (SparseBasicBlock,
    spconv_backbone.py:30-67): conv1(+bias)+bn+relu -> conv2(+bias)+bn ->
    add identity -> relu.  The backbone variant's convs carry biases
    (bias = norm_fn is not None) and the final relu runs AFTER the
    identity add; the UNet decoder variant (spconv_unet.py:11-27) is
    bias-free — use_bias selects."""

    channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats, coords, valid, grid_zyx, train: bool,
                 nidx=None):
        identity = feats
        if identity.shape[-1] != self.channels:  # 1x1 projection shortcut
            identity = nn.Dense(self.channels, use_bias=False, name="proj")(identity)
        x, *_ = SparseConvBlock(self.channels, use_bias=self.use_bias,
                                name="conv1")(
            feats, coords, valid, grid_zyx, train, nidx=nidx
        )
        x, *_ = SparseConvBlock(self.channels, use_bias=self.use_bias,
                                relu=False, name="conv2")(
            x, coords, valid, grid_zyx, train, nidx=nidx
        )
        out = nn.relu(x + identity) * valid[..., None].astype(x.dtype)
        return out, coords, valid, grid_zyx


@BACKBONES_3D.register
class VoxelBackBone8x(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    voxel_size: tuple
    point_cloud_range: tuple

    # subclass hooks: submanifold stage body + default channel ladder
    def _stage_block(self, ch, name):
        return SparseConvBlock(ch, name=name)

    _default_channels = (16, 32, 64, 64)  # spconv_backbone.py:85-110
    _stage1_depth = 1  # conv1 = one subm block (:85-87); res variant has two

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = batch["pillar_features"]  # (B, V, C) from MeanVFE
        coords = batch["voxel_coords"]  # (B, V, 3) zyx
        valid = coords[..., 0] >= 0
        v = x.shape[1]
        nx, ny, nz = (int(g) for g in self.grid_size)
        # spconv pads z by +1 (spconv_backbone.py sparse_shape = grid + [1,0,0])
        grid = (nz + 1, ny, nx)

        # stage caps: strided sites include spconv's odd-coordinate halo
        # (downsample_sites), so counts shrink slower than 2x per stage on
        # clustered lidar; overflow beyond a cap is silently dropped in
        # spatial-key order — size VOXEL_CAPS generously per dataset
        caps = self.model_cfg.get(
            "VOXEL_CAPS", [v, v, max(v // 2, 1), max(v // 4, 1)]
        )
        chans = self.model_cfg.get("CHANNELS", list(self._default_channels))
        out_ch = int(self.model_cfg.get("OUT_CHANNELS", 128))

        # one shared rulebook per coordinate set: every subm conv in a
        # stage body probes the same neighbor table, so the (dominant)
        # dense-table lookup runs once per stage, not once per conv
        # (sp.subm_rulebook; v1 oracle engine ignores it)
        def stage_rulebook(c, v_, g):
            if sp._engine() == "v1":
                return None
            return jax.vmap(lambda ci, vi: sp.subm_rulebook(ci, vi, g))(c, v_)

        multi = {}
        rb = stage_rulebook(coords, valid, grid)
        x, coords, valid, grid = SparseConvBlock(chans[0], name="subm0_0")(
            x, coords, valid, grid, train, nidx=rb
        )  # conv_input
        for i in range(self._stage1_depth):  # conv1
            x, coords, valid, grid = self._stage_block(
                chans[0], f"subm0_{i + 1}"
            )(x, coords, valid, grid, train, nidx=rb)
        multi["x_conv1"] = (x, coords, valid, grid)
        for blk in range(1, 4):
            # conv4's strided conv pads (0,1,1) — z shrinks by the full
            # kernel extent (spconv_backbone.py:104-108)
            pad = (0, 1, 1) if blk == 3 else 1
            x, coords, valid, grid = SparseConvBlock(
                chans[blk], stride=(2, 2, 2), out_cap=int(caps[blk]),
                pad=pad, name=f"down{blk}",
            )(x, coords, valid, grid, train)
            rb = stage_rulebook(coords, valid, grid)
            for i in range(2):
                x, coords, valid, grid = self._stage_block(
                    chans[blk], f"subm{blk}_{i}"
                )(x, coords, valid, grid, train, nidx=rb)
            multi[f"x_conv{blk + 1}"] = (x, coords, valid, grid)

        # conv_out: (3,1,1) kernel, (2,1,1) stride, pad 0 — z-compression to
        # D=2 planes (spconv_backbone.py:111-118 "[200, 150, 5] -> [...,2]")
        x, coords, valid, grid = SparseConvBlock(
            out_ch, stride=(2, 1, 1), kernel=(3, 1, 1),
            pad=int(self.model_cfg.get("last_pad", 0)),
            out_cap=int(caps[3]), name="conv_out",
        )(x, coords, valid, grid, train)
        dense = jax.vmap(lambda f, c, m: sp.scatter_to_dense(f, c, m, grid))(
            x, coords, valid
        )  # (B, D, H/8, W/8, C)
        batch["encoded_spconv_tensor"] = dense
        batch["encoded_spconv_tensor_stride"] = 8
        batch["multi_scale_3d_features"] = multi
        return batch


@BACKBONES_3D.register
class VoxelResBackBone8x(VoxelBackBone8x):
    """Residual variant (spconv_backbone.py:183-240): two SparseBasicBlocks
    per stage body, channel ladder 16/32/64/128."""

    _default_channels = (16, 32, 64, 128)
    _stage1_depth = 2

    def _stage_block(self, ch, name):
        return SparseResBlock(ch, name=name)


class SemSegEncoder(nn.Module):
    """Compact conv image encoder for focal multimodal fusion
    (focal_sparse_conv/SemanticSeg pyramid_ffn.PyramidFeat2D role: the
    reference runs a COCO-pretrained DeepLabV3-ResNet50 'layer1' and a 1x1
    channel_reduce to 16ch; the pretrained checkpoint is an external
    artifact, so this encoder trains jointly instead).  images (B, H, W, 3)
    -> features (B, H/4, W/4, out_channels)."""

    out_channels: int = 16

    @nn.compact
    def __call__(self, images, train: bool = True):
        from .layers import ConvBNReLU

        x = ConvBNReLU(32, kernel=3, stride=2, name="stem0")(images, train)
        x = ConvBNReLU(64, kernel=3, stride=2, name="stem1")(x, train)
        x = ConvBNReLU(64, kernel=3, stride=1, name="body")(x, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="channel_reduce")(x)


def voxel_image_features(img_feats, coords, valid, grid_zyx, stride,
                         voxel_size, pc_range, l2c, c2i, feat_ds, img_hw,
                         noise_rot, noise_scale, flip_x, flip_y):
    """Gather per-voxel image features by projecting voxel centers into the
    camera (focal_sparse_conv.construct_multimodal_features:51-114, done
    in-jit with the batch's calib matrices instead of a host roundtrip).
    World augs are reversed scale -> rotation -> flips before projecting.

    Per-sample: img_feats (h, w, C); coords (V, 3) zyx at ``stride``;
    returns (V, C) bilinear-sampled features, zero out-of-view.
    """
    vx, vy, vz = (float(v) for v in voxel_size)
    x = coords[:, 2].astype(jnp.float32) * (vx * stride) + pc_range[0]
    y = coords[:, 1].astype(jnp.float32) * (vy * stride) + pc_range[1]
    z = coords[:, 0].astype(jnp.float32) * (vz * stride) + pc_range[2]
    # reverse the recorded world augs (reference :85-93)
    inv_scale = 1.0 / jnp.maximum(noise_scale, 1e-6)
    x, y, z = x * inv_scale, y * inv_scale, z * inv_scale
    c, s = jnp.cos(-noise_rot), jnp.sin(-noise_rot)
    x, y = x * c - y * s, x * s + y * c
    y = jnp.where(flip_x, -y, y)
    x = jnp.where(flip_y, -x, x)

    pts = jnp.stack([x, y, z, jnp.ones_like(x)], axis=-1)  # (V, 4)
    cam = (pts @ l2c.T)[:, :3]
    img = jnp.concatenate([cam, jnp.ones_like(cam[:, :1])], -1) @ c2i.T
    depth = img[:, 2]
    uv = img[:, :2] / jnp.clip(depth[:, None], 1e-6, None)
    h, w = img_feats.shape[:2]
    u = uv[:, 0] / feat_ds
    v = uv[:, 1] / feat_ds
    # in-view bound = the TRUE image extent (img_hw), not the statically
    # padded feature extent — voxels projecting into the zero-pad band
    # beyond the real image edge must be masked out, not sampled
    hw = jnp.asarray(img_hw, jnp.float32)
    h_lim = jnp.minimum(hw[0] / feat_ds, jnp.float32(h)) - 1
    w_lim = jnp.minimum(hw[1] / feat_ds, jnp.float32(w)) - 1
    inview = ((depth > 0) & (u >= 0) & (u < w_lim) & (v >= 0) & (v < h_lim)
              & valid)
    u = jnp.clip(u, 0, w - 1.001)
    v = jnp.clip(v, 0, h - 1.001)
    u0, v0 = jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)
    fu, fv = u - u0, v - v0
    g = (img_feats[v0, u0] * ((1 - fu) * (1 - fv))[:, None]
         + img_feats[v0, u0 + 1] * (fu * (1 - fv))[:, None]
         + img_feats[v0 + 1, u0] * ((1 - fu) * fv)[:, None]
         + img_feats[v0 + 1, u0 + 1] * (fu * fv)[:, None])
    return g * inview[:, None].astype(g.dtype)


class FocalSparseConvBlock(nn.Module):
    """Focal sparse conv (focal_sparse_conv.py FocalSparseConv):
    a small importance submconv predicts 27 logits per voxel (26 kernel
    offsets + the voxel's own cubic importance); foreground voxels spawn
    capped, deduplicated neighbor voxels; a regular submconv + BN + ReLU then
    runs over the enlarged set.  The own-importance probabilities are stored
    for the in-gt-box focal supervision (batch["focal_probs"/...]).

    With ``img_gather`` (the use_img branch, focal_sparse_conv.py:202-220)
    the importance conv also sees image features gathered at the voxels'
    camera projections, and the block output gets the image features at the
    enlarged voxel set summed in (fuse_sum)."""

    out_channels: int
    threshold: float = 0.5
    spawn_cap: int = 1024
    mask_multi: bool = False

    @nn.compact
    def __call__(self, feats, coords, valid, grid_zyx, train: bool,
                 img_gather=None):
        cin = feats.shape[-1]
        imp_in = feats
        if img_gather is not None:
            imp_in = jnp.concatenate([img_gather(coords, valid), feats], -1)
        w_imp = self.param(
            "imp_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, imp_in.shape[-1], 27), jnp.float32)
        imps = jax.vmap(
            lambda f, c, v: sp.submanifold_conv3d(f, c, v, w_imp, grid_zyx)
        )(imp_in, coords, valid)
        out = jax.vmap(
            lambda f, c, v, i: sp.focal_split_and_spawn(
                f, c, v, i, grid_zyx, self.threshold, self.spawn_cap,
                self.mask_multi)
        )(feats, coords, valid, imps)
        nfeats, ncoords, nvalid, own = out
        x, c2, v2, g2 = SparseConvBlock(self.out_channels, name="conv")(
            nfeats, ncoords, nvalid, grid_zyx, train)
        if img_gather is not None:
            img_out = img_gather(c2, v2)
            if img_out.shape[-1] != x.shape[-1]:
                img_out = nn.Dense(x.shape[-1], use_bias=False,
                                   name="img_proj")(img_out)
            x = x + img_out * v2[..., None].astype(x.dtype)
        return x, c2, v2, g2, own


@BACKBONES_3D.register
class VoxelBackBone8xFocal(VoxelBackBone8x):
    """VoxelBackBone8x with focal sparse convs after the configured stages
    (spconv_backbone_focal.py VoxelBackBone8xFocal role, lidar-only path).
    Emits batch["focal_probs"]/["focal_coords3d"]/["focal_valid"] lists for
    the in-gt-box focal loss."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = batch["pillar_features"]
        coords = batch["voxel_coords"]
        valid = coords[..., 0] >= 0
        v = x.shape[1]
        nx, ny, nz = (int(g) for g in self.grid_size)
        grid = (nz + 1, ny, nx)
        caps = self.model_cfg.get(
            "VOXEL_CAPS", [v, max(v // 2, 1), max(v // 4, 1), max(v // 8, 1)])
        chans = self.model_cfg.get("CHANNELS", list(self._default_channels))
        out_ch = int(self.model_cfg.get("OUT_CHANNELS", 128))
        focal_stages = set(self.model_cfg.get("FOCAL_STAGES", [0, 1]))
        thr = float(self.model_cfg.get("FOCAL_THRESHOLD", 0.5))
        spawn = int(self.model_cfg.get("SPAWN_CAP", max(v // 4, 64)))

        probs, pcoords, pvalid, strides = [], [], [], []
        multi = {}
        x, coords, valid, grid = SparseConvBlock(chans[0], name="subm0_0")(
            x, coords, valid, grid, train)
        for i in range(self._stage1_depth):  # conv1
            x, coords, valid, grid = self._stage_block(
                chans[0], f"subm0_{i + 1}")(x, coords, valid, grid, train)

        use_img = bool(self.model_cfg.get("USE_IMG", False)) and \
            "images" in batch
        if use_img:
            # multimodal focal conv at stride 1, right after the input subm
            # stage (spconv_backbone_focal.py conv_focal_multimodal)
            cimg = int(self.model_cfg.get("IMG_CHANNELS", 16))
            img_feats = SemSegEncoder(cimg, name="semseg")(
                batch["images"], train)
            b = img_feats.shape[0]
            ones = jnp.ones((b,), jnp.float32)
            zerosb = jnp.zeros((b,), bool)
            noise_rot = batch.get("noise_rot", jnp.zeros((b,)))
            noise_scale = batch.get("noise_scale", ones)
            flip_x = batch.get("flip_x", zerosb).astype(bool)
            flip_y = batch.get("flip_y", zerosb).astype(bool)
            pc_range = jnp.asarray(self.point_cloud_range, jnp.float32)

            img_hw = batch.get("image_shape")  # (B, 2) true extents
            if img_hw is None:
                img_hw = jnp.broadcast_to(jnp.asarray(
                    batch["images"].shape[1:3], jnp.float32), (b, 2))

            def img_gather(c_, v_):
                return jax.vmap(
                    lambda fi, ci, vi, l2c, c2i, hw, nr, ns, fx, fy:
                    voxel_image_features(
                        fi, ci, vi, grid, 1, self.voxel_size, pc_range,
                        l2c, c2i, 4.0, hw, nr, ns, fx, fy)
                )(img_feats, c_, v_, batch["trans_lidar_to_cam"],
                  batch["trans_cam_to_img"], img_hw, noise_rot, noise_scale,
                  flip_x, flip_y)

            x, coords, valid, grid, own = FocalSparseConvBlock(
                chans[0], thr, spawn, name="focal_mm")(
                x, coords, valid, grid, train, img_gather=img_gather)
            probs.append(own)
            pcoords.append(coords[:, : own.shape[1]])
            pvalid.append(valid[:, : own.shape[1]])
            strides.append(1)

        if 0 in focal_stages:
            x, coords, valid, grid, own = FocalSparseConvBlock(
                chans[0], thr, spawn, name="focal0")(x, coords, valid, grid,
                                                     train)
            probs.append(own)
            pcoords.append(coords[:, : own.shape[1]])
            pvalid.append(valid[:, : own.shape[1]])
            strides.append(1)
        multi["x_conv1"] = (x, coords, valid, grid)
        for blk in range(1, 4):
            x, coords, valid, grid = SparseConvBlock(
                chans[blk], stride=(2, 2, 2), out_cap=int(caps[blk]),
                pad=(0, 1, 1) if blk == 3 else 1,
                name=f"down{blk}")(x, coords, valid, grid, train)
            for i in range(2):
                x, coords, valid, grid = self._stage_block(
                    chans[blk], f"subm{blk}_{i}")(x, coords, valid, grid, train)
            if blk in focal_stages:
                x, coords, valid, grid, own = FocalSparseConvBlock(
                    chans[blk], thr, max(spawn // (2**blk), 64),
                    name=f"focal{blk}")(x, coords, valid, grid, train)
                probs.append(own)
                pcoords.append(coords[:, : own.shape[1]])
                pvalid.append(valid[:, : own.shape[1]])
                strides.append(2**blk)
            multi[f"x_conv{blk + 1}"] = (x, coords, valid, grid)

        x, coords, valid, grid = SparseConvBlock(
            out_ch, stride=(2, 1, 1), kernel=(3, 1, 1),
            pad=int(self.model_cfg.get("last_pad", 0)),
            out_cap=int(caps[3]), name="conv_out",
        )(x, coords, valid, grid, train)
        dense = jax.vmap(lambda f, c, m: sp.scatter_to_dense(f, c, m, grid))(
            x, coords, valid)
        batch["encoded_spconv_tensor"] = dense
        batch["encoded_spconv_tensor_stride"] = 8
        batch["multi_scale_3d_features"] = multi
        batch["focal_probs"] = probs
        batch["focal_coords"] = pcoords
        batch["focal_valid"] = pvalid
        batch["focal_strides"] = strides
        return batch


def focal_conv_loss(batch, voxel_size, point_cloud_range, gamma: float = 2.0):
    """In-gt-box focal supervision for the voxel importance predictions
    (focal_sparse_conv.py:135-147 + FocalLoss)."""
    from ..ops.boxes import points_in_rbbox

    gt = batch["gt_boxes"]
    total = 0.0
    vx, vy, vz = (float(s) for s in voxel_size)
    x0, y0, z0 = (float(s) for s in point_cloud_range[:3])
    for own, coords, valid, stride in zip(
        batch["focal_probs"], batch["focal_coords"], batch["focal_valid"],
        batch["focal_strides"],
    ):
        centers = jnp.stack(
            [
                coords[..., 2].astype(jnp.float32) * vx * stride + x0,
                coords[..., 1].astype(jnp.float32) * vy * stride + y0,
                coords[..., 0].astype(jnp.float32) * vz * stride + z0,
            ],
            axis=-1,
        )

        def one(c, g, m):
            gt_valid = g[:, -1] > 0
            inside = points_in_rbbox(c, g[:, :7], xp=jnp) & gt_valid[None, :]
            return inside.any(axis=1) & m

        tgt = jax.vmap(one)(centers, gt, valid).astype(jnp.float32)
        p = jnp.clip(jnp.where(tgt > 0, own, 1 - own), 1e-7, 1 - 1e-7)
        per = -((1 - p) ** gamma) * jnp.log(p)
        vm = valid.astype(jnp.float32)
        total = total + (per * vm).sum() / jnp.clip(vm.sum(), 1.0, None)
    return total


class InverseConvBlock(nn.Module):
    """Inverse sparse conv + masked BN + ReLU (spconv_unet inverseconv).

    ``pad`` must match the DOWNSAMPLING conv whose rulebook this inverts
    (spconv reuses the forward indice rulebook via indice_key)."""

    out_channels: int
    stride: tuple = (2, 2, 2)
    kernel: int = 3
    pad: int | tuple = 1

    @nn.compact
    def __call__(self, feats, coords, valid, grid_lo, hi_coords, hi_valid,
                 train: bool):
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.kernel**3, cin, self.out_channels),
            jnp.float32,
        )
        out = jax.vmap(
            lambda f, c, v, hc, hv: sp.inverse_conv3d(
                f, c, v, w, hc, hv, grid_lo, self.stride, self.kernel,
                pad=self.pad,
            )
        )(feats, coords, valid, hi_coords, hi_valid)
        out = MaskedBatchNorm()(out, mask=hi_valid, use_running_average=not train)
        return nn.relu(out) * hi_valid[..., None].astype(out.dtype)


def channel_reduction(x, out_channels: int):
    """(.., C1) -> (.., C2) by summing C1/C2 groups (spconv_unet.py:150-163)."""
    n = x.shape[:-1]
    c1 = x.shape[-1]
    assert c1 % out_channels == 0
    return x.reshape(*n, out_channels, c1 // out_channels).sum(-1)


@BACKBONES_3D.register
class UNetV2(nn.Module):
    """Sparse UNet encoder-decoder for point-wise features (PartA2 backbone,
    pcdet/models/backbones_3d/spconv_unet.py:89-212): VoxelBackBone8x-shaped
    encoder, decoder UR blocks (lateral res-block, concat with bottom,
    channel-reduced residual, inverse conv back up the stride pyramid).
    Emits per-voxel point_features/point_coords at input resolution plus the
    stride-8 dense tensor for the BEV head."""

    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    voxel_size: tuple
    point_cloud_range: tuple

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = batch["pillar_features"]  # (B, V, C)
        coords = batch["voxel_coords"]  # (B, V, 3) zyx
        valid = coords[..., 0] >= 0
        v = x.shape[1]
        nx, ny, nz = (int(g) for g in self.grid_size)
        grid = (nz + 1, ny, nx)
        # stage caps: strided sites include spconv's odd-coordinate halo
        # (downsample_sites), so counts shrink slower than 2x per stage on
        # clustered lidar; overflow beyond a cap is silently dropped in
        # spatial-key order — size VOXEL_CAPS generously per dataset
        caps = self.model_cfg.get(
            "VOXEL_CAPS", [v, v, max(v // 2, 1), max(v // 4, 1)]
        )
        chans = self.model_cfg.get("CHANNELS", [16, 32, 64, 64])

        # one shared rulebook per stage coordinate set — reused by the
        # encoder subm convs AND the decoder blocks at the same sites
        def stage_rulebook(c, v_, g):
            if sp._engine() == "v1":
                return None
            return jax.vmap(lambda ci, vi: sp.subm_rulebook(ci, vi, g))(c, v_)

        # --- encoder ---
        rb = stage_rulebook(coords, valid, grid)
        x, *_ = SparseConvBlock(chans[0], name="conv_input")(
            x, coords, valid, grid, train, nidx=rb)
        x, *_ = SparseConvBlock(chans[0], name="conv1")(
            x, coords, valid, grid, train, nidx=rb)
        stages = [(x, coords, valid, grid, rb)]
        for blk in range(1, 4):
            # conv4's strided conv pads (0,1,1) like the encoder backbone
            # (spconv_unet.py:90-94) — z genuinely shrinks
            pad = (0, 1, 1) if blk == 3 else 1
            x, coords, valid, grid = SparseConvBlock(
                chans[blk], stride=(2, 2, 2), out_cap=int(caps[blk]),
                pad=pad, name=f"down{blk}")(x, coords, valid, grid, train)
            rb = stage_rulebook(coords, valid, grid)
            for i in range(2):
                x, coords, valid, grid = SparseConvBlock(
                    chans[blk], name=f"subm{blk}_{i}")(
                    x, coords, valid, grid, train, nidx=rb)
            stages.append((x, coords, valid, grid, rb))

        if self.model_cfg.get("RETURN_ENCODED_TENSOR", True):
            # (3,1,1) kernel, (2,1,1) stride, pad last_pad (spconv_unet.py:
            # 100-106) — D=2 z-planes at the kitti scale, so MAP_TO_BEV's
            # NUM_BEV_FEATURES = 2 * 128 matches the reference config
            xo, co, vo, go = SparseConvBlock(
                128, stride=(2, 1, 1), kernel=(3, 1, 1),
                pad=int(self.model_cfg.get("last_pad", 0)),
                out_cap=int(caps[3]), name="conv_out"
            )(x, coords, valid, grid, train)
            dense = jax.vmap(lambda f, c, m: sp.scatter_to_dense(f, c, m, go))(
                xo, co, vo)
            batch["encoded_spconv_tensor"] = dense
            batch["encoded_spconv_tensor_stride"] = 8

        # --- decoder (UR blocks, spconv_unet.py:141-149) ---
        def ur_block(lateral, bottom, stage_idx, out_ch, name, inverse=True):
            lx, lc, lv, lg, lrb = stages[stage_idx]
            x_trans, *_ = SparseResBlock(lateral.shape[-1], use_bias=False,
                                         name=f"{name}_t")(
                lateral, lc, lv, lg, train, nidx=lrb)
            cat = jnp.concatenate([bottom, x_trans], axis=-1)
            x_m, *_ = SparseConvBlock(out_ch if not inverse else lateral.shape[-1],
                                      name=f"{name}_m")(cat, lc, lv, lg, train,
                                                        nidx=lrb)
            x_red = channel_reduction(cat, x_m.shape[-1])
            merged = x_m + x_red
            if not inverse:
                out, *_ = SparseConvBlock(out_ch, name=f"{name}_post")(
                    merged, lc, lv, lg, train, nidx=lrb)
                return out
            hx, hc, hv, hg, _ = stages[stage_idx - 1]
            # invert the down conv's rulebook: down3 z-pads 0 (conv4 stage)
            inv_pad = (0, 1, 1) if stage_idx == 3 else 1
            return InverseConvBlock(out_ch, pad=inv_pad, name=f"{name}_inv")(
                merged, lc, lv, lg, hc, hv, train)

        x4, *_ = stages[3]
        x_up4 = ur_block(x4, x4, 3, chans[2], "up4")          # -> stage-2 sites
        x2 = stages[2][0]
        x_up3 = ur_block(x2, x_up4, 2, chans[1], "up3")       # -> stage-1 sites
        x1 = stages[1][0]
        x_up2 = ur_block(x1, x_up3, 1, chans[0], "up2")       # -> stage-0 sites
        x0, c0, v0, g0, _ = stages[0]
        x_up1 = ur_block(x0, x_up2, 0, chans[0], "up1", inverse=False)

        vx, vy, vz = self.voxel_size
        x0c = c0.astype(x_up1.dtype)
        centers = jnp.stack(
            [
                x0c[..., 2] * vx + vx / 2 + self.point_cloud_range[0],
                x0c[..., 1] * vy + vy / 2 + self.point_cloud_range[1],
                x0c[..., 0] * vz + vz / 2 + self.point_cloud_range[2],
            ],
            axis=-1,
        )
        batch["point_features"] = x_up1  # (B, V, 16)
        batch["point_coords"] = centers  # (B, V, 3)
        batch["point_valid"] = v0
        return batch
