"""ImageVFE — CaDDN camera-only voxel features (flax).

Rebuild of pcdet/models/backbones_3d/vfe/image_vfe.py + image_vfe_modules/
(~600 LoC): a depth-distribution network over the image (DDN), frustum
feature volume = depth softmax x image features (DepthFFN), and a frustum ->
voxel trilinear resampling through the calibration matrices
(FrustumGridGenerator + Sampler).  kornia's grid_sample/meshgrid/
transform_points are replaced by explicit jnp math.

The reference DDN is a pretrained DeepLabV3-ResNet101; pretrained torch
weights are out of scope here, so the DDN is a compact dilated-conv
encoder (same interface: image -> {features, logits(D+1)}).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import VFES
from .layers import ConvBNReLU


# ---- transform_utils roles -------------------------------------------------

def bin_depths(depth_map, mode, depth_min, depth_max, num_bins, target=False):
    """Depth -> bin index (pcdet/utils/transform_utils.py bin_depths):
    UD uniform, LID linearly-increasing, SID log.  target=True clamps
    out-of-range depths into the extra (num_bins) class."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            jnp.clip(1 + 8 * (depth_map - depth_min) / bin_size, 0.0, None))
    elif mode == "SID":
        indices = num_bins * (
            jnp.log(1 + jnp.clip(depth_map, 1e-6, None))
            - np.log(1 + depth_min)
        ) / (np.log(1 + depth_max) - np.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    if target:
        indices = jnp.where(
            (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices),
            float(num_bins), indices)
        return jnp.floor(indices).astype(jnp.int32)
    return indices


def project_to_image(points, proj):
    """(..., 3) camera points + (3, 4) projection -> ((..., 2) uv, (...,) depth)
    (transform_utils.project_to_image role)."""
    ones = jnp.ones((*points.shape[:-1], 1), points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)
    img = hom @ proj.T  # (..., 3)
    depth = img[..., 2]
    uv = img[..., :2] / jnp.clip(depth[..., None], 1e-6, None)
    return uv, depth


def trilinear_sample(volume, coords):
    """volume (D, H, W, C); coords (..., 3) as (d, y, x) index-space floats.
    Zero padding outside."""
    d, h, w, _ = volume.shape
    out = 0.0
    base = jnp.floor(coords)
    frac = coords - base
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zi = base[..., 0] + dz
                yi = base[..., 1] + dy
                xi = base[..., 2] + dx
                inside = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
                          & (xi >= 0) & (xi < w))
                v = volume[
                    jnp.clip(zi, 0, d - 1).astype(jnp.int32),
                    jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                    jnp.clip(xi, 0, w - 1).astype(jnp.int32),
                ]
                wgt = ((frac[..., 0] if dz else 1 - frac[..., 0])
                       * (frac[..., 1] if dy else 1 - frac[..., 1])
                       * (frac[..., 2] if dx else 1 - frac[..., 2]))
                out = out + v * (wgt * inside)[..., None]
    return out


# ---- modules ---------------------------------------------------------------

class DDN(nn.Module):
    """Compact dilated-conv depth-distribution network (ddn_deeplabv3 role):
    image (H, W, 3) -> features (H/ds, W/ds, C) + depth logits (D+1)."""

    num_bins: int
    feat_channels: int = 64
    downsample: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        ds = self.downsample
        c = self.feat_channels
        x = ConvBNReLU(c // 2, kernel=3, stride=2, name="stem0")(x, train)
        if ds >= 4:
            x = ConvBNReLU(c, kernel=3, stride=2, name="stem1")(x, train)
        for i, rate in enumerate((1, 2, 4)):  # dilated ASPP-style trunk
            x = nn.Conv(c, (3, 3), kernel_dilation=(rate, rate),
                        use_bias=False, name=f"aspp_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"aspp_bn_{i}")(x)
            x = nn.relu(x)
        feats = ConvBNReLU(c, kernel=1, name="feat_out")(x, train)
        logits = nn.Conv(self.num_bins + 1, (1, 1), name="depth_logits")(x)
        return feats, logits


@VFES.register
class ImageVFE(nn.Module):
    """Camera -> voxel features (image_vfe.py + DepthFFN + FrustumToVoxel).

    Consumes batch["images"] (B, H, W, 3), batch["trans_lidar_to_cam"]
    (B, 4, 4), batch["trans_cam_to_img"] (B, 3, 4); emits
    batch["encoded_spconv_tensor"] dense (B, Z, Y, X, C) for Conv2DCollapse
    and the depth logits for the DDN loss.
    """

    model_cfg: dict
    num_point_features: int = 0
    voxel_size: tuple = (0.16, 0.16, 0.16)
    point_cloud_range: tuple = (2, -30.08, -3.0, 46.8, 30.08, 1.0)
    grid_size: tuple = (280, 376, 25)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cfg = self.model_cfg
        disc = cfg["FFN"]["DISCRETIZE"]
        num_bins = int(disc["num_bins"])
        channels = int(cfg["FFN"].get("CHANNEL_REDUCE", {}).get(
            "out_channels", 64))
        ds = int(cfg.get("DOWNSAMPLE_FACTOR", 4))

        images = batch["images"]  # (B, H, W, 3)
        feats, logits = DDN(num_bins=num_bins, feat_channels=channels,
                            downsample=ds, name="ddn")(images, train)
        batch["depth_logits"] = logits  # (B, H/ds, W/ds, D+1)

        # frustum features: softmax depth (drop the beyond-range bin) x feats
        probs = jax.nn.softmax(logits, axis=-1)[..., :num_bins]
        # (B, h, w, D, C)
        frustum = probs[..., :, None] * feats[..., None, :]

        # voxel grid centers -> lidar -> camera -> image/frustum coords
        nx, ny, nz = (int(g) for g in self.grid_size)
        vx, vy, vz = (float(v) for v in self.voxel_size)
        x0, y0, z0 = (float(v) for v in self.point_cloud_range[:3])
        gx, gy, gz = jnp.meshgrid(
            (jnp.arange(nx) + 0.5) * vx + x0,
            (jnp.arange(ny) + 0.5) * vy + y0,
            (jnp.arange(nz) + 0.5) * vz + z0,
            indexing="ij",
        )
        grid_lidar = jnp.stack([gx, gy, gz], axis=-1)  # (X, Y, Z, 3)

        def per_sample(fr, l2c, c2i, ishape):
            ones = jnp.ones((*grid_lidar.shape[:-1], 1), grid_lidar.dtype)
            cam = jnp.concatenate([grid_lidar, ones], -1) @ l2c.T
            uv, depth = project_to_image(cam[..., :3], c2i)
            dbin = bin_depths(depth, disc["mode"], float(disc["depth_min"]),
                              float(disc["depth_max"]), num_bins)
            # frustum volume is (h, w) at 1/ds resolution of the image
            coords = jnp.stack(
                [dbin, uv[..., 1] / ds, uv[..., 0] / ds], axis=-1)
            coords = jnp.where(jnp.isfinite(coords), coords, -2.0)
            # zero voxels projecting beyond the TRUE (pre-pad) image extent
            # — the DDN computes nonzero features over the zero-pad band
            # (reference FrustumGridGenerator normalizes by image_shape)
            in_img = ((uv[..., 0] >= 0) & (uv[..., 0] < ishape[1])
                      & (uv[..., 1] >= 0) & (uv[..., 1] < ishape[0]))
            coords = jnp.where(in_img[..., None], coords, -2.0)
            vol = jnp.transpose(fr, (2, 0, 1, 3))  # (D, h, w, C)
            return trilinear_sample(vol, coords)  # (X, Y, Z, C)

        ishape = batch.get(
            "image_shape",
            jnp.tile(jnp.asarray(images.shape[1:3]), (images.shape[0], 1)))
        vox = jax.vmap(per_sample)(
            frustum, batch["trans_lidar_to_cam"], batch["trans_cam_to_img"],
            ishape,
        )  # (B, X, Y, Z, C)
        dense = jnp.transpose(vox, (0, 3, 2, 1, 4))  # (B, Z, Y, X, C)
        batch["encoded_spconv_tensor"] = dense
        batch["encoded_spconv_tensor_stride"] = 1
        return batch


def ddn_loss(batch, model_cfg):
    """Depth-distribution focal loss with fg/bg balancing
    (ddn_loss/ddn_loss.py + balancer.py roles)."""
    cfg = model_cfg["FFN"]["LOSS"]
    disc = model_cfg["FFN"]["DISCRETIZE"]
    ds = int(model_cfg.get("DOWNSAMPLE_FACTOR", 4))
    num_bins = int(disc["num_bins"])
    alpha = float(cfg["ARGS"].get("alpha", 0.25))
    gamma = float(cfg["ARGS"].get("gamma", 2.0))
    fg_w = float(cfg["ARGS"].get("fg_weight", 13))
    bg_w = float(cfg["ARGS"].get("bg_weight", 1))
    weight = float(cfg["ARGS"].get("weight", 3.0))

    logits = batch["depth_logits"]  # (B, h, w, D+1)
    depth_maps = batch["depth_maps"]  # (B, H, W)
    b, h, w, _ = logits.shape
    dm = depth_maps[:, : h * ds : ds, : w * ds : ds]
    target = bin_depths(dm, disc["mode"], float(disc["depth_min"]),
                        float(disc["depth_max"]), num_bins, target=True)
    one_hot = jax.nn.one_hot(target, num_bins + 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    focal = -alpha * (1 - p) ** gamma * logp
    per_px = (focal * one_hot).sum(-1)  # (B, h, w)

    # fg/bg balancing from 2D boxes (balancer.py): pixels inside any gt box
    fg_mask = jnp.zeros((b, h, w), bool)
    if "gt_boxes2d" in batch:
        boxes = batch["gt_boxes2d"] / ds  # (B, N, 4) u1 v1 u2 v2
        uu = jnp.arange(w)[None, None, :, None]
        vv = jnp.arange(h)[None, :, None, None]
        valid = (boxes[..., 2] > boxes[..., 0])[:, None, None, :]
        inside = ((uu >= boxes[:, None, None, :, 0])
                  & (uu <= boxes[:, None, None, :, 2])
                  & (vv >= boxes[:, None, None, :, 1])
                  & (vv <= boxes[:, None, None, :, 3]) & valid)
        fg_mask = inside.any(-1)
    bal = jnp.where(fg_mask, fg_w, bg_w)
    num_px = h * w * b
    loss = (per_px * bal).sum() / num_px * weight
    return loss
