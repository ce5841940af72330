"""Map-to-BEV modules (pcdet/models/backbones_2d/map_to_bev parity)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.sharding import canvas_spec, constrain
from ..utils.registry import MAP_TO_BEV


@MAP_TO_BEV.register
class PointPillarScatter(nn.Module):
    """Scatter (B, V, C) hard-voxelized pillar features to (B, H, W, C).

    pointpillar_scatter.py:5-37 parity; NHWC (TPU conv layout).  Padded
    pillars carry coords -1 and are routed to a trash row.
    """

    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz)

    @nn.compact
    def __call__(self, batch, train: bool = True):
        feats = batch["pillar_features"]  # (B, V, C)
        coords = batch["voxel_coords"]  # (B, V, 3) zyx, -1 padding
        b, v, c = feats.shape
        nx, ny, _ = (int(g) for g in self.grid_size)
        valid = coords[..., 0] >= 0
        flat = jnp.where(valid, coords[..., 1] * nx + coords[..., 2], nx * ny)
        canvas = jnp.zeros((b, nx * ny + 1, c), feats.dtype)
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, v))
        # .set, not .max: hard-voxelized pillar ids are unique per sample,
        # and a max against the zero canvas would clip negative channels
        # (MeanVFE-style signed features) to 0
        canvas = canvas.at[bidx, flat].set(
            feats * valid[..., None].astype(feats.dtype)
        )
        batch["spatial_features"] = constrain(
            canvas[:, :-1].reshape(b, ny, nx, c), *canvas_spec())
        return batch


@MAP_TO_BEV.register
class Conv2DCollapse(nn.Module):
    """Learned z-collapse (conv2d_collapse.py role): fold z into channels
    then 1x1-conv down to NUM_BEV_FEATURES."""

    model_cfg: dict

    @nn.compact
    def __call__(self, batch, train: bool = True):
        dense = batch["encoded_spconv_tensor"]  # (B, D, H, W, C)
        b, d, h, w, c = dense.shape
        x = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
        x = nn.Conv(int(self.model_cfg.get("NUM_BEV_FEATURES", 256)), (1, 1),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        batch["spatial_features"] = nn.relu(x)
        batch["spatial_features_stride"] = batch.get("encoded_spconv_tensor_stride", 8)
        return batch


@MAP_TO_BEV.register
class HeightCompression(nn.Module):
    """Sparse -> dense, z folded into channels (height_compression.py:10-26).

    Consumes batch["encoded_spconv_tensor"] = (dense (B, D, H, W, C), stride)
    produced by the sparse 3D backbone and reshapes to (B, H, W, D*C).
    """

    model_cfg: dict

    @nn.compact
    def __call__(self, batch, train: bool = True):
        dense = batch["encoded_spconv_tensor"]  # (B, D, H, W, C)
        b, d, h, w, c = dense.shape
        batch["spatial_features"] = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(
            b, h, w, d * c
        )
        batch["spatial_features_stride"] = batch.get("encoded_spconv_tensor_stride", 8)
        return batch
