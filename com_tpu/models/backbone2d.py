"""BEV 2D backbone (pcdet/models/backbones_2d/base_bev_backbone.py:6-112 parity).

N stride blocks of (Conv+BN+ReLU) x layer_nums, transpose-conv lateral
upsampling, channel concat.  NHWC throughout; convs hit the MXU directly.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.sharding import canvas_spec, constrain
from ..utils.registry import BACKBONES_2D
from .layers import ConvBNReLU


class _BEVBody(nn.Module):
    """The conv stack as a (x, train) -> x module, so an optional
    ``jax.checkpoint`` (nn.remat) boundary wraps pure array work — the batch
    dict with its static int entries (stride tags) stays outside."""

    model_cfg: dict
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        cfg = self.model_cfg
        layer_nums = list(cfg.get("LAYER_NUMS", []))
        strides = list(cfg.get("LAYER_STRIDES", []))
        filters = list(cfg.get("NUM_FILTERS", []))
        up_strides = list(cfg.get("UPSAMPLE_STRIDES", []))
        up_filters = list(cfg.get("NUM_UPSAMPLE_FILTERS", []))
        dt = self.dtype
        ups = []
        for i, (ln, st, nf) in enumerate(zip(layer_nums, strides, filters)):
            x = ConvBNReLU(nf, kernel=3, stride=st, dtype=dt)(x, train)
            for _ in range(ln):
                x = ConvBNReLU(nf, kernel=3, stride=1, dtype=dt)(x, train)
            if i < len(up_strides):
                us = up_strides[i]
                if us > 1:
                    u = nn.ConvTranspose(
                        up_filters[i], (us, us), strides=(us, us), use_bias=False,
                        dtype=dt,
                    )(x)
                elif us == 1:
                    u = nn.Conv(up_filters[i], (1, 1), use_bias=False, dtype=dt)(x)
                else:  # us < 1 encoded as stride 1/|us| downsample conv
                    ds = int(round(1 / us))
                    u = nn.Conv(
                        up_filters[i], (ds, ds), strides=(ds, ds), use_bias=False,
                        dtype=dt,
                    )(x)
                u = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=dt)(u)
                u = nn.relu(u)
                ups.append(u)
        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif len(ups) == 1:
            x = ups[0]
        # optional extra deconv on the concat (reference supports
        # len(UPSAMPLE_STRIDES) > len(LAYER_NUMS))
        if len(up_strides) > len(layer_nums):
            us = up_strides[-1]
            x = nn.ConvTranspose(up_filters[-1], (us, us), strides=(us, us),
                                 use_bias=False, dtype=dt)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=dt)(x)
            x = nn.relu(x)
        return x


@BACKBONES_2D.register
class BaseBEVBackbone(nn.Module):
    """BEV backbone (base_bev_backbone.py parity).  ``REMAT: true`` in the
    config wraps the conv stack in jax.checkpoint: activations are
    rematerialized in the backward pass, trading ~1/3 extra conv FLOPs for
    dropping the largest activation working set (the 468x468 canvas stack)
    from HBM — the lever for bigger per-chip batches."""

    model_cfg: dict
    input_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, batch, train: bool = True):
        body_cls = _BEVBody
        if self.model_cfg.get("REMAT", False):
            body_cls = nn.remat(_BEVBody, static_argnums=(2,))
        x = batch["spatial_features"]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = body_cls(model_cfg=self.model_cfg, dtype=self.dtype,
                     name="body")(x, train)
        batch["spatial_features_2d"] = constrain(x, *canvas_spec())
        return batch


