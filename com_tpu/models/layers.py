"""Shared building blocks: masked batch norm, conv blocks (NHWC, TPU layout)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics exclude padded rows.

    The reference's PFN uses nn.BatchNorm1d over all (padded) points
    (pcdet vfe/pillar_vfe.py:20-28); padded rows are zeros there and bias the
    statistics — here we mask them out exactly.  Under pjit with a
    batch-sharded mesh the masked mean/var reductions are global (XLA inserts
    the psum), so this is SyncBN for free.
    """

    momentum: float = 0.99  # reference BN momentum 0.01 torch == 0.99 flax
    epsilon: float = 1e-3
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                cnt = jnp.asarray(x.size // features, jnp.float32)
                s = xf.reshape(-1, features).sum(0)
                sq = (xf * xf).reshape(-1, features).sum(0)
            else:
                m = mask.astype(jnp.float32)[..., None]
                cnt = jnp.clip(m.sum(), 1.0, None)
                s = (xf * m).reshape(-1, features).sum(0)
                sq = (xf * xf * m).reshape(-1, features).sum(0)
            mean = s / cnt
            var = jnp.clip(sq / cnt - mean * mean, 0.0, None)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x.astype(jnp.float32) - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        y = y * scale + bias
        return y.astype(x.dtype)


class PallasConv3x3(nn.Module):
    """3x3 stride-1 SAME conv served by the Pallas row-tile kernel
    (ops/pallas/conv2d.py) on TPU, lax.conv elsewhere.  Param tree matches
    nn.Conv(use_bias=False) — name this module "Conv_0" to keep checkpoints
    interchangeable with the nn.Conv path."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.conv2d import conv3x3

        cin = x.shape[-1]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        return conv3x3(x.astype(dt), k.astype(dt))


class ConvBNReLU(nn.Module):
    """Conv2D(NHWC) + BN + ReLU, the reference's basic 2D block.

    dtype=bfloat16 runs the conv (the FLOPs) on the MXU in bf16 with f32
    params and f32 BN statistics — the standard TPU mixed-precision recipe.
    Stride-1 3x3 convs route through the Pallas kernel (pallas=False forces
    XLA's conv emitter).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: object = None
    pallas: bool = True
    # torch BatchNorm2d default eps is 1e-5 (the reference's CenterHead BNs,
    # center_head.py:23-27,78-84); the backbone/PFN BNs pass eps=1e-3
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = True):
        if (self.pallas and self.kernel == 3 and self.stride == 1
                and not self.use_bias):
            x = PallasConv3x3(self.features, dtype=self.dtype,
                              name="Conv_0")(x)
        else:
            # explicit symmetric padding, NOT "SAME": for strided convs on
            # even sizes lax SAME pads (0, 1) while the reference's
            # ZeroPad2d(1)+VALID (base_bev_backbone.py:32-38) is (1, 1) —
            # a one-pixel window shift that breaks checkpoint-import parity
            p = self.kernel // 2
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                use_bias=self.use_bias,
                dtype=self.dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99,
            epsilon=self.epsilon, dtype=self.dtype,
        )(x)
        return nn.relu(x)
