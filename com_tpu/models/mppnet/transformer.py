"""MPPNet transformer stack (flax).

TPU-native rebuild of the reference's multi-frame proposal-refinement
transformer (pcdet/models/model_utils/mppnet_utils.py):

* ``MLP`` — relu MLP (mppnet_utils.py:96-107).
* ``FFN`` — residual feed-forward merge block (mppnet_utils.py:377-402).
* ``SpatialMixerBlock`` — MLP-mixer over the 4x4x4 proxy-point grid axes
  (mppnet_utils.py:109-153).
* ``MPPNetEncoderLayer`` — per-group token<-proxy attention + inter-group
  cross attention (mppnet_utils.py:264-365 forward_post).
* ``MPPNetTransformer`` — grouped encoder with learned per-group tokens
  (mppnet_utils.py:155-239); groups = frames (4-frame) or strided frame
  groups fused by an MLP (16-frame, sequence_stride 4).

Layout convention: instead of the reference's seq-major (L, G*B, C) with
group-major batch packing, groups are an explicit leading axis (G, B, L, C)
— same math, XLA-friendly batching, no permute gymnastics.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


class FFN(nn.Module):
    """Residual merge: tgt + dropout(linear2(relu(linear1(norm(tgt+input)))))
    with pre/post layer norms (mppnet_utils.py:377-402)."""

    d_model: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, tgt_input, train: bool = False):
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(tgt_input)
        tgt = nn.LayerNorm()(tgt)
        tgt2 = nn.Dense(self.d_model)(
            nn.Dropout(self.dropout, deterministic=not train)(
                nn.relu(nn.Dense(self.dim_feedforward)(tgt))
            )
        )
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(tgt2)
        return nn.LayerNorm()(tgt)


class SpatialMixerBlock(nn.Module):
    """Mix proxy tokens along each grid axis with tiny MLPs, then a channel
    FFN (mppnet_utils.py:109-153).  src: (B', g^3, C) with grid flattening
    order (x, y, z) like get_dense_grid_points."""

    hidden_dim: int  # mixer MLP hidden (use_mlp_mixer.hidden_dim)
    grid_size: int
    channels: int
    dropout: float = 0.0

    def _mix(self, x, axis, name, train):
        # x: (B', x, y, z, C); mix along `axis` with an MLP over that axis
        xt = jnp.moveaxis(x, axis, -1)
        mixed = MLP(self.hidden_dim, self.grid_size, 3, name=name)(xt)
        mixed = jnp.moveaxis(mixed, -1, axis)
        return nn.LayerNorm(name=name + "_norm")(x + mixed)

    @nn.compact
    def __call__(self, src, train: bool = False):
        bsz, g3, c = src.shape
        g = self.grid_size
        x = src.reshape(bsz, g, g, g, c)  # (B', x, y, z, C)
        x = self._mix(x, 1, "mixer_x", train)
        x = self._mix(x, 2, "mixer_y", train)
        x = self._mix(x, 3, "mixer_z", train)
        x = x.reshape(bsz, g3, c)
        ffn = nn.Sequential([
            nn.Dense(2 * c), nn.relu,
            nn.Dropout(self.dropout, deterministic=not train),
            nn.Dense(c),
        ])
        return nn.LayerNorm()(x + ffn(x))


class MPPNetEncoderLayer(nn.Module):
    """One grouped encoder layer (mppnet_utils.py forward_post).

    src: (G, B', 1 + P, C) — learned token + P proxy tokens per group.
    pos: (1 + P, C) or None.
    Inter-group fusion runs unless this is the last layer.
    """

    d_model: int
    nhead: int
    num_groups: int
    dim_feedforward: int
    mixer_hidden: int
    grid_size: int
    last_layer: bool
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos=None, train: bool = False):
        g, bsz, l, c = src.shape
        p = l - 1
        proxy = src[:, :, 1:]  # (G, B', P, C)
        token = src[:, :, :1]

        # intra-group spatial mixing over the proxy grid
        mixer = SpatialMixerBlock(self.mixer_hidden, self.grid_size, c,
                                  self.dropout)
        proxy = mixer(proxy.reshape(g * bsz, p, c), train).reshape(g, bsz, p, c)

        key = proxy if pos is None else proxy + pos[None, None, 1:]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=c,
            dropout_rate=self.dropout, deterministic=not train)
        summary = attn(
            token.reshape(g * bsz, 1, c),
            key.reshape(g * bsz, p, c),
            proxy.reshape(g * bsz, p, c),
        ).reshape(g, bsz, 1, c)
        token = nn.LayerNorm()(
            token + nn.Dropout(self.dropout, deterministic=not train)(summary)
        )
        t2 = nn.Dense(c)(
            nn.Dropout(self.dropout, deterministic=not train)(
                nn.relu(nn.Dense(self.dim_feedforward)(token))
            )
        )
        token = nn.LayerNorm()(
            token + nn.Dropout(self.dropout, deterministic=not train)(t2)
        )

        if not self.last_layer:
            # inter-group fusion: all groups -> MLP fuse -> per-group cross-attn
            grouped = jnp.concatenate(
                [proxy[i] for i in range(self.num_groups)], axis=-1
            )  # (B', P, G*C)
            fused = MLP(c, c, 4, name="fusion_all_groups")(grouped)  # (B', P, C)
            fkey = fused if pos is None else fused + pos[None, 1:]
            new_groups = []
            ffn = FFN(self.d_model, self.dim_feedforward, self.dropout)
            for i in range(self.num_groups):
                q = proxy[i] if pos is None else proxy[i] + pos[None, 1:]
                cross = nn.MultiHeadDotProductAttention(
                    num_heads=self.nhead, qkv_features=c,
                    dropout_rate=self.dropout, deterministic=not train,
                    name=f"cross_attn_{i}")(q, fkey, fused)
                new_groups.append(ffn(proxy[i], cross, train))
            proxy = jnp.stack(new_groups, axis=0)

        src = jnp.concatenate([token, proxy], axis=2)
        return src, token[:, :, 0]  # tokens: (G, B', C)


class MPPNetTransformer(nn.Module):
    """Grouped encoder over proxy-point features (mppnet_utils.py:155-239).

    Input src: (B', F * P, C) proxy features, frame-major.  Returns
    hs (G, B', C) final per-group tokens and the per-layer token list.
    """

    d_model: int
    nhead: int
    num_encoder_layers: int
    dim_feedforward: int
    num_proxy_points: int
    num_groups: int
    num_frames: int
    sequence_stride: int = 1
    mixer_hidden: int = 16
    grid_size: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos=None, train: bool = False):
        bsz, fp, c = src.shape
        p = self.num_proxy_points
        g = self.num_groups

        if self.num_frames > 4:
            # group frames with stride, fuse each group's frames by MLP
            group_length = self.num_frames // g
            groups = []
            for i in range(g):
                per = [
                    src[:, (i + j * self.sequence_stride) * p:
                         (i + j * self.sequence_stride) * p + p]
                    for j in range(group_length)
                ] if self.sequence_stride > 1 else [
                    src[:, (i * group_length + j) * p:
                         (i * group_length + j) * p + p]
                    for j in range(group_length)
                ]
                groups.append(jnp.concatenate(per, axis=-1))  # (B', P, gl*C)
            merged = MLP(c, c, 4, name="fusion_all_group")(
                jnp.stack(groups, 0).reshape(g * bsz, p, -1)
            ).reshape(g, bsz, p, c)
            base = src[:, : g * p].reshape(bsz, g, p, c).transpose(1, 0, 2, 3)
            fused = FFN(self.d_model, self.dim_feedforward, self.dropout,
                        name="fusion_norm")(
                base.reshape(g * bsz, p, c),
                merged.reshape(g * bsz, p, c), train,
            ).reshape(g, bsz, p, c)
            grouped = fused
        else:
            grouped = src.reshape(bsz, g, p, c).transpose(1, 0, 2, 3)

        token = self.param(
            "token", nn.initializers.zeros, (g, 1, self.d_model)
        )
        tokens0 = jnp.broadcast_to(token[:, None], (g, bsz, 1, self.d_model))
        x = jnp.concatenate([tokens0, grouped], axis=2)  # (G, B', 1+P, C)

        token_list = []
        for li in range(self.num_encoder_layers):
            layer = MPPNetEncoderLayer(
                d_model=self.d_model, nhead=self.nhead, num_groups=g,
                dim_feedforward=self.dim_feedforward,
                mixer_hidden=self.mixer_hidden, grid_size=self.grid_size,
                last_layer=(li == self.num_encoder_layers - 1),
                dropout=self.dropout, name=f"layer_{li}")
            x, tok = layer(x, pos, train)
            token_list.append(tok)
        hs = x[:, :, 0]  # (G, B', C) final tokens
        return hs, token_list


class PointNetFeat(nn.Module):
    """Conv1d 8->64->128->256->channel stack with max-pool
    (mppnet_utils.py:11-36); operates on (B', L, Cin)."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        for c in (64, 128, 256, self.output_channel):
            x = nn.Dense(c)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            if c != self.output_channel:
                x = nn.relu(x)
        return x.max(axis=1), x  # (B', C), (B', L, C)


class SeqBoxEmbed(nn.Module):
    """PointNet over the trajectory box sequence (mppnet_utils.py:38-94):
    emits an auxiliary box residual (B', 7) and a feature (B', channels)."""

    channels: int  # TRANS_INPUT

    @nn.compact
    def __call__(self, box_seq, train: bool = False):
        # box_seq: (B', F, 8) canonical trajectory boxes + timestamp
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="pre_bn")(box_seq)
        x, _ = PointNetFeat(512)(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5)(nn.Dense(256)(x)))
        feat = nn.relu(nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)(
            nn.Dense(self.channels)(x)))
        centers = nn.Dense(3, use_bias=False)(nn.relu(nn.Dense(256)(feat)))
        sizes = nn.Dense(3, use_bias=False)(nn.relu(nn.Dense(256)(feat)))
        headings = nn.Dense(1, use_bias=False)(nn.relu(nn.Dense(256)(feat)))
        return jnp.concatenate([centers, sizes, headings], axis=-1), feat
