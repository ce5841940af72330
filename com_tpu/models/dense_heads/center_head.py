"""CenterHead (+ curriculum variants) — flax module and box decoding.

Functional split of the reference's CenterHead/CurriculumCenterHead
(pcdet center_head.py:48-369, curriculum_center_head.py:48-511): the flax
module computes predictions only; target assignment lives in
target_assign.py and losses in com_tpu/losses — all pure functions inside the
jitted step, with curriculum statistics carried in explicit state instead of
module attributes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nms import circle_nms, nms_bev
from ...utils.registry import DENSE_HEADS
from ..layers import ConvBNReLU


class _RawConv(nn.Module):
    """Declares a 3x3 conv's leaves (kernel[, bias]) WITHOUT running the
    conv, so the parent can assemble fused kernels across branches while the
    variable tree stays byte-identical to a plain nn.Conv at this scope."""

    shape: tuple  # (3, 3, cin, cout)
    use_bias: bool = True
    bias_init: object = nn.initializers.zeros

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)
        if self.use_bias:
            self.bias = self.param("bias", self.bias_init,
                                   (self.shape[-1],))

    def __call__(self):
        return self.kernel, (self.bias if self.use_bias else None)


class _BranchConvBN(nn.Module):
    """Param-tree twin of ConvBNReLU(kernel=3, stride=1): same leaves
    (Conv_0/kernel[, bias], BatchNorm_0/...) but the conv runs FUSED in the
    parent; norm() applies this branch's BN to its slice of the fused
    output (BN is per-channel, so slice-BN == branch-BN exactly)."""

    features: int
    in_features: int
    use_bias: bool
    epsilon: float = 1e-5
    dtype: object = None

    def setup(self):
        self.conv = _RawConv((3, 3, self.in_features, self.features),
                             use_bias=self.use_bias, name="Conv_0")
        self.bn = nn.BatchNorm(momentum=0.99, epsilon=self.epsilon,
                               dtype=self.dtype, name="BatchNorm_0")

    def __call__(self):
        return self.conv()

    def norm(self, x, train: bool):
        return self.bn(x, use_running_average=not train)


def _conv3x3_same(x, w, dt):
    # Pin the ASSEMBLED kernel to replicated: w is concatenated / slice-
    # updated from per-branch params that shard_state may have model-sharded,
    # and XLA's SPMD partitioner miscompiles conv(spatial-sharded input,
    # feature-sharded kernel) — the hybrid 2x2 mesh read a 5.4x wrong loss,
    # reproduced on the CPU backend with a bare lax.conv (so it is the
    # partitioner, not a TPU emitter).  The head kernels are ~100s of KB;
    # replicated is also the right layout.
    from ...parallel.sharding import replicate

    w = replicate(w)
    if dt is not None:
        x, w = x.astype(dt), w.astype(dt)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SeparateHead(nn.Module):
    """Per-group branch stack: for each target name, (num_conv-1) ConvBNReLU +
    final 3x3 conv with bias (curriculum_center_head.py:11-45).

    Compute path (fused=True, the default when every branch has num_conv<=2):
    the five independent branch stacks run as ONE wide hidden conv
    (64->5*64: full MXU lanes instead of five N=64-cliff convs), per-branch
    BN+ReLU on slices (XLA fuses them into one elementwise pass), and ONE
    block-masked final conv (320->sum(out_channels); zero cross-branch
    weights keep branch independence, and their grads stay zero through the
    assemble-by-slice chain rule).  Measured on the v5e at 468x468x64 with
    the dedup-proof chain harness (tools/perf/microbench_head_fuse.py,
    2026-08-19): 19.9 ms fused vs 28.2 ms separate fwd+bwd.  The variable
    tree is identical in both modes, so checkpoints, the torch importer, and
    the optimizer labeling see no difference."""

    sep_head_dict: dict
    init_bias: float = -2.19
    dtype: object = None
    # reference SeparateHead convs carry a bias when USE_BIAS_BEFORE_NORM
    # (center_head.py:12-28) and their BNs use the torch default eps 1e-5
    use_bias: bool = False
    fused: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        specs = list(self.sep_head_dict.items())
        cin = x.shape[-1]
        if self.fused and all(s["num_conv"] <= 2 for _, s in specs):
            return self._fused(x, specs, cin, train)
        out = {}
        for name, spec in specs:
            h = x
            for _ in range(spec["num_conv"] - 1):
                h = ConvBNReLU(x.shape[-1], kernel=3, dtype=self.dtype,
                               use_bias=self.use_bias, epsilon=1e-5,
                               name=f"{name}_conv{_}")(h, train)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm"
                else nn.initializers.zeros
            )
            h = nn.Conv(
                spec["out_channels"],
                (3, 3),
                padding="SAME",
                use_bias=True,
                bias_init=bias_init,
                dtype=self.dtype,
                name=f"{name}_out",
            )(h)
            out[name] = h.astype(jnp.float32)  # losses/decoding in f32
        return out

    def _fused(self, x, specs, cin, train):
        dt = self.dtype
        hidden, finals = [], []
        for name, spec in specs:
            hid = None
            if spec["num_conv"] >= 2:
                hid = _BranchConvBN(cin, cin, use_bias=self.use_bias,
                                    dtype=dt, name=f"{name}_conv0")
            bias_init = (nn.initializers.constant(self.init_bias)
                         if name == "hm" else nn.initializers.zeros)
            fin_in = cin  # num_conv<=2: the final conv always sees cin
            finals.append(_RawConv((3, 3, fin_in, spec["out_channels"]),
                                   use_bias=True, bias_init=bias_init,
                                   name=f"{name}_out"))
            hidden.append(hid)

        # ONE wide hidden conv over the branches that have one
        hid_idx = [i for i, hld in enumerate(hidden) if hld is not None]
        feats = {}
        if hid_idx:
            ks, bs = zip(*[hidden[i]() for i in hid_idx])
            h = _conv3x3_same(x, jnp.concatenate(ks, axis=-1), dt)
            if self.use_bias:
                b = jnp.concatenate(bs)
                h = h + b.astype(h.dtype)
            for j, i in enumerate(hid_idx):
                sl = h[..., j * cin : (j + 1) * cin]
                feats[i] = nn.relu(hidden[i].norm(sl, train))
        for i, hld in enumerate(hidden):
            if hld is None:
                feats[i] = x  # num_conv == 1: final conv reads the input

        # ONE block-masked final conv: stack the (per-branch, disjoint-slice)
        # kernels into (3, 3, n*cin, sum(out)); zeros elsewhere
        n = len(specs)
        total = sum(s["out_channels"] for _, s in specs)
        wfin = jnp.zeros((3, 3, n * cin, total),
                         dt if dt is not None else jnp.float32)
        bfin, off = [], 0
        for i, (name, spec) in enumerate(specs):
            k, b = finals[i]()
            wfin = jax.lax.dynamic_update_slice(
                wfin, k.astype(wfin.dtype), (0, 0, i * cin, off))
            bfin.append(b)
            off += spec["out_channels"]
        hcat = jnp.concatenate([feats[i] for i in range(n)], axis=-1)
        o = _conv3x3_same(hcat, wfin, dt)
        o = o + jnp.concatenate(bfin).astype(o.dtype)

        out, off = {}, 0
        for name, spec in specs:
            oc = spec["out_channels"]
            out[name] = o[..., off : off + oc].astype(jnp.float32)
            off += oc
        return out


@DENSE_HEADS.register
class CenterHead(nn.Module):
    """Shared conv + one SeparateHead per class group.  Returns pred dicts."""

    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple

    def head_class_groups(self):
        """[(head_idx, [global 1-based class ids])] from CLASS_NAMES_EACH_HEAD."""
        groups = []
        for names in self.model_cfg["CLASS_NAMES_EACH_HEAD"]:
            ids = [self.class_names.index(n) + 1 for n in names if n in self.class_names]
            groups.append(tuple(ids))
        return groups

    @nn.compact
    def __call__(self, batch, train: bool = True):
        dt = jnp.bfloat16 if self.model_cfg.get("MIXED_PRECISION", False) else None
        x = batch["spatial_features_2d"]
        x = ConvBNReLU(
            self.model_cfg["SHARED_CONV_CHANNEL"],
            kernel=3,
            use_bias=self.model_cfg.get("USE_BIAS_BEFORE_NORM", False),
            epsilon=1e-5,
            dtype=dt,
            name="shared_conv",
        )(x, train)

        head_dict_base = dict(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"])
        pred_dicts = []
        for idx, class_ids in enumerate(self.head_class_groups()):
            sep = dict(head_dict_base)
            sep["hm"] = {
                "out_channels": len(class_ids),
                "num_conv": self.model_cfg.get("NUM_HM_CONV", 2),
            }
            import os as _os

            pred_dicts.append(SeparateHead(
                sep, dtype=dt,
                use_bias=self.model_cfg.get("USE_BIAS_BEFORE_NORM", False),
                fused=self.model_cfg.get(
                    "FUSED_BRANCHES",
                    _os.environ.get("COM_TPU_FUSED_HEAD", "1") == "1"),
                name=f"head_{idx}")(x, train))
        batch["pred_dicts"] = pred_dicts
        return batch


# CurriculumCenterHead variants share the module; the curriculum behavior is
# in the loss (com_tpu/losses/curriculum.py) and conf-shape config
# (head_zoo.py:145-191 parity lives in models/detectors.py head config).
for _name in (
    "CurriculumCenterHead",
    "CurriculumCenterHead_x5",
    "CurriculumCenterHead_car_merge",
    "CurriculumCenterHead_ped_merge",
):
    DENSE_HEADS.register(CenterHead, name=_name)


def decode_center_boxes(
    pred_dict: dict,
    class_ids: tuple,  # global 1-based ids of this head's classes
    point_cloud_range,
    voxel_size,
    feature_map_stride: int,
    k: int = 500,
    score_thresh: float = 0.1,
    post_center_limit_range=None,
    head_order=("center", "center_z", "dim", "rot"),
):
    """Top-K decode from the heatmap (centernet_utils.py:199-279 parity).

    Fixed-shape: returns (boxes (B,K,7+), scores (B,K), labels (B,K) global
    1-based, valid (B,K)).
    """
    hm = jax.nn.sigmoid(pred_dict["hm"])  # (B, H, W, C)
    b, h, w, c = hm.shape
    flat = hm.reshape(b, h * w * c)
    # clamp here so every caller is safe on small grids (top_k requires
    # k <= size); callers keep their configured K via the fixed out shape
    k = min(int(k), h * w * c)
    scores, inds = jax.lax.top_k(flat, k)  # over all classes & cells
    cls = (inds % c).astype(jnp.int32)
    cell = inds // c
    ys = (cell // w).astype(hm.dtype)
    xs = (cell % w).astype(hm.dtype)

    def gather(name):
        t = pred_dict[name]
        tf = t.reshape(b, h * w, t.shape[-1])
        return jnp.take_along_axis(tf, cell[..., None], axis=1)

    center = gather("center")
    center_z = gather("center_z")
    dim = jnp.exp(jnp.clip(gather("dim"), -8.0, 8.0))
    rot = gather("rot")
    angle = jnp.arctan2(rot[..., 1:2], rot[..., 0:1])

    xs = (xs[..., None] + center[..., 0:1]) * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys = (ys[..., None] + center[..., 1:2]) * feature_map_stride * voxel_size[1] + point_cloud_range[1]
    parts = [xs, ys, center_z, dim, angle]
    if "vel" in pred_dict and "vel" in head_order:
        parts.append(gather("vel"))
    boxes = jnp.concatenate(parts, axis=-1)

    valid = scores > score_thresh
    if post_center_limit_range is not None:
        lim = jnp.asarray(post_center_limit_range, boxes.dtype)
        valid &= (boxes[..., :3] >= lim[:3]).all(-1) & (boxes[..., :3] <= lim[3:6]).all(-1)

    label_map = jnp.asarray(class_ids, jnp.int32)
    labels = label_map[cls]
    return boxes, scores, labels, valid


def post_process_nms(boxes, scores, labels, valid, nms_cfg, num_out: int):
    """Class-agnostic NMS over decoded boxes (model_nms_utils.py:6-40 parity)."""
    nms_type = nms_cfg.get("NMS_TYPE", "nms_gpu")
    post = int(nms_cfg.get("NMS_POST_MAXSIZE", num_out))

    def one(bx, sc, lb, vd):
        if nms_type == "circle_nms":
            sel, sel_valid = circle_nms(
                bx[:, :2], sc, vd, float(nms_cfg.get("MIN_RADIUS", 4)), post
            )
        elif nms_type == "fast_nms":
            from ...ops.nms import fast_nms_bev

            sel, sel_valid = fast_nms_bev(
                bx, sc, vd, float(nms_cfg["NMS_THRESH"]), post
            )
        else:
            sel, sel_valid = nms_bev(
                bx, sc, vd, float(nms_cfg["NMS_THRESH"]), post
            )
        return bx[sel], sc[sel], lb[sel], sel_valid

    return jax.vmap(one)(boxes, scores, labels, valid)
