"""Torch checkpoint importer: reference pcdet ``.pth`` -> com_tpu flax variables.

The reference stores ``checkpoint['model_state']`` — a flat torch state_dict
whose keys follow the module tree built by Detector3DTemplate
(/root/reference/pcdet/models/detectors/detector3d_template.py:35-173) and
whose tensors use torch layouts (Conv2d OIHW, ConvTranspose2d IOHW, Linear
(out, in), spconv 3D (kz, ky, kx, cin, cout) [v1.x] or
(cout, kz, ky, kx, cin) [v2.x] — see the reference's own migration shim at
detector3d_template.py:330-384).

This module maps those tensors into our flax variable tree.  The mapping is
*structural*: it is derived from the model config (the same yaml drives both
frameworks), not from name heuristics, so every rule is an explicit
(torch_key, flax_path, layout transform) triple and anything unmapped is
reported rather than silently dropped.

Covered module families (the reference model zoo's load-bearing set):

* PillarVFE / DynamicPillarVFE        (vfe.pfn_layers.{i}.linear/norm)
* BaseBEVBackbone                     (backbone_2d.blocks/deblocks)
* CenterHead + curriculum variants    (dense_head.shared_conv/heads_list)
* AnchorHeadSingle (+ curriculum)     (dense_head.conv_cls/conv_box/conv_dir_cls)
* VoxelBackBone8x / VoxelResBackBone8x (backbone_3d.conv_input/conv1..4/conv_out)
* VoxelSetAbstraction                 (pfe.SA_rawpoints/SA_layers/fusion)
* PointHeadSimple                     (point_head.cls_layers)
* PVRCNNHead                          (roi_head.roi_grid_pool_layer/shared/cls/reg)
* VoxelRCNNHead                       (roi_head.roi_grid_pool_layers [BN-folded
                                       into our pre/out factorization] + FCs)
* PointNet2MSG                        (backbone_3d.SA_modules/FP_modules)
* PointHeadBox                        (point_head.cls_layers/box_layers)
* PointRCNNHead                       (roi_head.xyz_up/merge_down/SA/cls/reg)
* MeanVFE / HeightCompression / PointPillarScatter (no parameters)

Use ``tools/import_torch_ckpt.py`` for the CLI (reads the .pth, writes an
orbax checkpoint consumable by ``tools/train.py --pretrained_model``).
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# layout transforms (torch -> flax)
# ---------------------------------------------------------------------------


def t_linear(w):
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def t_conv2d(w):
    """torch Conv2d (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def t_deconv2d(w):
    """torch ConvTranspose2d (I, O, kH, kW) -> flax ConvTranspose kernel
    (kH, kW, I, O) for transpose_kernel=False semantics: spatial flip then
    transpose (verified numerically; lax.conv_transpose applies the kernel
    unflipped while torch's deconv is the flipped gradient-of-conv)."""
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def t_copy(w):
    return np.asarray(w)


def t_conv1d(w):
    """torch Conv1d k=1 (O, I, 1) -> flax Dense kernel (in, out)."""
    w = np.asarray(w)
    return np.ascontiguousarray(w[:, :, 0].T)


def t_conv1x1(w):
    """torch Conv2d 1x1 (O, I, 1, 1) -> flax Dense kernel (in, out)."""
    w = np.asarray(w)
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def t_spconv(w, k3: int):
    """spconv weight -> our rulebook kernel (k1*k2*k3, cin, cout).

    Accepts either native layout (k1, k2, k3, cin, cout) [spconv 1.x /
    2.x native] or implicit-gemm layout (cout, k1, k2, k3, cin) [spconv 2.x
    implicit], mirroring the reference's own version shim
    (detector3d_template.py:338-347).  Our tap order is the row-major
    (dz, dy, dx) enumeration of the kernel cube — the same enumeration
    spconv uses for its spatial dims, so a plain reshape aligns taps."""
    w = np.asarray(w)
    if w.ndim != 5:
        raise ValueError(f"spconv weight must be 5D, got {w.shape}")
    kz, ky, kx, cin, cout = w.shape
    if kz * ky * kx != k3:
        # try implicit-gemm layout (cout, kz, ky, kx, cin)
        cout2, kz, ky, kx, cin2 = w.shape
        if kz * ky * kx == k3:
            w = w.transpose(1, 2, 3, 4, 0)  # -> (kz, ky, kx, cin, cout)
            cin, cout = cin2, cout2
        else:
            raise ValueError(f"cannot map spconv weight {w.shape} to {k3} taps")
    return np.ascontiguousarray(w.reshape(k3, cin, cout))


def t_spconv_dense(w):
    """spconv 3x3x3 weight -> flax dense Conv kernel (3, 3, 3, cin, cout).

    Accepts both spconv layouts (see t_spconv); our PartA2FCHead expresses
    the reference's sparse convs over the pooled grid as dense convs
    (roi_heads/parta2_head.py Conv3DBNReLU) — identical math on the dense
    pooled canvas, so the 5D kernel carries over with no tap reorder."""
    w = np.asarray(w)
    if w.ndim != 5:
        raise ValueError(f"spconv weight must be 5D, got {w.shape}")
    if w.shape[0] != 3 and w.shape[1] == w.shape[2] == w.shape[3] == 3:
        w = w.transpose(1, 2, 3, 4, 0)  # implicit-gemm (cout, k, k, k, cin)
    return np.ascontiguousarray(w)


def t_bnvar_eps5(w):
    """torch-default-eps (1e-5) BN running_var -> our MaskedBatchNorm
    (eps=1e-3, models/layers.py:19) running_var, compensated so eval
    normalization is EXACT: var' + 1e-3 == var + 1e-5.  The main zoo's BNs
    are built with pcdet's norm_fn (eps=1e-3) and import uncompensated;
    the roi-head / point-head / pointnet2-stack BNs use torch defaults
    (e.g. roi_head_template.py:35, pointnet2_modules.py:60)."""
    return np.maximum(np.asarray(w) - (1e-3 - 1e-5), 1e-12)


_TRANSFORMS = {
    "linear": t_linear,
    "conv2d": t_conv2d,
    "deconv2d": t_deconv2d,
    "conv1d": t_conv1d,
    "conv1x1": t_conv1x1,
    "spconv_dense": t_spconv_dense,
    "bnvar_eps5": t_bnvar_eps5,
    "copy": t_copy,
}


class Rule:
    """One tensor assignment: torch key -> (collection, flax path)."""

    __slots__ = ("torch_key", "collection", "path", "transform")

    def __init__(self, torch_key, collection, path, transform="copy"):
        self.torch_key = torch_key
        self.collection = collection
        self.path = tuple(path)
        self.transform = transform

    def __repr__(self):
        return (f"Rule({self.torch_key} -> {self.collection}:"
                f"{'/'.join(self.path)} [{self.transform}])")


def _bn_rules(tprefix, pprefix, bn_name="BatchNorm_0", torch_default_eps=False):
    """torch BN (weight/bias/running_mean/running_var) -> flax scale/bias +
    batch_stats mean/var.  torch_default_eps=True marks reference BNs built
    WITHOUT pcdet's norm_fn (eps 1e-5 instead of 1e-3) — running_var is
    compensated so our eps-1e-3 normalization matches exactly."""
    var_t = "bnvar_eps5" if torch_default_eps else "copy"
    return [
        Rule(f"{tprefix}.weight", "params", (*pprefix, bn_name, "scale")),
        Rule(f"{tprefix}.bias", "params", (*pprefix, bn_name, "bias")),
        Rule(f"{tprefix}.running_mean", "batch_stats", (*pprefix, bn_name, "mean")),
        Rule(f"{tprefix}.running_var", "batch_stats", (*pprefix, bn_name, "var"),
             var_t),
    ]


# ---------------------------------------------------------------------------
# per-family mappers
# ---------------------------------------------------------------------------


def map_pfn(vfe_cfg, top):
    """PillarVFE / DynamicPillarVFE PFN stack (pillar_vfe.py:8-123,
    dynamic_pillar_vfe.py:10-60): pfn_layers.{i}.linear + .norm ->
    _PFNLayer_{i}/Dense_0 + MaskedBatchNorm_0."""
    rules = []
    n_layers = len(vfe_cfg.get("NUM_FILTERS", []))
    for i in range(n_layers):
        t = f"vfe.pfn_layers.{i}"
        p = (top, f"_PFNLayer_{i}")
        rules.append(Rule(f"{t}.linear.weight", "params",
                          (*p, "Dense_0", "kernel"), "linear"))
        rules += _bn_rules(f"{t}.norm", p, "MaskedBatchNorm_0")
    return rules


def map_bev_backbone(cfg, top):
    """BaseBEVBackbone (base_bev_backbone.py:6-112): blocks.{i} Sequential
    [ZeroPad, Conv, BN, ReLU, (Conv, BN, ReLU) x layer_nums[i]] and
    deblocks.{i} [ConvTranspose|Conv, BN, ReLU] -> our globally-numbered
    ConvBNReLU_{g} stack + ConvTranspose_{t}/Conv_{c} + bare BatchNorm_{b}."""
    layer_nums = list(cfg.get("LAYER_NUMS", []))
    up_strides = list(cfg.get("UPSAMPLE_STRIDES", []))
    rules = []
    g = 0  # global ConvBNReLU counter (flax auto-numbering order)
    t_ct = 0  # ConvTranspose counter
    t_cv = 0  # bare Conv counter
    t_bn = 0  # bare BatchNorm counter
    body = (top, "body")
    for i, ln in enumerate(layer_nums):
        # first conv of the block sits at Sequential index 1 (after ZeroPad)
        seq = 1
        for k in range(ln + 1):
            rules.append(Rule(f"backbone_2d.blocks.{i}.{seq}.weight", "params",
                              (*body, f"ConvBNReLU_{g}", "Conv_0", "kernel"),
                              "conv2d"))
            rules += _bn_rules(f"backbone_2d.blocks.{i}.{seq + 1}",
                               (*body, f"ConvBNReLU_{g}"))
            seq += 3
            g += 1
        if i < len(up_strides):
            us = up_strides[i]
            dkey = f"backbone_2d.deblocks.{i}.0.weight"
            if us > 1:
                rules.append(Rule(dkey, "params",
                                  (*body, f"ConvTranspose_{t_ct}", "kernel"),
                                  "deconv2d"))
                t_ct += 1
            elif us == 1:
                # the reference uses a 1x1 stride-1 ConvTranspose2d here
                # (base_bev_backbone.py:50-58), weight (I, O, 1, 1); our
                # module is a plain 1x1 nn.Conv — same op, deconv layout
                rules.append(Rule(dkey, "params",
                                  (*body, f"Conv_{t_cv}", "kernel"),
                                  "deconv2d"))
                t_cv += 1
            else:  # us < 1: strided downsample Conv2d (OIHW)
                rules.append(Rule(dkey, "params",
                                  (*body, f"Conv_{t_cv}", "kernel"), "conv2d"))
                t_cv += 1
            rules += _bn_rules(f"backbone_2d.deblocks.{i}.1", body,
                               f"BatchNorm_{t_bn}")
            t_bn += 1
    if len(up_strides) > len(layer_nums):  # extra deconv on the concat
        i = len(up_strides) - 1
        rules.append(Rule(f"backbone_2d.deblocks.{i}.0.weight", "params",
                          (*body, f"ConvTranspose_{t_ct}", "kernel"),
                          "deconv2d"))
        rules += _bn_rules(f"backbone_2d.deblocks.{i}.1", body,
                           f"BatchNorm_{t_bn}")
    return rules


def map_center_head(cfg, top, class_names):
    """CenterHead family (center_head.py:12-103, curriculum_center_head.py):
    shared_conv.{0,1} + heads_list.{h}.{name}.{...} -> shared_conv/Conv_0+BN,
    head_{h}/{name}_conv{j} + {name}_out."""
    rules = [
        Rule("dense_head.shared_conv.0.weight", "params",
             (top, "shared_conv", "Conv_0", "kernel"), "conv2d"),
    ]
    if cfg.get("USE_BIAS_BEFORE_NORM", False):
        rules.append(Rule("dense_head.shared_conv.0.bias", "params",
                          (top, "shared_conv", "Conv_0", "bias")))
    rules += _bn_rules("dense_head.shared_conv.1", (top, "shared_conv"))

    head_dict = dict(cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"])
    for h, names in enumerate(cfg["CLASS_NAMES_EACH_HEAD"]):
        names_here = [n for n in names if n in class_names]
        specs = dict(head_dict)
        specs["hm"] = {"out_channels": len(names_here),
                       "num_conv": cfg.get("NUM_HM_CONV", 2)}
        for name, spec in specs.items():
            t = f"dense_head.heads_list.{h}.{name}"
            p = (top, f"head_{h}")
            nc = int(spec["num_conv"])
            for j in range(nc - 1):
                rules.append(Rule(f"{t}.{j}.0.weight", "params",
                                  (*p, f"{name}_conv{j}", "Conv_0", "kernel"),
                                  "conv2d"))
                if cfg.get("USE_BIAS_BEFORE_NORM", False):
                    rules.append(Rule(f"{t}.{j}.0.bias", "params",
                                      (*p, f"{name}_conv{j}", "Conv_0",
                                       "bias")))
                rules += _bn_rules(f"{t}.{j}.1", (*p, f"{name}_conv{j}"))
            # final conv: Sequential index nc-1 when nc > 1, else .0
            fi = nc - 1
            rules.append(Rule(f"{t}.{fi}.weight", "params",
                              (*p, f"{name}_out", "kernel"), "conv2d"))
            rules.append(Rule(f"{t}.{fi}.bias", "params",
                              (*p, f"{name}_out", "bias")))
    return rules


def map_anchor_head(cfg, top):
    """AnchorHeadSingle / curriculum anchor heads (anchor_head_single.py:7-49):
    conv_cls / conv_box / conv_dir_cls 1x1 convs with bias."""
    rules = []
    for name in ("conv_cls", "conv_box"):
        rules.append(Rule(f"dense_head.{name}.weight", "params",
                          (top, name, "kernel"), "conv2d"))
        rules.append(Rule(f"dense_head.{name}.bias", "params",
                          (top, name, "bias")))
    if cfg.get("USE_DIRECTION_CLASSIFIER", False):
        rules.append(Rule("dense_head.conv_dir_cls.weight", "params",
                          (top, "conv_dir_cls", "kernel"), "conv2d"))
        rules.append(Rule("dense_head.conv_dir_cls.bias", "params",
                          (top, "conv_dir_cls", "bias")))
    return rules


def map_voxel_backbone(cfg, top, residual=False):
    """VoxelBackBone8x (spconv_backbone.py:69-170) -> our stage names.

    reference                         ours
    conv_input.{0,1}                  subm0_0 (kernel + MaskedBatchNorm_0)
    conv1.0.{0,1}                     subm0_1
    conv{s}.0.{0,1}  (strided)        down{s-1}           s in 2..4
    conv{s}.{1,2}.{0,1} (subm)        subm{s-1}_{0,1}
    conv_out.{0,1}   ((3,1,1) conv)   conv_out

    The residual variant (spconv_backbone.py:173-293) wraps each stage body
    in SparseBasicBlock pairs: conv{s}.{j}.conv{1,2}/bn{1,2} -> our
    SparseResBlock children conv1/conv2."""
    rules = []

    def block(tprefix, pname):
        p = (top, pname)
        rules.append(Rule(f"{tprefix}.0.weight", "params",
                          (*p, "kernel"), "spconv27"))
        rules.extend(_bn_rules(f"{tprefix}.1", p, "MaskedBatchNorm_0"))

    def resblock(tprefix, pname):
        # SparseBasicBlock: conv1(+bias)/bn1/conv2(+bias)/bn2
        # (spconv_backbone.py:30-67; bias = norm_fn is not None -> True)
        for j in (1, 2):
            p = (top, pname, f"conv{j}")
            rules.append(Rule(f"{tprefix}.conv{j}.weight", "params",
                              (*p, "kernel"), "spconv27"))
            rules.append(Rule(f"{tprefix}.conv{j}.bias", "params",
                              (*p, "bias")))
            rules.extend(_bn_rules(f"{tprefix}.bn{j}", p, "MaskedBatchNorm_0"))

    block("backbone_3d.conv_input", "subm0_0")
    if residual:  # conv1 = two SparseBasicBlocks (spconv_backbone.py:198-201)
        resblock("backbone_3d.conv1.0", "subm0_1")
        resblock("backbone_3d.conv1.1", "subm0_2")
    else:  # conv1 = one subm block (spconv_backbone.py:85-87)
        block("backbone_3d.conv1.0", "subm0_1")
    for s in (2, 3, 4):
        block(f"backbone_3d.conv{s}.0", f"down{s - 1}")
        for j in (1, 2):
            if residual:
                resblock(f"backbone_3d.conv{s}.{j}", f"subm{s - 1}_{j - 1}")
            else:
                block(f"backbone_3d.conv{s}.{j}", f"subm{s - 1}_{j - 1}")
    # conv_out kernel is (3,1,1): 3 taps
    p = (top, "conv_out")
    rules.append(Rule("backbone_3d.conv_out.0.weight", "params",
                      (*p, "kernel"), "spconv3"))
    rules.extend(_bn_rules("backbone_3d.conv_out.1", p, "MaskedBatchNorm_0"))
    return rules


def _mlp_seq_rules(tprefix, ppath, n_layers, dense_fmt="Dense_{k}",
                   bn_fmt="MaskedBatchNorm_{k}", transform="conv1x1"):
    """A shared-MLP torch Sequential [Conv 1x1 no-bias, BN, ReLU] per step
    (stride 3: weights at {3k}, BN at {3k+1}) -> our Dense + MaskedBatchNorm
    pairs.  All such reference Sequentials are built with torch-default BN
    eps (1e-5), hence the compensation."""
    rules = []
    for k in range(n_layers):
        rules.append(Rule(f"{tprefix}.{3 * k}.weight", "params",
                          (*ppath, dense_fmt.format(k=k), "kernel"),
                          transform))
        rules += _bn_rules(f"{tprefix}.{3 * k + 1}", ppath,
                           bn_fmt.format(k=k), torch_default_eps=True)
    return rules


def _stack_sa_rules(tprefix, ppath, n_layers):
    """StackSAModuleMSG scale-0 shared MLP (pointnet2_stack/
    pointnet2_modules.py:30-64: Sequential [Conv2d 1x1 no-bias, BN2d, ReLU]
    per mlp step) -> our PointNetBlock's auto-numbered Dense_{k} +
    MaskedBatchNorm_{k} (models/pfe.py:20-39).  Our configs are
    single-scale, so only mlps.0 exists on both sides."""
    return _mlp_seq_rules(f"{tprefix}.mlps.0", ppath, n_layers)


def map_vsa(pfe_cfg, top):
    """VoxelSetAbstraction (voxel_set_abstraction.py:90-175): SA_rawpoints +
    SA_layers.{k} (one per x_conv source, FEATURES_SOURCE order) +
    vsa_point_feature_fusion [Linear no-bias, BN1d, ReLU] -> our sa_raw /
    sa_{src} PointNetBlocks + vsa_point_feature_fusion Dense +
    vsa_fusion_bn (models/pfe.py:59-171)."""
    rules = []
    sources = list(pfe_cfg.get("FEATURES_SOURCE", []))
    sa_cfg = pfe_cfg.get("SA_LAYER", {})
    if "raw_points" in sources:
        mlps = list(sa_cfg.get("raw_points", {}).get("MLPS", [[16, 16]])[0])
        rules += _stack_sa_rules("pfe.SA_rawpoints", (top, "sa_raw"),
                                 len(mlps))
    k = 0
    for src in sources:
        if not src.startswith("x_conv"):
            continue
        mlps = list(sa_cfg.get(src, {}).get("MLPS", [[32, 32]])[0])
        rules += _stack_sa_rules(f"pfe.SA_layers.{k}", (top, f"sa_{src}"),
                                 len(mlps))
        k += 1
    rules.append(Rule("pfe.vsa_point_feature_fusion.0.weight", "params",
                      (top, "vsa_point_feature_fusion", "kernel"), "linear"))
    rules += _bn_rules("pfe.vsa_point_feature_fusion.1", (top,),
                       "vsa_fusion_bn", torch_default_eps=True)
    return rules


def _point_fc_rules(tprefix, top, name, fcs):
    """PointHeadTemplate.make_fc_layers (point_head_template.py:36-47:
    [Linear no-bias, BN1d, ReLU] per fc + biased final Linear) -> our
    {name}_fc_{i}/{name}_bn_{i} + {name}_out."""
    rules = []
    for i in range(len(fcs)):
        rules.append(Rule(f"{tprefix}.{3 * i}.weight", "params",
                          (top, f"{name}_fc_{i}", "kernel"), "linear"))
        rules += _bn_rules(f"{tprefix}.{3 * i + 1}", (top,),
                           f"{name}_bn_{i}", torch_default_eps=True)
    fi = 3 * len(fcs)
    rules.append(Rule(f"{tprefix}.{fi}.weight", "params",
                      (top, f"{name}_out", "kernel"), "linear"))
    rules.append(Rule(f"{tprefix}.{fi}.bias", "params",
                      (top, f"{name}_out", "bias")))
    return rules


def map_point_head_simple(ph_cfg, top):
    """PointHeadSimple (point_head_simple.py:7-21) -> our cls_fc_{i}/
    cls_bn_{i} + cls_out (models/dense_heads/point_head.py:20-34)."""
    return _point_fc_rules("point_head.cls_layers", top, "cls",
                           list(ph_cfg.get("CLS_FC", [256, 256])))


def map_point_head_box(ph_cfg, top):
    """PointHeadBox (point_head_box.py:16-30: cls_layers + box_layers via
    the template's make_fc_layers) -> our cls_*/box_* branches
    (models/dense_heads/point_head.py PointHeadBox)."""
    return (_point_fc_rules("point_head.cls_layers", top, "cls",
                            list(ph_cfg.get("CLS_FC", [256, 256])))
            + _point_fc_rules("point_head.box_layers", top, "box",
                              list(ph_cfg.get("REG_FC", [256, 256]))))


def map_pointnet2_msg(b3_cfg, top):
    """PointNet2MSG (backbones_3d/pointnet2_backbone.py:9-48): SA_modules
    (PointnetSAModuleMSG, one Conv2d-BN2d Sequential per radius scale) +
    FP_modules (PointnetFPModule shared mlp) -> our sa_{k}/mlp_{ri} +
    fp_{i}/fc_{j}+bn_{j} (models/pointnet2_backbone.py)."""
    rules = []
    sa_cfg = b3_cfg.get("SA_CONFIG", {})
    for k, mlps_k in enumerate(list(sa_cfg.get("MLPS", []))):
        for ri, m in enumerate(list(mlps_k)):
            rules += _mlp_seq_rules(
                f"backbone_3d.SA_modules.{k}.mlps.{ri}",
                (top, f"sa_{k}", f"mlp_{ri}"), len(m))
    for i, fp in enumerate(list(b3_cfg.get("FP_MLPS", []))):
        rules += _mlp_seq_rules(f"backbone_3d.FP_modules.{i}.mlp",
                                (top, f"fp_{i}"), len(fp),
                                dense_fmt="fc_{k}", bn_fmt="bn_{k}")
    return rules


def map_pointrcnn_roi_head(cfg, top):
    """PointRCNNHead (roi_heads/pointrcnn_head.py:10-66): xyz_up_layer +
    merge_down_layer (Conv2d 1x1 stacks), single-scale SA_modules
    (PointnetSAModule -> mlps.0), cls/reg make_fc_layers -> our
    xyz_up_{k}/merge_down_0 Dense+BN, sa_{k}/mlp PointNetBlock,
    {name}_fc_{i}/{name}_out branches."""
    rules = []
    xyz_up = list(cfg.get("XYZ_UP_LAYER", [128, 128]))
    rules += _mlp_seq_rules("roi_head.xyz_up_layer", (top,), len(xyz_up),
                            dense_fmt="xyz_up_{k}", bn_fmt="xyz_up_bn_{k}")
    rules += _mlp_seq_rules("roi_head.merge_down_layer", (top,), 1,
                            dense_fmt="merge_down_{k}",
                            bn_fmt="merge_down_bn_{k}")
    sa_cfg = cfg.get("SA_CONFIG", {})
    for k, m in enumerate(list(sa_cfg.get("MLPS", []))):
        rules += _mlp_seq_rules(f"roi_head.SA_modules.{k}.mlps.0",
                                (top, f"sa_{k}", "mlp"), len(m))
    for name, key in (("cls", "CLS_FC"), ("reg", "REG_FC")):
        rules += _make_fc_branch_rules(
            f"roi_head.{name}_layers", top, name,
            list(cfg.get(key, [256, 256])), "conv1d",
            out_name=f"{name}_out")
    return rules


def map_unet_v2(cfg, top):
    """UNetV2 (spconv_unet.py:54-131): VoxelBackBone8x-shaped encoder +
    UR-block decoder -> our conv_input/conv1/down{s}/subm{s}_{i}/conv_out +
    up{k}_{t,m,inv} and up1_{t,m,post} (models/backbone3d.py UNetV2)."""
    rules = []

    def block(tprefix, pname, transform="spconv27"):
        p = (top, pname)
        rules.append(Rule(f"{tprefix}.0.weight", "params",
                          (*p, "kernel"), transform))
        rules.extend(_bn_rules(f"{tprefix}.1", p, "MaskedBatchNorm_0"))

    def resblock(tprefix, pname):
        # SparseBasicBlock (spconv_unet.py:11-27; bias=False, unlike the
        # spconv_backbone variant)
        for j in (1, 2):
            p = (top, pname, f"conv{j}")
            rules.append(Rule(f"{tprefix}.conv{j}.weight", "params",
                              (*p, "kernel"), "spconv27"))
            rules.extend(_bn_rules(f"{tprefix}.bn{j}", p, "MaskedBatchNorm_0"))

    block("backbone_3d.conv_input", "conv_input")
    block("backbone_3d.conv1.0", "conv1")
    for s_ in (2, 3, 4):
        block(f"backbone_3d.conv{s_}.0", f"down{s_ - 1}")
        for j in (1, 2):
            block(f"backbone_3d.conv{s_}.{j}", f"subm{s_ - 1}_{j - 1}")
    if cfg.get("RETURN_ENCODED_TENSOR", True):
        block("backbone_3d.conv_out", "conv_out", "spconv3")
    for k in (4, 3, 2):
        resblock(f"backbone_3d.conv_up_t{k}", f"up{k}_t")
        block(f"backbone_3d.conv_up_m{k}", f"up{k}_m")
        block(f"backbone_3d.inv_conv{k}", f"up{k}_inv")
    resblock("backbone_3d.conv_up_t1", "up1_t")
    block("backbone_3d.conv_up_m1", "up1_m")
    block("backbone_3d.conv5.0", "up1_post")
    return rules


def map_point_intra_part(ph_cfg, top):
    """PointIntraPartOffsetHead (point_intra_part_head.py:16-37: cls_layers
    + part_reg_layers + optional box_layers) -> our cls_*/part_*/box_*
    branches (models/dense_heads/point_head.py PointIntraPartOffsetHead)."""
    rules = _point_fc_rules("point_head.cls_layers", top, "cls",
                            list(ph_cfg.get("CLS_FC", [128])))
    rules += _point_fc_rules("point_head.part_reg_layers", top, "part",
                             list(ph_cfg.get("PART_FC", [128])))
    if "REG_FC" in ph_cfg:
        rules += _point_fc_rules("point_head.box_layers", top, "box",
                                 list(ph_cfg["REG_FC"]))
    return rules


def map_parta2_roi_head(cfg, top):
    """PartA2FCHead (partA2_head.py:10-52): conv_part/conv_rpn sparse conv
    pairs over the pooled grid (our dense Conv3DBNReLU equivalents,
    eps-1e-3 BNs -> no compensation), Conv1d shared FCs, cls/reg
    make_fc_layers with {name}_out finals."""
    rules = []
    for stem in ("part", "rpn"):
        for j in (0, 1):
            t = f"roi_head.conv_{stem}.{j}"
            p = (top, f"conv_{stem}_{j}")
            rules.append(Rule(f"{t}.0.weight", "params",
                              (*p, "Conv_0", "kernel"), "spconv_dense"))
            rules += _bn_rules(f"{t}.1", p, "MaskedBatchNorm_0")
    dp = float(cfg.get("DP_RATIO", 0.0))
    rules += _shared_fc_rules(top, list(cfg.get("SHARED_FC", [256, 256])),
                              dp, "conv1d")
    for name, key in (("cls", "CLS_FC"), ("reg", "REG_FC")):
        rules += _make_fc_branch_rules(
            f"roi_head.{name}_layers", top, name,
            list(cfg.get(key, [256, 256])), "conv1d",
            out_name=f"{name}_out")
    return rules


def _make_fc_branch_rules(tprefix, top, name, fcs, transform,
                          out_name=None):
    """RoIHeadTemplate.make_fc_layers (roi_head_template.py:29-43):
    [Conv1d k=1 no-bias, BN1d, ReLU] per fc with Dropout inserted after the
    FIRST block only (the reference condition `DP_RATIO >= 0 and k == 0` is
    always true), then the biased final Conv1d -> our {name}_fc_{i} +
    {name}_bn_{i} + rcnn_{name} (roi_heads/pvrcnn_head.py:_fc_branch), or
    ``out_name`` where the head names its final layer differently."""
    out_name = out_name or f"rcnn_{name}"
    rules = []
    seq = 0
    for i in range(len(fcs)):
        rules.append(Rule(f"{tprefix}.{seq}.weight", "params",
                          (top, f"{name}_fc_{i}", "kernel"), transform))
        rules += _bn_rules(f"{tprefix}.{seq + 1}", (top,), f"{name}_bn_{i}",
                           torch_default_eps=True)
        seq += 3
        if i == 0:
            seq += 1  # the always-inserted Dropout
    rules.append(Rule(f"{tprefix}.{seq}.weight", "params",
                      (top, out_name, "kernel"), transform))
    rules.append(Rule(f"{tprefix}.{seq}.bias", "params",
                      (top, out_name, "bias")))
    return rules


def _shared_fc_rules(top, fcs, dp_ratio, transform, drop_after_last=False):
    """The inline shared_fc_layer Sequential (pvrcnn_head.py:20-32,
    voxelrcnn_head.py:41-51): [Conv1d|Linear no-bias, BN1d, ReLU] per fc
    with Dropout after every NON-last block when DP_RATIO > 0."""
    rules = []
    seq = 0
    for i in range(len(fcs)):
        t = f"roi_head.shared_fc_layer.{seq}"
        rules.append(Rule(f"{t}.weight", "params",
                          (top, f"shared_fc_{i}", "kernel"), transform))
        rules += _bn_rules(f"roi_head.shared_fc_layer.{seq + 1}", (top,),
                           f"shared_bn_{i}", torch_default_eps=True)
        seq += 3
        if dp_ratio > 0 and (drop_after_last or i != len(fcs) - 1):
            seq += 1
    return rules


def map_pvrcnn_roi_head(cfg, top, num_class):
    """PVRCNNHead (pvrcnn_head.py:8-43): roi_grid_pool_layer (StackSAModule
    scale 0) + shared_fc_layer (Conv1d stack) + cls/reg make_fc_layers ->
    our roi_grid_pointnet + shared_fc_{i}/shared_bn_{i} + _fc_branch."""
    rules = []
    mlps = list(cfg.get("ROI_GRID_POOL", {}).get("MLPS", [[64, 64]])[0])
    rules += _stack_sa_rules("roi_head.roi_grid_pool_layer",
                             (top, "roi_grid_pointnet"), len(mlps))
    dp = float(cfg.get("DP_RATIO", 0.0))
    rules += _shared_fc_rules(top, list(cfg.get("SHARED_FC", [256, 256])),
                              dp, "conv1d")
    rules += _make_fc_branch_rules("roi_head.cls_layers", top, "cls",
                                   list(cfg.get("CLS_FC", [256, 256])),
                                   "conv1d")
    rules += _make_fc_branch_rules("roi_head.reg_layers", top, "reg",
                                   list(cfg.get("REG_FC", [256, 256])),
                                   "conv1d")
    return rules


def map_voxelrcnn_roi_head(cfg, top):
    """VoxelRCNNHead FC part (voxelrcnn_head.py:40-80): shared_fc_layer
    (nn.Linear stack) + cls/reg_fc_layers + cls/reg_pred_layer -> our
    shared_fc_{i} + {name}_fc_{i} + {name}_out.  The grid-pool layers need
    BN folding and are handled by the composite mapper
    (fold_voxelrcnn_pool)."""
    rules = []
    dp = float(cfg.get("DP_RATIO", 0.0))
    rules += _shared_fc_rules(top, list(cfg.get("SHARED_FC", [256, 256])),
                              dp, "linear")
    for name in ("cls", "reg"):
        fcs = list(cfg.get(f"{name.upper()}_FC", [256, 256]))
        seq = 0
        for i in range(len(fcs)):
            t = f"roi_head.{name}_fc_layers.{seq}"
            rules.append(Rule(f"{t}.weight", "params",
                              (top, f"{name}_fc_{i}", "kernel"), "linear"))
            rules += _bn_rules(f"roi_head.{name}_fc_layers.{seq + 1}",
                               (top,), f"{name}_bn_{i}",
                               torch_default_eps=True)
            seq += 3
            if dp > 0 and i != len(fcs) - 1:
                seq += 1
        rules.append(Rule(f"roi_head.{name}_pred_layer.weight", "params",
                          (top, f"{name}_out", "kernel"), "linear"))
        rules.append(Rule(f"roi_head.{name}_pred_layer.bias", "params",
                          (top, f"{name}_out", "bias")))
    return rules


# ---------------------------------------------------------------------------
# composite mappers (consume several torch tensors per flax leaf)
# ---------------------------------------------------------------------------


def _fold_bn1d(w, bn_prefix, state_np, eps=1e-5):
    """Fold an eval-mode torch BN (running stats) into the preceding
    no-bias linear map: returns (W_folded (O, I), bias (O,)).  The voxel
    pool modules build plain nn.BatchNorm1d/2d (torch default eps=1e-5,
    voxel_pool_modules.py:36-48)."""
    w = np.asarray(w, np.float64)
    if w.ndim == 3:
        w = w[:, :, 0]
    elif w.ndim == 4:
        w = w[:, :, 0, 0]
    gamma = np.asarray(state_np[f"{bn_prefix}.weight"], np.float64)
    beta = np.asarray(state_np[f"{bn_prefix}.bias"], np.float64)
    mean = np.asarray(state_np[f"{bn_prefix}.running_mean"], np.float64)
    var = np.asarray(state_np[f"{bn_prefix}.running_var"], np.float64)
    scale = gamma / np.sqrt(var + eps)
    return w * scale[:, None], beta - mean * scale


def fold_voxelrcnn_pool(state_np, new_vars, report, consumed, *,
                        roi_cfg, top):
    """VoxelRCNN grid-pool import (voxel_pool_modules.py:8-110): the
    reference factors the first MLP layer as
        relu( BN_in(W_in @ feats)  +  BN_pos(W_pos @ rel_xyz) )
    while ours is one biased Dense over concat([rel_xyz, feats]) (the
    PRE_MLP pre_{src} layer, roi_heads/voxelrcnn_head.py:90).  At eval the
    two BNs are affine, so they fold exactly:
        kernel = [[fold(BN_pos)W_pos]^T ; [fold(BN_in)W_in]^T],
        bias   = b_pos + b_in.
    The reference then MAX-pools over neighbors and applies mlps_out
    (Conv1d+BN+ReLU) on the pooled row (voxel_pool_modules.py:116-125);
    our head mirrors that factorization exactly (roi_heads/
    voxelrcnn_head.py PRE_MLP path: out_{src} Dense + out_bn_{src}), so
    mlp_out imports 1:1 with eps-compensated running stats.  Exact for
    eval on non-empty balls (empty balls: we pool to zero, the reference
    feeds its BN biases through); training-from-import restarts the
    folded BN stats (documented in the CLI)."""
    sources = list(roi_cfg["ROI_GRID_POOL"].get(
        "FEATURES_SOURCE", ["x_conv2", "x_conv3", "x_conv4"]))
    params = new_vars["params"][top]
    stats = new_vars["batch_stats"].setdefault(top, {})
    for i, src in enumerate(sources):
        t = f"roi_head.roi_grid_pool_layers.{i}"
        keys = {
            "in_w": f"{t}.mlps_in.0.0.weight",
            "pos_w": f"{t}.mlps_pos.0.0.weight",
            "out_w": f"{t}.mlps_out.0.0.weight",
        }
        bn_keys = []
        for stem in ("mlps_in.0.1", "mlps_pos.0.1", "mlps_out.0.1"):
            bn_keys += [f"{t}.{stem}.{s}" for s in
                        ("weight", "bias", "running_mean", "running_var")]
        missing = [k for k in list(keys.values()) + bn_keys
                   if k not in state_np]
        if missing:
            report["missing"] += missing
            continue
        w_in, b_in = _fold_bn1d(state_np[keys["in_w"]],
                                f"{t}.mlps_in.0.1", state_np)
        w_pos, b_pos = _fold_bn1d(state_np[keys["pos_w"]],
                                  f"{t}.mlps_pos.0.1", state_np)
        pre = params.get(f"pre_{src}")
        out = params.get(f"out_{src}")
        if pre is None or out is None:
            report["mismatch"].append(
                (keys["in_w"], f"no flax pre_/out_{src} under {top} "
                 "(PRE_MLP must be on, 2-entry MLPS, for import)"))
            continue
        kernel = np.concatenate([w_pos.T, w_in.T], axis=0)  # (3+C, mid)
        if tuple(pre["kernel"].shape) != kernel.shape:
            report["mismatch"].append(
                (keys["in_w"], f"pre_{src} kernel {tuple(pre['kernel'].shape)}"
                 f" vs folded {kernel.shape}"))
            continue
        pre["kernel"] = kernel.astype(np.asarray(pre["kernel"]).dtype)
        pre["bias"] = (b_in + b_pos).astype(np.asarray(pre["bias"]).dtype)
        # out_{src} Dense / out_bn_{src} <- mlp_out conv + BN (unfolded:
        # our BN uses the imported running stats, eps-compensated)
        out_w = t_conv1d(state_np[keys["out_w"]])
        out["kernel"] = out_w.astype(np.asarray(out["kernel"]).dtype)
        bn1 = params[f"out_bn_{src}"]
        st1 = stats[f"out_bn_{src}"]
        bn1["scale"] = np.asarray(state_np[f"{t}.mlps_out.0.1.weight"],
                                  np.asarray(bn1["scale"]).dtype)
        bn1["bias"] = np.asarray(state_np[f"{t}.mlps_out.0.1.bias"],
                                 np.asarray(bn1["bias"]).dtype)
        st1["mean"] = np.asarray(state_np[f"{t}.mlps_out.0.1.running_mean"],
                                 np.asarray(st1["mean"]).dtype)
        st1["var"] = t_bnvar_eps5(
            state_np[f"{t}.mlps_out.0.1.running_var"]).astype(
            np.asarray(st1["var"]).dtype)
        for k in list(keys.values()) + bn_keys:
            consumed.add(k)
            report["loaded"].append(k)


# ---------------------------------------------------------------------------
# mapping assembly + application
# ---------------------------------------------------------------------------

_CENTER_HEADS = ("CenterHead",)
_ANCHOR_HEADS = ("AnchorHeadSingle", "CurriculumAnchorHeadSingle")


def build_mapping(model_cfg, class_names, variables):
    """Derive the full rule list for a detector config.

    ``variables`` (the initialized template) resolves our top-level scope
    names — flax numbers same-class siblings, so the template is the source
    of truth for the ``<Class>_0`` suffixes."""
    params = variables["params"]
    tops = list(params.keys())

    def top_for(*prefixes):
        for t in tops:
            if any(t.startswith(p) for p in prefixes):
                return t
        return None

    rules = []
    vfe_cfg = model_cfg.get("VFE") or {}
    if vfe_cfg.get("NAME") in ("PillarVFE", "DynamicPillarVFE"):
        top = top_for("PillarVFE", "DynamicPillarVFE")
        if top:
            rules += map_pfn(vfe_cfg, top)

    b3_cfg = model_cfg.get("BACKBONE_3D") or {}
    if b3_cfg.get("NAME") in ("VoxelBackBone8x", "VoxelResBackBone8x"):
        top = top_for("VoxelBackBone8x", "VoxelResBackBone8x")
        if top:
            rules += map_voxel_backbone(
                b3_cfg, top, residual=b3_cfg["NAME"] == "VoxelResBackBone8x")
    elif b3_cfg.get("NAME") == "PointNet2MSG":
        # PointRCNN mounts the backbone as "backbone_3d" (detectors.py)
        top = top_for("backbone_3d", "PointNet2MSG")
        if top:
            rules += map_pointnet2_msg(b3_cfg, top)
    elif b3_cfg.get("NAME") == "UNetV2":
        top = top_for("UNetV2")
        if top:
            rules += map_unet_v2(b3_cfg, top)

    b2_cfg = model_cfg.get("BACKBONE_2D") or {}
    if b2_cfg.get("NAME") == "BaseBEVBackbone":
        top = top_for("BaseBEVBackbone")
        if top:
            rules += map_bev_backbone(b2_cfg, top)

    dh_cfg = model_cfg.get("DENSE_HEAD") or {}
    dh_name = dh_cfg.get("NAME", "")
    if dh_name.startswith("CenterHead") or dh_name.startswith("CurriculumCenterHead"):
        top = top_for("CenterHead")
        if top:
            rules += map_center_head(dh_cfg, top, list(class_names))
    elif "AnchorHead" in dh_name:
        top = top_for("AnchorHeadSingle", "CurriculumAnchorHeadSingle",
                      "AnchorHead")
        if top:
            rules += map_anchor_head(dh_cfg, top)

    pfe_cfg = model_cfg.get("PFE") or {}
    if pfe_cfg.get("NAME") == "VoxelSetAbstraction":
        top = top_for("VoxelSetAbstraction")
        if top:
            rules += map_vsa(pfe_cfg, top)

    ph_cfg = model_cfg.get("POINT_HEAD") or {}
    if ph_cfg.get("NAME") == "PointHeadSimple":
        # detectors mount the point head under an explicit "point_head"
        # scope (models/detectors.py); fall back to the class auto-name
        top = top_for("point_head", "PointHeadSimple")
        if top:
            rules += map_point_head_simple(ph_cfg, top)
    elif ph_cfg.get("NAME") == "PointHeadBox":
        top = top_for("point_head", "PointHeadBox")
        if top:
            rules += map_point_head_box(ph_cfg, top)
    elif ph_cfg.get("NAME") == "PointIntraPartOffsetHead":
        top = top_for("point_head", "PointIntraPartOffsetHead")
        if top:
            rules += map_point_intra_part(ph_cfg, top)

    rh_cfg = model_cfg.get("ROI_HEAD") or {}
    rh_name = rh_cfg.get("NAME", "")
    if rh_name == "PVRCNNHead":
        # PVRCNN auto-names the head scope; PVRCNNPlusPlus mounts it as
        # an explicit "roi_head" (models/detectors.py)
        top = top_for("PVRCNNHead", "roi_head")
        if top:
            num_class = 1 if rh_cfg.get("CLASS_AGNOSTIC", True) else len(class_names)
            rules += map_pvrcnn_roi_head(rh_cfg, top, num_class)
    elif rh_name == "VoxelRCNNHead":
        # the VoxelRCNN detector mounts it as "roi_head" (detectors.py)
        top = top_for("VoxelRCNNHead", "roi_head")
        if top:
            rules += map_voxelrcnn_roi_head(rh_cfg, top)
    elif rh_name == "PointRCNNHead":
        top = top_for("PointRCNNHead", "roi_head")
        if top:
            rules += map_pointrcnn_roi_head(rh_cfg, top)
    elif rh_name == "PartA2FCHead":
        top = top_for("PartA2FCHead", "roi_head")
        if top:
            rules += map_parta2_roi_head(rh_cfg, top)

    return rules


def _tree_get(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _tree_set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def apply_mapping(state_np, variables, rules, composites=()):
    """Apply rules to a template variable tree.

    ``composites`` are callables(state_np, new_vars, report, consumed) that
    consume SEVERAL torch tensors per flax leaf (e.g. the VoxelRCNN pool's
    eval-time BN folding) and run after the plain rules, before the unused
    census.

    Returns ``(new_variables, report)`` where report counts loaded /
    missing-in-ckpt / shape-mismatch tensors and lists the torch keys the
    rules never consumed (minus torch bookkeeping like num_batches_tracked
    and the loss-function EMA buffers, which have no flax-param analogue —
    curriculum EMA state lives in our TrainState, not in params)."""
    new_vars = {c: _to_mutable(t) for c, t in variables.items()}
    report = {"loaded": [], "missing": [], "mismatch": [], "unused": []}
    consumed = set()
    for rule in rules:
        src = state_np.get(rule.torch_key)
        if src is None:
            report["missing"].append(rule.torch_key)
            continue
        consumed.add(rule.torch_key)
        if rule.transform in ("spconv27", "spconv3"):
            k3 = 27 if rule.transform == "spconv27" else 3
            try:
                val = t_spconv(src, k3)
            except ValueError as e:
                report["mismatch"].append((rule.torch_key, str(e)))
                continue
        elif rule.transform == "spconv_dense":
            try:
                val = t_spconv_dense(src)
            except ValueError as e:
                report["mismatch"].append((rule.torch_key, str(e)))
                continue
        else:
            val = _TRANSFORMS[rule.transform](src)
        dst = _tree_get(new_vars.get(rule.collection, {}), rule.path)
        if dst is None:
            report["mismatch"].append(
                (rule.torch_key, f"no flax leaf at {rule.collection}:"
                 f"{'/'.join(rule.path)}"))
            continue
        if tuple(np.shape(dst)) != tuple(val.shape):
            report["mismatch"].append(
                (rule.torch_key, f"shape {val.shape} vs flax "
                 f"{tuple(np.shape(dst))} at {'/'.join(rule.path)}"))
            continue
        _tree_set(new_vars[rule.collection], rule.path,
                  val.astype(np.asarray(dst).dtype))
        report["loaded"].append(rule.torch_key)
    for comp in composites:
        comp(state_np, new_vars, report, consumed)
    skip_suffixes = ("num_batches_tracked",)
    for key in state_np:
        if key in consumed or key.endswith(skip_suffixes):
            continue
        report["unused"].append(key)
    return new_vars, report


def import_torch_state_dict(state_dict, variables, model_cfg, class_names):
    """Top-level entry: torch ``model_state`` dict (tensors or ndarrays) ->
    (flax variables, report)."""
    import functools

    state_np = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                              if hasattr(v, "cpu") else v)
                for k, v in state_dict.items()}
    rules = build_mapping(model_cfg, class_names, variables)
    composites = []
    rh_cfg = model_cfg.get("ROI_HEAD") or {}
    if rh_cfg.get("NAME") == "VoxelRCNNHead":
        tops = [t for t in variables["params"]
                if t.startswith(("VoxelRCNNHead", "roi_head"))]
        if tops:
            composites.append(functools.partial(
                fold_voxelrcnn_pool, roi_cfg=rh_cfg, top=tops[0]))
    return apply_mapping(state_np, variables, rules, composites)
