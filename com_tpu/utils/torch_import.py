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


_TRANSFORMS = {
    "linear": t_linear,
    "conv2d": t_conv2d,
    "deconv2d": t_deconv2d,
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


def _bn_rules(tprefix, pprefix, bn_name="BatchNorm_0"):
    """torch BN (weight/bias/running_mean/running_var) -> flax scale/bias +
    batch_stats mean/var."""
    return [
        Rule(f"{tprefix}.weight", "params", (*pprefix, bn_name, "scale")),
        Rule(f"{tprefix}.bias", "params", (*pprefix, bn_name, "bias")),
        Rule(f"{tprefix}.running_mean", "batch_stats", (*pprefix, bn_name, "mean")),
        Rule(f"{tprefix}.running_var", "batch_stats", (*pprefix, bn_name, "var")),
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


def apply_mapping(state_np, variables, rules):
    """Apply rules to a template variable tree.

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
        if rule.transform.startswith("spconv"):
            k3 = 27 if rule.transform == "spconv27" else 3
            try:
                val = t_spconv(src, k3)
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
    skip_suffixes = ("num_batches_tracked",)
    for key in state_np:
        if key in consumed or key.endswith(skip_suffixes):
            continue
        report["unused"].append(key)
    return new_vars, report


def import_torch_state_dict(state_dict, variables, model_cfg, class_names):
    """Top-level entry: torch ``model_state`` dict (tensors or ndarrays) ->
    (flax variables, report)."""
    state_np = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                              if hasattr(v, "cpu") else v)
                for k, v in state_dict.items()}
    rules = build_mapping(model_cfg, class_names, variables)
    return apply_mapping(state_np, variables, rules)
