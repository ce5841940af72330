"""Torch importer for the PartA2 family: UNetV2 + PointIntraPartOffsetHead +
PartA2FCHead (finishes VERDICT r4 missing #3's detector list).

spconv has no CPU build here, so the REAL reference modules (spconv_unet.py,
partA2_head.py) are built with a parameter-faithful fake-spconv shim: each
Sparse*Conv3d holds a native-layout (kz, ky, kx, cin, cout) weight (exactly
what a real spconv state_dict stores) but has no forward.  That gives the
true key tree + tensors for import-completeness, while forward parity is
checked where the math is runnable:

* the FC trunks + point-head branches (real torch Sequentials), and
* the pooled-grid conv stacks via a dense torch Conv3d oracle (the fake
  weights permuted to OIkkk), vs our Conv3DBNReLU with imported params —
  validating the spconv_dense layout transform + tap orientation, and
* inverse_conv3d vs a torch ConvTranspose3d oracle on a dense grid —
  validating the (j - p) transpose rulebook and the inverse-conv weight
  enumeration used by the UNet decoder import.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ref_torch_models import AttrDict, reference_modules  # noqa: E402

torch = pytest.importorskip("torch")

REF_MODULES = [
    "pcdet.models.backbones_3d.spconv_unet",
    "pcdet.models.dense_heads.point_intra_part_head",
    "pcdet.models.roi_heads.partA2_head",
]


def _fake_spconv():
    """Parameter-faithful spconv stand-in: native weight layout, no math."""
    import torch.nn as nn

    class SparseModule(nn.Module):
        pass

    class SparseSequential(nn.Sequential):
        pass

    class _SparseConvBase(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, bias=False, indice_key=None):
            super().__init__()
            k = (tuple(kernel_size) if isinstance(kernel_size, (tuple, list))
                 else (kernel_size,) * 3)
            self.weight = nn.Parameter(
                torch.randn(*k, in_channels, out_channels) * 0.08)
            if bias:
                self.bias = nn.Parameter(torch.zeros(out_channels))
            else:
                self.register_parameter("bias", None)

    class SubMConv3d(_SparseConvBase):
        pass

    class SparseConv3d(_SparseConvBase):
        pass

    class SparseInverseConv3d(_SparseConvBase):
        def __init__(self, in_channels, out_channels, kernel_size,
                     indice_key=None, bias=False):
            super().__init__(in_channels, out_channels, kernel_size,
                             bias=bias)

    class SparseConvolution(nn.Module):
        pass

    mod = types.ModuleType("spconv")
    conv_ns = types.ModuleType("spconv.conv")
    conv_ns.SparseConvolution = SparseConvolution
    for m in (mod,):
        m.SparseModule = SparseModule
        m.SparseSequential = SparseSequential
        m.SubMConv3d = SubMConv3d
        m.SparseConv3d = SparseConv3d
        m.SparseInverseConv3d = SparseInverseConv3d
        m.SparseConvTensor = object
        m.conv = conv_ns
    pt = types.ModuleType("spconv.pytorch")
    pt.__dict__.update(mod.__dict__)
    return {"spconv": mod, "spconv.conv": conv_ns, "spconv.pytorch": pt}


def _randomize_bn(module, seed):
    import torch.nn as nn

    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


def _build_ref_parta2(mods, seed=30):
    import torch.nn as nn

    torch.manual_seed(seed)
    # the roiaware utils module is stubbed empty; PartA2FCHead only needs
    # the pooling layer to construct (never runs on CPU)
    ra = sys.modules["pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils"]
    if not hasattr(ra, "RoIAwarePool3d"):
        class _Pool:
            def __init__(self, *a, **k):
                pass

        ra.RoIAwarePool3d = _Pool
    unet_mod = mods["pcdet.models.backbones_3d.spconv_unet"]
    ph_mod = mods["pcdet.models.dense_heads.point_intra_part_head"]
    rh_mod = mods["pcdet.models.roi_heads.partA2_head"]

    backbone = unet_mod.UNetV2(
        model_cfg=AttrDict({"RETURN_ENCODED_TENSOR": True}),
        input_channels=4, grid_size=np.array([64, 64, 24]),
        voxel_size=[0.5, 0.5, 0.2],
        point_cloud_range=np.array([-16, -16, -2.4, 16, 16, 2.4]))
    # CLASS_AGNOSTIC point head (the reference PartA2 configs set it;
    # our detector mounts num_class=1, detectors.py PartA2Net)
    point_head = ph_mod.PointIntraPartOffsetHead(
        num_class=1, input_channels=16,
        model_cfg=AttrDict({"CLS_FC": [32], "PART_FC": [32],
                            "TARGET_CONFIG": {},
                            "LOSS_CONFIG": {"LOSS_REG": "smooth-l1"}}))
    roi_head = rh_mod.PartA2FCHead(
        input_channels=16, num_class=1,
        model_cfg=AttrDict({
            "SHARED_FC": [32], "CLS_FC": [32], "REG_FC": [32],
            "DP_RATIO": 0.0, "NMS_CONFIG": {},
            "ROI_AWARE_POOL": {"POOL_SIZE": 4, "NUM_FEATURES": 16,
                               "MAX_POINTS_PER_VOXEL": 64},
            "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder",
                              "BOX_CODER_CONFIG": {}},
            "LOSS_CONFIG": {"CLS_LOSS": "BinaryCrossEntropy",
                            "REG_LOSS": "smooth-l1",
                            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0,
                                             "rcnn_reg_weight": 1.0,
                                             "code_weights": [1.0] * 7}}}))
    full = nn.ModuleDict({"backbone_3d": backbone, "point_head": point_head,
                          "roi_head": roi_head})
    _randomize_bn(full, seed + 1)
    full.eval()
    return full


@pytest.fixture(scope="module")
def parta2_imported():
    import jax
    import jax.numpy as jnp

    from test_parta2 import CLASS_NAMES, parta2_cfg

    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.ops.voxelize import voxelize_points
    from com_tpu.utils.torch_import import import_torch_state_dict

    spconv_stubs = _fake_spconv()
    saved = {k: sys.modules.get(k) for k in spconv_stubs}
    sys.modules.update(spconv_stubs)
    try:
        with reference_modules(*REF_MODULES) as mods:
            full = _build_ref_parta2(mods)
            state = {k: v.detach().numpy()
                     for k, v in full.state_dict().items()}
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    rng = np.random.RandomState(9)
    pc_range = [-16, -16, -2.4, 16, 16, 2.4]
    vsize = [0.5, 0.5, 0.2]
    pts = np.concatenate(
        [rng.uniform(-14, 14, (2000, 2)), rng.uniform(-2.2, 2.2, (2000, 1)),
         rng.rand(2000, 1)], axis=1).astype(np.float32)
    vox, coords, num = voxelize_points(pts, pc_range, vsize, 4, 1024,
                                       pad_to_max=True)
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, :, 0:2] = rng.uniform(-10, 10, (2, 2))
    gt[0, :, 3:6] = [4.7, 2.1, 1.7]
    gt[0, :, 7] = 1
    batch = {"voxels": jnp.asarray(vox[None]),
             "voxel_coords": jnp.asarray(coords[None]),
             "voxel_num_points": jnp.asarray(num[None]),
             "gt_boxes": jnp.asarray(gt)}
    cfg = parta2_cfg()
    # the reference UNetV2 hardcodes the 16/32/64/64 ladder and 4 point
    # feature channels (spconv_unet.py:66-131) — match it for import
    cfg["BACKBONE_3D"]["CHANNELS"] = [16, 32, 64, 64]
    cfg["BACKBONE_3D"]["VOXEL_CAPS"] = [1024, 512, 256, 128]
    meta = DatasetMeta(CLASS_NAMES, pc_range, vsize, (64, 64, 24), 4)
    net = build_network(cfg, meta)
    template = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    variables, report = import_torch_state_dict(
        state, template, cfg, CLASS_NAMES)
    return dict(variables=variables, report=report, state=state)


def test_parta2_import_complete(parta2_imported):
    """Every tensor of the UNet + point head + roi head state_dict is
    consumed and lands shape-exact; only the deliberately-absent dense-head
    / BEV modules report missing."""
    report = parta2_imported["report"]
    other = ("backbone_2d.", "dense_head.")
    unexpected_missing = [k for k in report["missing"]
                          if not k.startswith(other)]
    assert unexpected_missing == []
    assert report["mismatch"] == []
    assert report["unused"] == []
    assert len(report["loaded"]) >= 150


def test_parta2_pooled_conv_parity(parta2_imported):
    """conv_part/conv_rpn: fake-spconv native weights -> dense torch Conv3d
    oracle vs our Conv3DBNReLU with the imported (spconv_dense) params on a
    fully-occupied pooled grid (subm conv == dense conv when every site is
    active)."""
    import jax.numpy as jnp

    from com_tpu.models.roi_heads.parta2_head import Conv3DBNReLU

    state = parta2_imported["state"]
    vars_ = parta2_imported["variables"]
    rh_top = next(t for t in vars_["params"]
                  if "PartA2FCHead" in t or t == "roi_head")
    rng = np.random.RandomState(31)

    for stem, cin in (("part", 4), ("rpn", 16)):
        x = rng.randn(2, 4, 4, 4, cin).astype(np.float32)
        ref = torch.from_numpy(x)
        for j, cout in ((0, 64), (1, 8)):
            w = state[f"roi_head.conv_{stem}.{j}.0.weight"]  # (3,3,3,ci,co)
            conv = torch.nn.Conv3d(w.shape[3], cout, 3, padding=1,
                                   bias=False)
            with torch.no_grad():
                conv.weight.copy_(
                    torch.from_numpy(w).permute(4, 3, 0, 1, 2))
                bn = torch.nn.BatchNorm3d(cout, eps=1e-3)
                bn.weight.copy_(torch.from_numpy(
                    state[f"roi_head.conv_{stem}.{j}.1.weight"]))
                bn.bias.copy_(torch.from_numpy(
                    state[f"roi_head.conv_{stem}.{j}.1.bias"]))
                bn.running_mean.copy_(torch.from_numpy(
                    state[f"roi_head.conv_{stem}.{j}.1.running_mean"]))
                bn.running_var.copy_(torch.from_numpy(
                    state[f"roi_head.conv_{stem}.{j}.1.running_var"]))
                bn.eval()
                ref = torch.relu(bn(conv(ref.permute(0, 4, 1, 2, 3))
                                    )).permute(0, 2, 3, 4, 1)

            got = Conv3DBNReLU(cout).apply(
                {"params": vars_["params"][rh_top][f"conv_{stem}_{j}"],
                 "batch_stats":
                     vars_["batch_stats"][rh_top][f"conv_{stem}_{j}"]},
                jnp.asarray(x if j == 0 else prev),
                jnp.ones((2, 4, 4, 4), bool), False)
            prev = np.asarray(got)
            np.testing.assert_allclose(prev, ref.numpy(), atol=3e-4,
                                       err_msg=f"conv_{stem}_{j}")


def test_parta2_fc_and_point_head_parity(parta2_imported):
    """shared/cls/reg Conv1d trunks + the point head's cls/part branches
    (real torch) vs the imported Dense/MaskedBatchNorm chains."""
    import jax.numpy as jnp
    from flax import linen as nn

    from com_tpu.models.dense_heads.point_head import PointIntraPartOffsetHead
    from com_tpu.models.layers import MaskedBatchNorm

    spconv_stubs = _fake_spconv()
    saved = {k: sys.modules.get(k) for k in spconv_stubs}
    sys.modules.update(spconv_stubs)
    try:
        with reference_modules(*REF_MODULES) as mods:
            full = _build_ref_parta2(mods)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    rng = np.random.RandomState(33)
    vars_ = parta2_imported["variables"]
    rh_top = next(t for t in vars_["params"]
                  if "PartA2FCHead" in t or t == "roi_head")
    ph_top = next(t for t in vars_["params"] if t == "point_head")
    sub_p, sub_s = vars_["params"][rh_top], vars_["batch_stats"][rh_top]

    # point head (our real module)
    feats = rng.randn(1, 40, 16).astype(np.float32)
    out = PointIntraPartOffsetHead(
        model_cfg={"CLS_FC": [32], "PART_FC": [32]}, num_class=1).apply(
        {"params": vars_["params"][ph_top],
         "batch_stats": vars_["batch_stats"][ph_top]},
        {"point_features": jnp.asarray(feats)}, train=False)
    with torch.no_grad():
        t = torch.from_numpy(feats.reshape(-1, 16))
        ref_cls = full["point_head"].cls_layers(t).numpy()
        ref_part = full["point_head"].part_reg_layers(t).numpy()
    np.testing.assert_allclose(
        np.asarray(out["point_cls_preds"]).reshape(-1, 1), ref_cls,
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["point_part_logits"]).reshape(-1, 3), ref_part,
        atol=2e-4)

    # roi FC trunks
    class TrunkProbe(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(32, use_bias=False, name="shared_fc_0")(x)
            x = MaskedBatchNorm(name="shared_bn_0")(
                x, use_running_average=True)
            x = nn.relu(x)
            outs = []
            for name in ("cls", "reg"):
                y = nn.Dense(32, use_bias=False, name=f"{name}_fc_0")(x)
                y = MaskedBatchNorm(name=f"{name}_bn_0")(
                    y, use_running_average=True)
                y = nn.relu(y)
                outs.append(nn.Dense(1 if name == "cls" else 7,
                                     name=f"{name}_out")(y))
            return outs

    c_in = 16 * 64  # NUM_FEATURES * POOL_SIZE^3
    fx = rng.randn(6, c_in).astype(np.float32)
    keep = [k for k in sub_p if k.startswith(("shared_", "cls_", "reg_"))]
    cls, reg = TrunkProbe().apply(
        {"params": {k: sub_p[k] for k in keep},
         "batch_stats": {k: sub_s[k] for k in sub_s
                         if k.startswith(("shared_", "cls_", "reg_"))}},
        jnp.asarray(fx))
    with torch.no_grad():
        t = torch.from_numpy(fx).unsqueeze(-1)
        shared = full["roi_head"].shared_fc_layer(t)
        ref_cls = full["roi_head"].cls_layers(shared)[:, :, 0].numpy()
        ref_reg = full["roi_head"].reg_layers(shared)[:, :, 0].numpy()
    np.testing.assert_allclose(np.asarray(cls)[:, 0], ref_cls[:, 0],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(reg), ref_reg, atol=3e-4)


def test_inverse_conv_matches_dense_transpose():
    """inverse_conv3d == torch ConvTranspose3d on a dense grid: validates
    the (j - p) transpose rulebook + native spconv weight enumeration the
    UNet decoder import relies on (both pad=1 and the conv4-style
    (0,1,1))."""
    import jax.numpy as jnp

    from com_tpu.ops import sparse as sp
    from com_tpu.utils.torch_import import t_spconv

    rng = np.random.RandomState(40)
    for pad in (1, (0, 1, 1)):
        glo = (3, 4, 4)
        pd = (pad,) * 3 if np.isscalar(pad) else pad
        ghi = tuple((g - 1) * 2 - 2 * p + 3 for g, p in zip(glo, pd))
        cin, cout = 5, 6
        w_native = rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.2
        feats = rng.randn(int(np.prod(glo)), cin).astype(np.float32)
        zz, yy, xx = np.meshgrid(*[np.arange(g) for g in glo], indexing="ij")
        coords = np.stack([zz, yy, xx], -1).reshape(-1, 3).astype(np.int32)
        hz, hy, hx = np.meshgrid(*[np.arange(g) for g in ghi], indexing="ij")
        hi_coords = np.stack([hz, hy, hx], -1).reshape(-1, 3).astype(np.int32)

        got = np.asarray(sp.inverse_conv3d(
            jnp.asarray(feats), jnp.asarray(coords),
            jnp.ones(len(coords), bool),
            jnp.asarray(t_spconv(w_native, 27)),
            jnp.asarray(hi_coords), jnp.ones(len(hi_coords), bool),
            glo, stride=(2, 2, 2), kernel=3, pad=pad))

        with torch.no_grad():
            tconv = torch.nn.ConvTranspose3d(cin, cout, 3, stride=2,
                                             padding=pd, bias=False)
            # torch ConvTranspose weight (cin, cout, kz, ky, kx)
            tconv.weight.copy_(
                torch.from_numpy(w_native).permute(3, 4, 0, 1, 2))
            x = torch.from_numpy(
                feats.reshape(*glo, cin)).permute(3, 0, 1, 2).unsqueeze(0)
            ref = tconv(x)[0].permute(1, 2, 3, 0).numpy().reshape(-1, cout)
        np.testing.assert_allclose(got, ref, atol=2e-4,
                                   err_msg=f"pad={pad}")
