"""VoxelBackBone8x torch-import parity via dense-grid equivalence.

spconv has no CPU build in this image, but on a FULLY-DENSE voxel grid the
reference sparse backbone (spconv_backbone.py:69-170 plain, :183-240 res) is
numerically identical to a dense torch Conv3d pipeline: submanifold conv ==
zero-padded dense conv when every site is active, strided SparseConv3d ==
strided dense conv, and BN1d over active voxels == BN3d (eval mode).  So we
build the reference structure with torch Conv3d layers, export a
reference-layout state_dict (spconv native (kz, ky, kx, cin, cout) weights),
import it through com_tpu.utils.torch_import, and require our sparse engine
to reproduce the dense outputs exactly — validating the spconv weight-layout
transform, the tap ordering, the stage structure (conv_input/conv1/.../
conv_out with conv4's (0,1,1) padding and the (3,1,1) z-compression), and
the strided-grid arithmetic in one shot.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

pytestmark = pytest.mark.quick

NZ, NY, NX = 24, 16, 16  # input grid (z pads +1 like spconv sparse_shape)


def _bn(c, g):
    m = nn.BatchNorm3d(c, eps=1e-3, momentum=0.01)
    m.running_mean.copy_(torch.randn(c, generator=g) * 0.1)
    m.running_var.copy_(torch.rand(c, generator=g) * 0.5 + 0.75)
    return m


class DenseRefBackbone(nn.Module):
    """Reference VoxelBackBone8x(+Res) as dense Conv3d (eval-mode oracle)."""

    def __init__(self, residual, in_ch=4, seed=5):
        super().__init__()
        torch.manual_seed(seed)
        g = torch.Generator().manual_seed(seed + 1)
        self.residual = residual
        chans = [16, 32, 64, 128] if residual else [16, 32, 64, 64]

        def subm(cin, cout):
            return nn.Sequential(nn.Conv3d(cin, cout, 3, padding=1,
                                           bias=False), _bn(cout, g),
                                 nn.ReLU())

        def res(c):
            blk = nn.Module()
            blk.conv1 = nn.Conv3d(c, c, 3, padding=1, bias=True)
            blk.bn1 = _bn(c, g)
            blk.conv2 = nn.Conv3d(c, c, 3, padding=1, bias=True)
            blk.bn2 = _bn(c, g)
            return blk

        def down(cin, cout, pad):
            return nn.Sequential(nn.Conv3d(cin, cout, 3, stride=2,
                                           padding=pad, bias=False),
                                 _bn(cout, g), nn.ReLU())

        body = res if residual else (lambda c: subm(c, c))
        self.conv_input = subm(in_ch, chans[0])
        n1 = 2 if residual else 1
        self.conv1 = nn.ModuleList([body(chans[0]) for _ in range(n1)])
        self.downs = nn.ModuleList()
        self.stages = nn.ModuleList()
        cin = chans[0]
        for i, c in enumerate(chans[1:]):
            self.downs.append(down(cin, c, (0, 1, 1) if i == 2 else 1))
            self.stages.append(nn.ModuleList([body(c) for _ in range(2)]))
            cin = c
        self.conv_out = nn.Sequential(
            nn.Conv3d(cin, 128, (3, 1, 1), stride=(2, 1, 1), padding=0,
                      bias=False), _bn(128, g), nn.ReLU())
        self.eval()

    def _body(self, blk, x):
        if not self.residual:
            return blk(x)
        out = torch.relu(blk.bn1(blk.conv1(x)))
        out = blk.bn2(blk.conv2(out))
        return torch.relu(out + x)

    @staticmethod
    def _down_mask(m, kernel, stride, pad):
        """Active-site propagation of a strided sparse conv: output site is
        active iff its window touches an active input (spconv semantics)."""
        import torch.nn.functional as F

        w = torch.ones((1, 1) + kernel)
        return (F.conv3d(m, w, stride=stride, padding=pad) > 0).float()

    def forward(self, x, m):
        """x dense input, m (1,1,Z,Y,X) active-site mask.  Sparse tensors
        have NO sites outside m (e.g. spconv's z-pad plane), so every stage
        zeroes inactive sites — that is what a sparse gather sees."""
        x = self.conv_input(x) * m
        for blk in self.conv1:
            x = self._body(blk, x) * m
        for dwn, stage in zip(self.downs, self.stages):
            conv = dwn[0]
            m = self._down_mask(m, conv.kernel_size, conv.stride,
                                conv.padding)
            x = dwn(x) * m
            for blk in stage:
                x = self._body(blk, x) * m
        conv = self.conv_out[0]
        m = self._down_mask(m, conv.kernel_size, conv.stride, conv.padding)
        return self.conv_out(x) * m

    def reference_state_dict(self):
        """Flat dict with reference key names + spconv NATIVE weight layout
        (kz, ky, kx, cin, cout) for conv kernels."""
        chix = {0: "conv_input", 5: "conv_out"}
        out = {}

        def put_conv(key, conv):
            w = conv.weight.detach().numpy()  # (O, I, kz, ky, kx)
            out[key + ".weight"] = np.ascontiguousarray(
                w.transpose(2, 3, 4, 1, 0))
            if conv.bias is not None:
                out[key + ".bias"] = conv.bias.detach().numpy()

        def put_bn(key, bn):
            out[key + ".weight"] = bn.weight.detach().numpy()
            out[key + ".bias"] = bn.bias.detach().numpy()
            out[key + ".running_mean"] = bn.running_mean.numpy()
            out[key + ".running_var"] = bn.running_var.numpy()

        def put_seq(prefix, seq):
            put_conv(f"{prefix}.0", seq[0])
            put_bn(f"{prefix}.1", seq[1])

        def put_res(prefix, blk):
            put_conv(f"{prefix}.conv1", blk.conv1)
            put_bn(f"{prefix}.bn1", blk.bn1)
            put_conv(f"{prefix}.conv2", blk.conv2)
            put_bn(f"{prefix}.bn2", blk.bn2)

        put_seq("backbone_3d.conv_input", self.conv_input)
        for j, blk in enumerate(self.conv1):
            if self.residual:
                put_res(f"backbone_3d.conv1.{j}", blk)
            else:
                put_seq(f"backbone_3d.conv1.{j}", blk)
        for i, (dwn, stage) in enumerate(zip(self.downs, self.stages)):
            s = i + 2
            put_seq(f"backbone_3d.conv{s}.0", dwn)
            for j, blk in enumerate(stage):
                if self.residual:
                    put_res(f"backbone_3d.conv{s}.{j + 1}", blk)
                else:
                    put_seq(f"backbone_3d.conv{s}.{j + 1}", blk)
        put_seq("backbone_3d.conv_out", self.conv_out)
        return out


@pytest.mark.parametrize("residual", [False, True])
def test_voxel_backbone_import_parity(residual):
    import jax
    import jax.numpy as jnp

    from com_tpu.models.backbone3d import (VoxelBackBone8x,
                                           VoxelResBackBone8x)
    from com_tpu.utils.torch_import import (Rule, apply_mapping,
                                            map_voxel_backbone)

    ref = DenseRefBackbone(residual)
    rng = np.random.RandomState(0)
    # voxels occupy every site at z < NZ; spconv's sparse_shape pads z by +1
    # (spconv_backbone.py:75), so the oracle grid is NZ+1 with the top plane
    # inactive (mask tracks active sites through the strided stages)
    dense_in = rng.randn(1, 4, NZ + 1, NY, NX).astype(np.float32) * 0.5
    dense_in[0, :, NZ:] = 0
    mask = np.ones((1, 1, NZ + 1, NY, NX), np.float32)
    mask[0, 0, NZ:] = 0
    with torch.no_grad():
        dense_out = ref(torch.from_numpy(dense_in),
                        torch.from_numpy(mask)).numpy()  # (1, 128, D, H, W)

    zz, yy, xx = np.meshgrid(np.arange(NZ), np.arange(NY), np.arange(NX),
                             indexing="ij")
    coords = np.stack([zz, yy, xx], axis=-1).reshape(1, -1, 3).astype(np.int32)
    feats = np.ascontiguousarray(
        dense_in[0, :, :NZ].transpose(1, 2, 3, 0).reshape(1, -1, 4))

    cls = VoxelResBackBone8x if residual else VoxelBackBone8x
    cfg = {"VOXEL_CAPS": [NZ * NY * NX, 4000, 1200, 400]}
    model = cls(model_cfg=cfg, input_channels=4, grid_size=(NX, NY, NZ),
                voxel_size=(0.1, 0.1, 0.15),
                point_cloud_range=(0, 0, 0, 1, 1, 1))
    batch = {"pillar_features": jnp.asarray(feats),
             "voxel_coords": jnp.asarray(coords)}
    template = model.init(jax.random.PRNGKey(0), dict(batch), train=False)

    rules = [Rule(r.torch_key, r.collection, r.path[1:], r.transform)
             for r in map_voxel_backbone(cfg, "TOP", residual=residual)]
    state = ref.reference_state_dict()
    variables, report = apply_mapping(state, template, rules)
    assert report["missing"] == [], report["missing"][:4]
    assert report["mismatch"] == [], report["mismatch"][:4]
    assert report["unused"] == []

    out = model.apply(variables, dict(batch), train=False)
    got = np.asarray(out["encoded_spconv_tensor"][0])  # (D, H, W, C)
    want = dense_out[0].transpose(1, 2, 3, 0)  # (D, H, W, C)
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-3)
    # residual adds amplify f32 accumulation-order divergence (identity +
    # delta cancellation across 16 chained convs); plain stays at 3e-4
    np.testing.assert_allclose(got / scale, want / scale,
                               atol=3e-3 if residual else 3e-4)


def test_spconv_implicit_layout_transform():
    """t_spconv also accepts spconv 2.x implicit-gemm (cout, k, k, k, cin)."""
    from com_tpu.utils.torch_import import t_spconv

    w = np.random.RandomState(0).randn(3, 3, 3, 5, 7).astype(np.float32)
    native = t_spconv(w, 27)
    implicit = t_spconv(w.transpose(4, 0, 1, 2, 3), 27)
    np.testing.assert_array_equal(native, implicit)
    z = t_spconv(np.zeros((3, 1, 1, 5, 7), np.float32), 3)
    assert z.shape == (3, 5, 7)
