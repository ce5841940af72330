"""Sparse conv engine: dense-conv oracle tests + SECOND-style backbone."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.ops import sparse as sp


def dense_conv3d_oracle(dense_in, weights, kernel=3, stride=1):
    """Brute-force dense 3D conv (numpy) for comparison; weights (K^3,Cin,Cout)
    indexed in the same zyx offset order as ops.sparse._offsets."""
    nz, ny, nx, cin = dense_in.shape
    cout = weights.shape[-1]
    r = kernel // 2
    offs = sp._offsets(kernel)
    oz, oy, ox = (np.array([nz, ny, nx]) + stride - 1) // stride if stride > 1 else (nz, ny, nx)
    out = np.zeros((oz, oy, ox, cout), np.float32)
    for k, (dz, dy, dx) in enumerate(offs):
        for z in range(oz):
            for y in range(oy):
                for x in range(ox):
                    iz, iy, ix = z * stride + dz, y * stride + dy, x * stride + dx
                    if 0 <= iz < nz and 0 <= iy < ny and 0 <= ix < nx:
                        out[z, y, x] += dense_in[iz, iy, ix] @ weights[k]
    return out


def random_sparse(rng, grid, n, cin):
    nz, ny, nx = grid
    flat = rng.choice(nz * ny * nx, size=n, replace=False)
    coords = np.stack([flat // (ny * nx), (flat // nx) % ny, flat % nx], axis=1)
    feats = rng.randn(n, cin).astype(np.float32)
    return coords.astype(np.int32), feats


@pytest.mark.quick
def test_submanifold_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    grid = (4, 6, 6)
    coords, feats = random_sparse(rng, grid, 30, 5)
    w = rng.randn(27, 5, 7).astype(np.float32) * 0.2
    valid = np.ones(30, bool)

    out = np.asarray(
        jax.jit(lambda f, c, v: sp.submanifold_conv3d(f, c, v, jnp.asarray(w), grid))(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)
        )
    )
    dense = np.zeros((*grid, 5), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    oracle = dense_conv3d_oracle(dense, w)
    for i, c in enumerate(coords):
        np.testing.assert_allclose(out[i], oracle[c[0], c[1], c[2]], atol=1e-4)


def test_strided_conv_matches_dense_at_sites():
    rng = np.random.RandomState(1)
    grid = (4, 8, 8)
    coords, feats = random_sparse(rng, grid, 40, 4)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.2
    valid = np.ones(40, bool)

    out, ocoords, ovalid, dgrid = jax.jit(
        lambda f, c, v: sp.strided_conv3d(
            f, c, v, jnp.asarray(w), grid, out_cap=64, stride=(2, 2, 2)
        )
    )(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))
    out, ocoords, ovalid = map(np.asarray, (out, ocoords, ovalid))

    dense = np.zeros((*grid, 4), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    oracle = dense_conv3d_oracle(dense, w, stride=2)

    # output sites: every o whose k=3 s=2 p=1 window touches an input —
    # per axis {i//2} plus the halo {(i+1)//2} at odd coords (spconv
    # SparseConv3d semantics)
    dgrid_np = tuple((g + 2 - 3) // 2 + 1 for g in grid)
    want_sites = set()
    for c in coords:
        for z in {c[0] // 2, (c[0] + 1) // 2}:
            for y in {c[1] // 2, (c[1] + 1) // 2}:
                for x in {c[2] // 2, (c[2] + 1) // 2}:
                    if all(0 <= v < g for v, g in zip((z, y, x), dgrid_np)):
                        want_sites.add((z, y, x))
    got_sites = set(map(tuple, ocoords[ovalid]))
    assert got_sites == want_sites
    for i in np.where(ovalid)[0]:
        z, y, x = ocoords[i]
        np.testing.assert_allclose(out[i], oracle[z, y, x], atol=1e-4)


def test_padding_invariance():
    """Extra invalid rows must not change results."""
    rng = np.random.RandomState(2)
    grid = (3, 5, 5)
    coords, feats = random_sparse(rng, grid, 20, 3)
    w = rng.randn(27, 3, 4).astype(np.float32) * 0.3

    out1 = np.asarray(sp.submanifold_conv3d(
        jnp.asarray(feats), jnp.asarray(coords), jnp.ones(20, bool),
        jnp.asarray(w), grid))
    coords_pad = np.concatenate([coords, np.zeros((12, 3), np.int32)])
    feats_pad = np.concatenate([feats, rng.randn(12, 3).astype(np.float32)])
    valid_pad = np.concatenate([np.ones(20, bool), np.zeros(12, bool)])
    out2 = np.asarray(sp.submanifold_conv3d(
        jnp.asarray(feats_pad), jnp.asarray(coords_pad), jnp.asarray(valid_pad),
        jnp.asarray(w), grid))
    np.testing.assert_allclose(out1, out2[:20], atol=1e-5)
    assert np.abs(out2[20:]).max() == 0


def test_voxel_backbone_8x_shapes():
    from com_tpu.models.backbone3d import VoxelBackBone8x
    from com_tpu.utils.config import CfgNode

    rng = np.random.RandomState(3)
    b, v = 2, 256
    grid_size = (32, 32, 8)  # nx, ny, nz
    coords = np.stack([
        rng.randint(0, 8, (b, v)), rng.randint(0, 32, (b, v)), rng.randint(0, 32, (b, v)),
    ], axis=2).astype(np.int32)
    nvalid = 200
    coords[:, nvalid:] = -1
    feats = rng.randn(b, v, 4).astype(np.float32)
    batch = {
        "pillar_features": jnp.asarray(feats),
        "voxel_coords": jnp.asarray(coords),
    }
    net = VoxelBackBone8x(
        model_cfg=CfgNode({"CHANNELS": [8, 16, 32, 64], "OUT_CHANNELS": 64}),
        input_channels=4, grid_size=grid_size, voxel_size=(0.1, 0.1, 0.15),
        point_cloud_range=(-1.6, -1.6, -0.6, 1.6, 1.6, 0.6),
    )
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out, _ = net.apply(variables, dict(batch), train=True, mutable=["batch_stats"])
    dense = out["encoded_spconv_tensor"]
    # grid z padded to 9 -> strides 2,2,2 then z-stride 2: ceil(9/8)=2 -> ceil(2/2)=1
    assert dense.shape[0] == b and dense.shape[-1] == 64
    assert dense.shape[2] == 4 and dense.shape[3] == 4  # 32/8
    assert out["encoded_spconv_tensor_stride"] == 8
    assert np.isfinite(np.asarray(dense)).all()


def test_voxel_res_backbone_8x():
    from com_tpu.models.backbone3d import VoxelResBackBone8x
    from com_tpu.utils.config import CfgNode

    rng = np.random.RandomState(4)
    b, v = 1, 128
    coords = np.stack([
        rng.randint(0, 8, (b, v)), rng.randint(0, 32, (b, v)), rng.randint(0, 32, (b, v)),
    ], axis=2).astype(np.int32)
    feats = rng.randn(b, v, 4).astype(np.float32)
    batch = {"pillar_features": jnp.asarray(feats), "voxel_coords": jnp.asarray(coords)}
    net = VoxelResBackBone8x(
        model_cfg=CfgNode({"CHANNELS": [8, 16, 16, 32], "OUT_CHANNELS": 32,
                           "VOXEL_CAPS": [128, 64, 32, 16]}),
        input_channels=4, grid_size=(32, 32, 8), voxel_size=(0.1, 0.1, 0.15),
        point_cloud_range=(-1.6, -1.6, -0.6, 1.6, 1.6, 0.6),
    )
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = net.apply(variables, dict(batch), train=False)
    dense = out["encoded_spconv_tensor"]
    assert dense.shape[-1] == 32 and dense.shape[2] == 4
    assert np.isfinite(np.asarray(dense)).all()
