"""Engine A/B: v1 (27x loop oracle) vs v2 (batched lookup + wide GEMM).

Bit-level equivalence of every conv flavor across the engine and lookup
knobs, including the tap-inversion probe cut and the shared per-stage
rulebook (sp.subm_rulebook) that backs VoxelBackBone8x.  The reference's
spconv has one rulebook engine; ours keeps v1 as the always-on oracle
(reference: pcdet/models/backbones_3d/spconv_backbone.py:69-293)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from com_tpu.ops import sparse as sp
from tests.test_sparse_conv import random_sparse


def _with_env(monkeypatch, engine=None, lookup=None, tapinv=None,
              strided=None):
    for k in ("COM_TPU_SPARSE", "COM_TPU_SPARSE_LOOKUP",
              "COM_TPU_SPARSE_TAPINV", "COM_TPU_SPARSE_STRIDED"):
        monkeypatch.delenv(k, raising=False)
    if engine:
        monkeypatch.setenv("COM_TPU_SPARSE", engine)
    if lookup:
        monkeypatch.setenv("COM_TPU_SPARSE_LOOKUP", lookup)
    if tapinv is not None:
        monkeypatch.setenv("COM_TPU_SPARSE_TAPINV", tapinv)
    if strided is not None:
        monkeypatch.setenv("COM_TPU_SPARSE_STRIDED", strided)


def _mk(rng, grid=(5, 9, 9), n=60, cin=6, pad_invalid=12):
    coords, feats = random_sparse(rng, grid, n, cin)
    # padded/invalid tail rows exercise the drop-slot routing
    coords = np.concatenate(
        [coords, np.full((pad_invalid, 3), -1, np.int32)])
    feats = np.concatenate(
        [feats, rng.randn(pad_invalid, cin).astype(np.float32)])
    valid = np.arange(n + pad_invalid) < n
    return (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))


V2_MODES = [("v2", "sorted", "0"), ("v2", "dense", "0"),
            ("v2", "sorted", "1"), ("v2", "dense", "1")]


@pytest.mark.quick
@pytest.mark.parametrize("engine,lookup,tapinv", V2_MODES)
def test_engine_v1_v2_equivalence_subm(monkeypatch, engine, lookup, tapinv):
    rng = np.random.RandomState(3)
    grid = (5, 9, 9)
    feats, coords, valid = _mk(rng, grid)
    w = jnp.asarray(rng.randn(27, 6, 8).astype(np.float32) * 0.3)

    _with_env(monkeypatch, engine="v1")
    ref = np.asarray(jax.jit(
        lambda f, c, v: sp.submanifold_conv3d(f, c, v, w, grid))(
        feats, coords, valid))

    _with_env(monkeypatch, engine=engine, lookup=lookup, tapinv=tapinv)
    got = np.asarray(jax.jit(
        lambda f, c, v: sp.submanifold_conv3d(f, c, v, w, grid))(
        feats, coords, valid))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # shared precomputed rulebook must give the identical answer
    nidx = jax.jit(lambda c, v: sp.subm_rulebook(c, v, grid))(coords, valid)
    got2 = np.asarray(jax.jit(
        lambda f, c, v, ni: sp.submanifold_conv3d(f, c, v, w, grid,
                                                  nidx=ni))(
        feats, coords, valid, nidx))
    np.testing.assert_array_equal(got2, got)


STRIDED_MODES = [("v2", "sorted", "outprobe"), ("v2", "dense", "outprobe"),
                 ("v2", "sorted", "inprobe"), ("v2", "dense", "inprobe")]


@pytest.mark.quick
@pytest.mark.parametrize("engine,lookup,strided", STRIDED_MODES)
def test_engine_v1_v2_equivalence_strided(monkeypatch, engine, lookup,
                                          strided):
    rng = np.random.RandomState(4)
    grid = (5, 10, 10)
    feats, coords, valid = _mk(rng, grid, n=50, cin=4)
    w = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32) * 0.3)

    def run(f, c, v):
        return sp.strided_conv3d(f, c, v, w, grid, out_cap=70,
                                 stride=(2, 2, 2), kernel=3, pad=1)

    _with_env(monkeypatch, engine="v1")
    r_out, r_oc, r_ov, r_g = jax.jit(run)(feats, coords, valid)
    _with_env(monkeypatch, engine=engine, lookup=lookup, strided=strided)
    g_out, g_oc, g_ov, g_g = jax.jit(run)(feats, coords, valid)
    assert r_g == g_g
    np.testing.assert_array_equal(np.asarray(r_oc), np.asarray(g_oc))
    np.testing.assert_array_equal(np.asarray(r_ov), np.asarray(g_ov))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(r_out),
                               atol=1e-5)


@pytest.mark.quick
@pytest.mark.parametrize("engine,lookup,strided", STRIDED_MODES)
def test_engine_v1_v2_equivalence_strided_aniso(monkeypatch, engine, lookup,
                                                strided):
    """Anisotropic kernel + pad (the conv_out (3,1,1)/(2,1,1) shape)."""
    rng = np.random.RandomState(5)
    grid = (7, 8, 8)
    feats, coords, valid = _mk(rng, grid, n=40, cin=4)
    w = jnp.asarray(rng.randn(3, 4, 5).astype(np.float32) * 0.3)

    def run(f, c, v):
        return sp.strided_conv3d(f, c, v, w, grid, out_cap=60,
                                 stride=(2, 1, 1), kernel=(3, 1, 1), pad=0)

    _with_env(monkeypatch, engine="v1")
    r_out, r_oc, r_ov, _ = jax.jit(run)(feats, coords, valid)
    _with_env(monkeypatch, engine=engine, lookup=lookup, strided=strided)
    g_out, g_oc, g_ov, _ = jax.jit(run)(feats, coords, valid)
    np.testing.assert_array_equal(np.asarray(r_oc), np.asarray(g_oc))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(r_out),
                               atol=1e-5)


@pytest.mark.quick
def test_strided_outprobe_cap_overflow(monkeypatch):
    """With out_cap smaller than the true site count, the outprobe path
    must produce the same (silently truncated) outputs as the in-probe
    path: dropped sites receive no rulebook writes either way."""
    rng = np.random.RandomState(9)
    grid = (5, 10, 10)
    feats, coords, valid = _mk(rng, grid, n=50, cin=4)
    w = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32) * 0.3)

    def run(f, c, v):
        return sp.strided_conv3d(f, c, v, w, grid, out_cap=20,
                                 stride=(2, 2, 2), kernel=3, pad=1)

    _with_env(monkeypatch, engine="v2", lookup="dense", strided="inprobe")
    r_out, r_oc, r_ov, _ = jax.jit(run)(feats, coords, valid)
    _with_env(monkeypatch, engine="v2", lookup="dense", strided="outprobe")
    g_out, g_oc, g_ov, _ = jax.jit(run)(feats, coords, valid)
    np.testing.assert_array_equal(np.asarray(r_oc), np.asarray(g_oc))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(r_out),
                               atol=1e-5)


@pytest.mark.quick
@pytest.mark.parametrize("engine,lookup,tapinv", V2_MODES[:2])
def test_engine_v1_v2_equivalence_inverse(monkeypatch, engine, lookup,
                                          tapinv):
    rng = np.random.RandomState(6)
    grid = (5, 10, 10)
    hi_feats, hi_coords, hi_valid = _mk(rng, grid, n=50, cin=4)
    w_dn = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32) * 0.3)
    w_up = jnp.asarray(rng.randn(27, 6, 4).astype(np.float32) * 0.3)

    def run(f, c, v):
        lo_f, lo_c, lo_v, lo_g = sp.strided_conv3d(
            f, c, v, w_dn, grid, out_cap=70, stride=(2, 2, 2))
        return sp.inverse_conv3d(lo_f, lo_c, lo_v, w_up, c, v, lo_g,
                                 stride=(2, 2, 2), kernel=3, pad=1)

    _with_env(monkeypatch, engine="v1")
    ref = np.asarray(jax.jit(run)(hi_feats, hi_coords, hi_valid))
    _with_env(monkeypatch, engine=engine, lookup=lookup, tapinv=tapinv)
    got = np.asarray(jax.jit(run)(hi_feats, hi_coords, hi_valid))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.quick
def test_subm_mirror_vjp_matches_autodiff(monkeypatch):
    """The gather-only backward (COM_TPU_SPARSE_BWD=mirror) must produce
    the same gradients as XLA's scatter-add autodiff transpose."""
    rng = np.random.RandomState(11)
    grid = (5, 9, 9)
    feats, coords, valid = _mk(rng, grid, n=55, cin=6)
    w = jnp.asarray(rng.randn(27, 6, 8).astype(np.float32) * 0.3)

    def loss(f, wt):
        out = sp.submanifold_conv3d(f, coords, valid, wt, grid)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    grads = {}
    for mode in ("auto", "mirror"):
        monkeypatch.setenv("COM_TPU_SPARSE_BWD", mode)
        monkeypatch.setenv("COM_TPU_SPARSE", "v2")
        grads[mode] = jax.jit(jax.grad(loss, argnums=(0, 1)))(feats, w)
    np.testing.assert_allclose(np.asarray(grads["mirror"][0]),
                               np.asarray(grads["auto"][0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["mirror"][1]),
                               np.asarray(grads["auto"][1]), atol=1e-4)
    # and against the v1 oracle engine
    monkeypatch.setenv("COM_TPU_SPARSE", "v1")
    g1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(feats, w)
    np.testing.assert_allclose(np.asarray(grads["mirror"][0]),
                               np.asarray(g1[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["mirror"][1]),
                               np.asarray(g1[1]), atol=1e-4)


@pytest.mark.quick
def test_tapinv_rulebook_exact(monkeypatch):
    """Tap inversion reproduces the full 27-probe rulebook EXACTLY (it is
    a set identity, not an approximation)."""
    rng = np.random.RandomState(7)
    grid = (6, 11, 11)
    _, coords, valid = _mk(rng, grid, n=80, cin=3)
    for lookup in ("sorted", "dense"):
        _with_env(monkeypatch, engine="v2", lookup=lookup, tapinv="0")
        full = np.asarray(jax.jit(
            lambda c, v: sp.subm_rulebook(c, v, grid))(coords, valid))
        _with_env(monkeypatch, engine="v2", lookup=lookup, tapinv="1")
        inv = np.asarray(jax.jit(
            lambda c, v: sp.subm_rulebook(c, v, grid))(coords, valid))
        np.testing.assert_array_equal(inv, full)


def test_backbone_engine_equivalence(monkeypatch):
    """Full VoxelBackBone8x (with the shared stage rulebooks) matches the
    v1 oracle end to end."""
    from com_tpu.models.backbone3d import VoxelBackBone8x

    rng = np.random.RandomState(8)
    grid_xyz = (32, 32, 8)  # nx, ny, nz
    n, cap = 120, 160
    coords, feats = random_sparse(rng, (8, 32, 32), n, 5)
    coords = np.concatenate([coords, np.full((cap - n, 3), -1, np.int32)])
    feats = np.concatenate(
        [feats, np.zeros((cap - n, 5), np.float32)])
    batch = {
        "pillar_features": jnp.asarray(feats)[None],
        "voxel_coords": jnp.asarray(coords)[None],
    }
    net = VoxelBackBone8x(model_cfg={}, input_channels=5,
                          grid_size=grid_xyz, voxel_size=(0.1, 0.1, 0.15),
                          point_cloud_range=(0, 0, 0, 3.2, 3.2, 1.2))

    _with_env(monkeypatch, engine="v1")
    params = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    ref = np.asarray(net.apply(params, dict(batch), train=False)[
        "encoded_spconv_tensor"])
    for lookup in ("sorted", "dense"):
        for tapinv in ("0", "1"):
            _with_env(monkeypatch, engine="v2", lookup=lookup,
                      tapinv=tapinv)
            got = np.asarray(net.apply(params, dict(batch), train=False)[
                "encoded_spconv_tensor"])
            np.testing.assert_allclose(got, ref, atol=1e-4)
