"""Compact canvas scatter (ops/scatter.compact_canvas_max): value + grad
parity with the dense per-point segment_max it replaces, overflow fallback,
and end-to-end VFE equivalence under COMPACT_CANVAS_CAP.

Role parity: the reference's torch_scatter.scatter_max runs over
pre-compacted unique voxels (dynamic_pillar_vfe.py:36-46); this recovers
one-row-per-pillar scatter traffic on TPU with static shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from com_tpu.ops.scatter import compact_canvas_max


def _sorted_stream(rng, b, n, hw, occupied):
    """Per-sample sorted pillar ids with a trailing trash run (id = hw)."""
    seg = np.full((b, n), hw, np.int32)
    for i in range(b):
        k = int(n * 0.9)
        ids = np.sort(rng.choice(hw, size=occupied, replace=False))
        seg[i, :k] = np.sort(ids[rng.randint(0, occupied, k)])
    return jnp.asarray(seg)


def _dense(x, seg, b, n, hw):
    segg = (seg + jnp.arange(b, dtype=jnp.int32)[:, None] * (hw + 1)).reshape(-1)
    return jax.ops.segment_max(
        x.reshape(b * n, x.shape[-1]), segg, num_segments=b * (hw + 1),
        indices_are_sorted=True)


def test_value_and_grad_parity():
    rng = np.random.RandomState(0)
    b, n, hw, c = 2, 512, 100, 8
    seg = _sorted_stream(rng, b, n, hw, occupied=40)
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    cc, ok = jax.jit(lambda x: compact_canvas_max(x, seg, hw, cap=128))(x)
    assert bool(ok)
    dense = _dense(x, seg, b, n, hw)
    occ = np.isfinite(np.asarray(dense)).all(axis=-1)
    np.testing.assert_allclose(np.asarray(cc)[occ], np.asarray(dense)[occ],
                               rtol=1e-6, atol=1e-6)
    assert not np.isfinite(np.asarray(cc)[~occ]).any()  # empty rows -inf

    # grads: reduce through the finite-masked canvas exactly like the VFE
    def loss_compact(x):
        cv, _ = compact_canvas_max(x, seg, hw, cap=128)
        cv = jnp.where(jnp.isfinite(cv), cv, 0.0)
        return jnp.sum(cv * cv)

    def loss_dense(x):
        cv = _dense(x, seg, b, n, hw)
        cv = jnp.where(jnp.isfinite(cv), cv, 0.0)
        return jnp.sum(cv * cv)

    g1 = jax.jit(jax.grad(loss_compact))(x)
    g2 = jax.jit(jax.grad(loss_dense))(x)
    assert np.isfinite(np.asarray(g1)).all()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_overflow_reports_not_ok():
    rng = np.random.RandomState(1)
    b, n, hw, c = 1, 256, 300, 4
    seg = jnp.asarray(np.sort(rng.choice(hw, (b, n))).astype(np.int32))
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    _, ok = compact_canvas_max(x, seg, hw, cap=8)
    assert not bool(ok)


def test_vfe_compact_matches_dense(monkeypatch):
    """DynamicPillarVFE with COMPACT_CANVAS_CAP reproduces the dense path's
    spatial_features and parameter grads; an undersized cap falls back."""
    from com_tpu.models.vfe import DynamicPillarVFE

    rng = np.random.RandomState(2)
    b, n = 2, 2048
    grid, vsize, pcr = (32, 32, 1), (1.0, 1.0, 6.0), (-16, -16, -2, 16, 16, 4)
    pts = np.concatenate([
        rng.uniform(-15, 15, (b, n, 2)), rng.uniform(-1, 2, (b, n, 1)),
        rng.rand(b, n, 2)], axis=2).astype(np.float32)
    batch0 = {"points": jnp.asarray(pts),
              "points_mask": jnp.asarray(rng.rand(b, n) > 0.1)}

    def build(extra):
        cfg = {"NUM_FILTERS": [16], "USE_ABSLOTE_XYZ": True,
               "USE_NORM": True, "WITH_DISTANCE": False, **extra}
        return DynamicPillarVFE(cfg, 5, vsize, pcr, grid)

    dense_vfe = build({})
    variables = dense_vfe.init(jax.random.PRNGKey(0), dict(batch0), train=False)

    def run(vfe, v):
        out = vfe.apply(v, dict(batch0), train=False)
        return out["spatial_features"]

    want = run(dense_vfe, variables)

    for cap in (2048, 8):  # roomy cap; undersized cap exercises the fallback
        got = run(build({"COMPACT_CANVAS_CAP": cap}), variables)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=f"cap={cap}")

    def loss(v, vfe):
        return jnp.sum(run(vfe, v) ** 2)

    gd = jax.grad(loss)(variables, dense_vfe)
    gc = jax.grad(loss)(variables, build({"COMPACT_CANVAS_CAP": 2048}))
    for a, bb in zip(jax.tree_util.tree_leaves(gd),
                     jax.tree_util.tree_leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)
