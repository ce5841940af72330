"""Parity: Pallas window-stamping kernel vs the XLA scatter reference path.

The kernel (ops/pallas/stamp.py) replaces the scatter lowering of
draw_gaussians / stamp_squares_last_wins inside the train step; the scatter
path (golden-tested against the reference loop in test_ops_gaussian.py)
is the oracle here.  Runs the kernel in interpret mode on CPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from com_tpu.ops import gaussian as G
from com_tpu.ops.pallas import stamp as S


def _rand_objects(rng, b, n, c, h, w, rmax):
    centers = np.stack(
        [rng.randint(0, w, size=(b, n)), rng.randint(0, h, size=(b, n))],
        axis=-1,
    )
    radii = rng.randint(0, rmax + 4, size=(b, n))  # some past the clip
    class_ids = rng.randint(0, c, size=(b, n))
    values = rng.uniform(0.5, 1.5, size=(b, n)).astype(np.float32)
    valid = rng.rand(b, n) > 0.3
    return (jnp.asarray(centers, jnp.int32), jnp.asarray(radii, jnp.int32),
            jnp.asarray(class_ids, jnp.int32), jnp.asarray(values),
            jnp.asarray(valid))


@pytest.mark.quick
def test_stamp_gauss_matches_xla():
    rng = np.random.RandomState(0)
    b, n, c, h, w, rmax = 2, 40, 3, 96, 80, 8
    centers, radii, class_ids, values, valid = _rand_objects(
        rng, b, n, c, h, w, rmax)
    got = S.stamp_windows(centers, radii, class_ids, values, valid,
                          c, h, w, "gauss", fill=0.0, max_radius=rmax,
                          interpret=True)
    want = jax.vmap(
        lambda ci, r, k, v: G.draw_gaussians(ci, r, k, v, c, h, w, rmax)
    )(centers, radii, class_ids, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.quick
def test_stamp_last_wins_matches_xla():
    rng = np.random.RandomState(1)
    b, n, c, h, w, rmax = 2, 30, 2, 64, 64, 6
    centers, radii, class_ids, values, valid = _rand_objects(
        rng, b, n, c, h, w, rmax)
    got = S.stamp_windows(centers, radii, class_ids, values, valid,
                          c, h, w, "last_wins", fill=1.0, max_radius=rmax,
                          interpret=True)
    base = jnp.ones((c, h, w), jnp.float32)
    want = jax.vmap(
        lambda ci, r, k, vals, v: G.stamp_squares_last_wins(
            base, ci, r, k, vals, v, rmax)
    )(centers, radii, class_ids, values, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_stamp_all_invalid_returns_fill():
    b, n, c, h, w = 1, 8, 2, 40, 40
    centers = jnp.zeros((b, n, 2), jnp.int32)
    radii = jnp.ones((b, n), jnp.int32)
    out = S.stamp_windows(centers, radii, jnp.zeros((b, n), jnp.int32),
                          jnp.ones((b, n)), jnp.zeros((b, n), bool),
                          c, h, w, "last_wins", fill=1.0, max_radius=4,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.ones((b, c, h, w)))


def test_stamp_edge_truncation():
    """Windows crossing the canvas edge are cropped, not wrapped/bled."""
    c, h, w, rmax = 2, 48, 40, 8
    centers = jnp.asarray([[[0, 0], [w - 1, h - 1]]], jnp.int32)
    radii = jnp.asarray([[5, 7]], jnp.int32)
    cls = jnp.asarray([[0, 1]], jnp.int32)
    valid = jnp.ones((1, 2), bool)
    got = S.stamp_windows(centers, radii, cls, jnp.ones((1, 2)), valid,
                          c, h, w, "gauss", fill=0.0, max_radius=rmax,
                          interpret=True)
    want = jax.vmap(
        lambda ci, r, k, v: G.draw_gaussians(ci, r, k, v, c, h, w, rmax)
    )(centers, radii, cls, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
    # channel 1's corner stamp must not bleed into channel 0
    assert np.asarray(got)[0, 0, h - 1, w - 1] == 0.0


def test_backend_env_dispatch(monkeypatch):
    monkeypatch.setenv("COM_TPU_STAMP", "cpu")
    assert S.stamp_backend() == "xla"
    monkeypatch.setenv("COM_TPU_STAMP", "xla")
    assert S.stamp_backend() == "xla"
    monkeypatch.setenv("COM_TPU_STAMP", "interpret")
    assert S.stamp_backend() == "interpret"
    monkeypatch.setenv("COM_TPU_STAMP", "bogus")
    with pytest.warns(UserWarning, match="COM_TPU_STAMP"):
        S.stamp_backend()
