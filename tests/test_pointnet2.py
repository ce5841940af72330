"""pointnet2 ops vs numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.ops import pointnet2 as pn2


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    # two distant clusters: FPS must pick from both
    a = rng.randn(50, 3) * 0.1
    b = rng.randn(50, 3) * 0.1 + 10.0
    xyz = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    idx = np.asarray(pn2.farthest_point_sample(xyz, jnp.ones(100, bool), 8))
    assert len(set(idx.tolist())) == 8
    assert (idx < 50).any() and (idx >= 50).any()


def test_fps_ignores_invalid():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    valid = jnp.asarray(np.arange(64) < 32)
    idx = np.asarray(pn2.farthest_point_sample(xyz, valid, 16))
    assert (idx < 32).all()


def test_ball_query_first_k_in_radius():
    xyz = jnp.asarray(np.array(
        [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 0, 0], [0.05, 0.05, 0]],
        np.float32))
    centers = jnp.asarray(np.array([[0, 0, 0], [100, 0, 0]], np.float32))
    idx, empty, slot = pn2.ball_query(0.5, 3, xyz, centers)
    idx = np.asarray(idx)
    assert list(idx[0]) == [0, 1, 2]  # first 3 in index order within radius
    assert bool(np.asarray(empty)[1]) is True
    assert np.asarray(slot)[0].all() and not np.asarray(slot)[1].any()
    # center with < nsample hits repeats the first hit; slot_valid marks
    # only the real hits
    idx2, _, slot2 = pn2.ball_query(0.15, 3, xyz, jnp.asarray([[0.0, 0, 0]]))
    assert list(np.asarray(idx2)[0]) == [0, 1, 1] or list(np.asarray(idx2)[0]) == [0, 1, 4]
    s2 = np.asarray(slot2)[0]
    assert s2[0] and s2[1]  # the real hits
    # a padded (repeat) slot, if any, is not marked valid
    assert s2.sum() == (3 if list(np.asarray(idx2)[0]) == [0, 1, 4] else 2)


def test_three_nn_interpolate_exact_at_known():
    rng = np.random.RandomState(2)
    known = rng.randn(32, 3).astype(np.float32)
    feats = rng.randn(32, 4).astype(np.float32)
    # unknown == a known point -> interpolation returns its feature
    dist, idx = pn2.three_nn(jnp.asarray(known[:5]), jnp.asarray(known))
    out = np.asarray(pn2.three_interpolate(jnp.asarray(feats), idx, dist))
    np.testing.assert_allclose(out, feats[:5], atol=1e-4)


def test_query_and_group_shapes_and_masking():
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(128, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(128, 8).astype(np.float32))
    centers = jnp.asarray(np.array([[0, 0, 0], [50, 50, 50]], np.float32))
    out, idx, empty, slot = jax.jit(
        lambda: pn2.query_and_group(2.0, 16, xyz, centers, feats)
    )()
    assert out.shape == (2, 16, 11)
    assert bool(np.asarray(empty)[1])
    assert np.abs(np.asarray(out)[1]).max() == 0  # empty group zeroed
    assert not np.asarray(slot)[1].any()
