"""Device hard voxelizer: parity with the host voxelizer (spconv Point2Voxel
role) up to voxel ordering, and PillarVFE integration."""
import numpy as np
import jax.numpy as jnp

from com_tpu.ops.voxelize import device_hard_voxelize, voxelize_points

PCR = [-8.0, -8.0, -2.0, 8.0, 8.0, 4.0]
VSIZE = [0.32, 0.32, 6.0]
GRID = (50, 50, 1)


def _points(rng, n, frac_out=0.1):
    pts = np.concatenate(
        [
            rng.uniform(-9, 9, (n, 2)),  # some out of range
            rng.uniform(-3, 5, (n, 1)),
            rng.rand(n, 2),
        ],
        axis=1,
    ).astype(np.float32)
    return pts


def test_device_voxelize_matches_host_sets():
    rng = np.random.RandomState(0)
    n, t, v = 4096, 5, 2600  # cap above the ~2000 distinct cells: no binding
    pts = _points(rng, n)
    mask = rng.rand(n) < 0.9

    dv, dc, dn = device_hard_voxelize(
        jnp.asarray(pts)[None], jnp.asarray(mask)[None], PCR, VSIZE, GRID, t, v
    )
    dv, dc, dn = np.asarray(dv[0]), np.asarray(dc[0]), np.asarray(dn[0])

    hv, hc, hn = voxelize_points(pts[mask], PCR, VSIZE, t, v)

    # same voxel set (device emits key order, host arrival order)
    dvalid = dc[:, 0] >= 0
    dev = {tuple(c): (dn[i], dv[i]) for i, c in enumerate(dc[dvalid], 0) if True}
    dev = {tuple(dc[i]): (dn[i], dv[i]) for i in np.where(dvalid)[0]}
    host = {tuple(hc[i]): (hn[i], hv[i]) for i in range(len(hc))}
    assert set(dev) == set(host)
    for k in host:
        assert dev[k][0] == host[k][0]
        # per-voxel contents bit-equal (stable sort keeps arrival order)
        np.testing.assert_array_equal(dev[k][1], host[k][1])

    # padded voxel rows are fully zeroed
    assert (dv[~dvalid] == 0).all() and (dn[~dvalid] == 0).all()


def test_device_voxelize_cap_behavior():
    rng = np.random.RandomState(1)
    pts = _points(rng, 2048)
    mask = np.ones(2048, bool)
    t, v = 3, 16  # tiny caps: per-voxel cap and voxel-count cap both bind
    dv, dc, dn = device_hard_voxelize(
        jnp.asarray(pts)[None], jnp.asarray(mask)[None], PCR, VSIZE, GRID, t, v
    )
    dv, dc, dn = np.asarray(dv[0]), np.asarray(dc[0]), np.asarray(dn[0])
    assert dn.max() <= t
    assert (dc[:, 0] >= 0).sum() == v  # cap binds
    # lowest-keyed voxels win under the cap (documented deviation)
    keys = (dc[:, 0] * GRID[1] + dc[:, 1]) * GRID[0] + dc[:, 2]
    assert (np.diff(keys) > 0).all()


def test_pillar_vfe_voxelize_on_device_end_to_end():
    import jax
    from com_tpu.models.vfe import PillarVFE

    rng = np.random.RandomState(2)
    pts = np.stack([_points(rng, 2048), _points(rng, 2048)])
    mask = rng.rand(2, 2048) < 0.95
    cfg = {
        "NUM_FILTERS": [32],
        "USE_ABSLOTE_XYZ": True,
        "VOXELIZE_ON_DEVICE": {"MAX_POINTS_PER_VOXEL": 5,
                               "MAX_NUMBER_OF_VOXELS": 1024},
    }
    vfe = PillarVFE(model_cfg=cfg, num_point_features=5, voxel_size=VSIZE,
                    point_cloud_range=PCR, grid_size=GRID)
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask)}
    variables = vfe.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = jax.jit(
        lambda vb, b: vfe.apply(vb, dict(b), train=False)["pillar_features"]
    )(variables, batch)
    assert out.shape == (2, 1024, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_voxel_cap_overflow_does_not_absorb_dropped_runs():
    """With more occupied cells than max_voxels, the last kept voxel used to
    count/gather points belonging to the dropped cells."""
    # 5 distinct pillars, 2 points each, cap at 3 voxels
    xs = np.array([-6.0, -3.0, 0.0, 3.0, 6.0], np.float32)
    pts = np.zeros((1, 10, 5), np.float32)
    for i, x in enumerate(xs):
        pts[0, 2 * i : 2 * i + 2, 0] = x
        pts[0, 2 * i : 2 * i + 2, 1] = x  # distinct y too
        pts[0, 2 * i : 2 * i + 2, 3] = i + 1  # payload marks the cell
    mask = np.ones((1, 10), bool)
    vox, coords, num = device_hard_voxelize(
        jnp.asarray(pts), jnp.asarray(mask), PCR, VSIZE, GRID,
        max_points_per_voxel=4, max_voxels=3)
    vox, coords, num = map(np.asarray, (vox, coords, num))
    assert (num[0] == 2).all(), num[0]  # every kept voxel has its own 2 pts
    for v in range(3):
        payload = vox[0, v, : num[0, v], 3]
        assert len(set(payload.tolist())) == 1, (v, payload)
