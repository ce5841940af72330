import numpy as np
import jax.numpy as jnp

from com_tpu.ops import voxelize as V
from com_tpu.ops.boxes import ResidualCoder, points_in_rbbox, enlarge_box3d


def test_grid_size():
    g = V.grid_size_from_range([-74.88, -74.88, -2, 74.88, 74.88, 4.0], [0.32, 0.32, 6.0])
    assert list(g) == [468, 468, 1]


def test_voxelize_basic():
    pts = np.array(
        [
            [0.1, 0.1, 0.5, 1.0],
            [0.2, 0.15, 0.5, 2.0],  # same voxel as #0
            [5.0, 5.0, 0.5, 3.0],
            [100.0, 0.0, 0.5, 4.0],  # out of range
        ],
        np.float32,
    )
    vox, coords, npts = V.voxelize_points(
        pts, [-10, -10, 0, 10, 10, 2], [0.5, 0.5, 2.0], max_points_per_voxel=2, max_voxels=10
    )
    assert vox.shape[0] == 2
    assert list(npts) == [2, 1]
    # voxel arrival order preserved
    np.testing.assert_allclose(vox[0, 0], pts[0])
    np.testing.assert_allclose(vox[0, 1], pts[1])
    np.testing.assert_allclose(vox[1, 0], pts[2])
    # coords are zyx
    assert coords[0, 0] == 0 and coords[0, 2] == 20 and coords[0, 1] == 20


def test_voxelize_caps_and_padding():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-10, 10, (5000, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 2, 5000)
    vox, coords, npts = V.voxelize_points(
        pts, [-10, -10, 0, 10, 10, 2], [0.5, 0.5, 2.0], 4, 100, pad_to_max=True
    )
    assert vox.shape == (100, 4, 5)
    assert coords.shape == (100, 3)
    assert npts.max() <= 4


def test_point_voxel_ids_matches_host():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-9, 9, (1000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.1, 1.9, 1000)
    pc_range = [-10, -10, 0, 10, 10, 2]
    vsize = [0.5, 0.5, 2.0]
    grid = V.grid_size_from_range(pc_range, vsize)
    flat, inb = V.point_voxel_ids(jnp.asarray(pts), pc_range, vsize, grid)
    vx = ((pts[:, 0] + 10) / 0.5).astype(np.int64)
    vy = ((pts[:, 1] + 10) / 0.5).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(flat), vy * 40 + vx)
    assert np.asarray(inb).all()


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(2)
    boxes = np.concatenate(
        [rng.uniform(-10, 10, (32, 3)), rng.uniform(1, 5, (32, 3)),
         rng.uniform(-np.pi, np.pi, (32, 1))], axis=1)
    anchors = np.concatenate(
        [rng.uniform(-10, 10, (32, 3)), rng.uniform(1, 5, (32, 3)),
         np.zeros((32, 1))], axis=1)
    coder = ResidualCoder()
    rec = coder.decode(coder.encode(boxes, anchors, xp=np), anchors, xp=np)
    np.testing.assert_allclose(rec, boxes, atol=1e-6)
    coder_sc = ResidualCoder(encode_angle_by_sincos=True)
    enc = coder_sc.encode(boxes, anchors, xp=np)
    assert enc.shape[-1] == 8
    rec = coder_sc.decode(enc, anchors, xp=np)
    np.testing.assert_allclose(rec[:, :6], boxes[:, :6], atol=1e-6)
    # angle recovered mod 2pi
    d = np.abs(np.angle(np.exp(1j * (rec[:, 6] - boxes[:, 6]))))
    assert d.max() < 1e-5


def test_points_in_rbbox_rotation():
    box = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]])  # rotated 90deg: extent y=4, x=2
    pts = np.array([[0, 1.8, 0], [1.8, 0, 0], [0.9, 0, 0]])
    m = points_in_rbbox(pts, box, xp=np)
    assert list(m[:, 0]) == [True, False, True]
    big = enlarge_box3d(box, [0.5, 0.5, 0.5], xp=np)
    assert np.isclose(big[0, 3], 4.5)


def test_point_residual_coder_roundtrip():
    from com_tpu.ops.boxes import PointResidualCoder

    rng = np.random.RandomState(5)
    boxes = np.concatenate(
        [rng.uniform(-10, 10, (16, 3)), rng.uniform(1, 5, (16, 3)),
         rng.uniform(-np.pi, np.pi, (16, 1))], axis=1)
    points = rng.uniform(-10, 10, (16, 3))
    classes = rng.randint(1, 4, 16)
    coder = PointResidualCoder()
    rec = coder.decode(coder.encode(boxes, points, classes, xp=np), points, classes, xp=np)
    np.testing.assert_allclose(rec[:, :6], boxes[:, :6], atol=1e-5)
    d = np.abs(np.angle(np.exp(1j * (rec[:, 6] - boxes[:, 6]))))
    assert d.max() < 1e-5


def test_corner_loss_zero_at_identity_and_flip():
    from com_tpu.ops.boxes import corner_loss

    boxes = jnp.asarray(np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32))
    flipped = boxes.at[0, 6].add(np.pi)
    assert float(corner_loss(boxes, boxes)[0]) < 1e-3
    assert float(corner_loss(flipped, boxes)[0]) < 1e-3  # flip-invariant
    shifted = boxes.at[0, 0].add(2.0)
    assert float(corner_loss(shifted, boxes)[0]) > 1.0
