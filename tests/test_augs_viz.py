"""Pyramid swap, road-plane placement, and the BEV renderer."""
import os

import numpy as np

from com_tpu.data.augmentor.database_sampler import DataBaseSampler
from com_tpu.data.augmentor.transforms import (
    _points_in_hulls,
    _ref_face_pyramids,
    local_pyramid_swap,
)
from com_tpu.utils.visualize import draw_scene_bev


def test_pyramid_membership_and_swap():
    rng = np.random.RandomState(0)
    boxes = np.asarray([
        [0.0, 0, 0, 4, 2, 2, 0.0],
        [10.0, 0, 0, 4, 2, 2, 0.0],
    ], np.float32)
    pyr = _ref_face_pyramids(boxes)
    assert pyr.shape == (2, 6, 5, 3)
    # center of box 0 is the apex of all its pyramids; a point near the +x
    # face belongs to the +x pyramid (face 0 in the reference's order)
    p = np.asarray([[1.8, 0.0, 0.0, 0.5]], np.float32)
    memberships = _points_in_hulls(p, pyr[0])[0]
    assert memberships[0] and memberships.sum() == 1

    # points in both boxes' +x pyramids; force a swap
    pts = []
    for bx in (0.0, 10.0):
        c = rng.uniform(1.2, 1.9, (30, 1))
        yz = rng.uniform(-0.3, 0.3, (30, 2))
        inten = rng.rand(30, 1)
        pts.append(np.concatenate([c + bx, yz, inten], 1))
    points = np.concatenate(pts).astype(np.float32)
    # prob=0.5 with RandomState(1) (uniforms 0.417, 0.720): box 0 swaps,
    # box 1 stays eligible as its partner -> a genuine cross-object swap
    # (prob=1.0 would make both boxes pick the +x face and fall back to the
    # reference's self-swap branch, which duplicates points)
    out_boxes, out_points = local_pyramid_swap(
        boxes, points.copy(), prob=0.5, max_num_pts=5,
        rng=np.random.RandomState(1))
    assert out_points.shape[1] == 4
    assert len(out_points) == len(points)  # swap preserves counts
    assert not np.allclose(np.sort(out_points[:, 0]), np.sort(points[:, 0]))
    # swapped points stay inside their destination boxes' x-extents
    near0 = np.abs(out_points[:, 0]) < 2.1
    near1 = np.abs(out_points[:, 0] - 10) < 2.1
    assert (near0 | near1).all()


def test_put_boxes_on_road_plane_lidar_frame():
    boxes = np.asarray([[5.0, 2.0, 1.5, 4, 2, 1.6, 0.0]], np.float32)
    # plane z = -1.8 (a=0, b=0, c=1, d=1.8)
    out, mv = DataBaseSampler.put_boxes_on_road_planes(
        boxes, [0.0, 0.0, 1.0, 1.8])
    # bottom of the box lands on the plane
    np.testing.assert_allclose(out[0, 2] - out[0, 5] / 2, -1.8, atol=1e-6)
    np.testing.assert_allclose(mv[0], 1.5 - 0.8 + 1.8, atol=1e-6)


def test_draw_scene_bev_writes_png(tmp_path):
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.uniform(-20, 20, (500, 2)), rng.uniform(-2, 2, (500, 1))], 1)
    gt = np.asarray([[0.0, 0, 0, 4, 2, 1.6, 0.5]])
    pred = np.asarray([[0.3, 0.1, 0, 4.1, 1.9, 1.5, 0.45]])
    out = tmp_path / "scene.png"
    draw_scene_bev(pts, gt_boxes=gt, pred_boxes=pred,
                   pred_scores=np.asarray([0.87]),
                   pred_labels=np.asarray([1]), class_names=["Vehicle"],
                   point_range=[-20, -20, -2, 20, 20, 2],
                   save_path=str(out))
    assert out.exists() and os.path.getsize(out) > 10000
