"""Rotated IoU: exact cases + rasterized Monte-Carlo oracle; NMS semantics."""
import numpy as np
import jax.numpy as jnp

from com_tpu.ops import iou as iou_ops
from com_tpu.ops import nms as nms_ops
from com_tpu.ops.boxes import points_in_rbbox


def raster_iou(box_a, box_b, res=0.02):
    """Brute-force IoU by rasterizing a bounding window."""
    boxes = np.stack([box_a, box_b])
    lo = boxes[:, :2].min(0) - boxes[:, 3:5].max() - 1
    hi = boxes[:, :2].max(0) + boxes[:, 3:5].max() + 1
    xs = np.arange(lo[0], hi[0], res)
    ys = np.arange(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    m = points_in_rbbox(pts, boxes, xp=np, z_axis=False)
    inter = (m[:, 0] & m[:, 1]).sum()
    union = (m[:, 0] | m[:, 1]).sum()
    return inter / max(union, 1)


def test_identical_and_disjoint():
    a = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32)
    b = np.array([[50, 50, 0, 4, 2, 1.5, 1.0]], np.float32)
    iou = iou_ops.boxes_iou_bev(a, a, xp=np)
    assert np.isclose(iou[0, 0], 1.0, atol=1e-4)
    assert np.isclose(iou_ops.boxes_iou_bev(a, b, xp=np)[0, 0], 0.0, atol=1e-6)


def test_axis_aligned_matches_aligned_formula():
    rng = np.random.RandomState(3)
    a = np.concatenate(
        [rng.uniform(-5, 5, (8, 2)), np.zeros((8, 1)), rng.uniform(1, 4, (8, 3)), np.zeros((8, 1))],
        axis=1,
    ).astype(np.float32)
    b = np.concatenate(
        [rng.uniform(-5, 5, (6, 2)), np.zeros((6, 1)), rng.uniform(1, 4, (6, 3)), np.zeros((6, 1))],
        axis=1,
    ).astype(np.float32)
    rot = iou_ops.boxes_iou_bev(a, b, xp=np)
    ali = iou_ops.boxes_iou_aligned_bev(a, b, xp=np)
    np.testing.assert_allclose(rot, ali, atol=2e-3)


def test_rotated_vs_raster_oracle():
    rng = np.random.RandomState(7)
    for _ in range(12):
        a = np.array(
            [rng.uniform(-2, 2), rng.uniform(-2, 2), 0, rng.uniform(2, 5),
             rng.uniform(1, 3), 1.5, rng.uniform(-np.pi, np.pi)], np.float32)
        b = np.array(
            [rng.uniform(-2, 2), rng.uniform(-2, 2), 0, rng.uniform(2, 5),
             rng.uniform(1, 3), 1.5, rng.uniform(-np.pi, np.pi)], np.float32)
        got = iou_ops.boxes_iou_bev(a[None], b[None], xp=np)[0, 0]
        want = raster_iou(a, b)
        assert abs(got - want) < 0.02, (got, want)


def test_np_jnp_agree():
    rng = np.random.RandomState(11)
    a = np.concatenate(
        [rng.uniform(-10, 10, (16, 3)), rng.uniform(1, 5, (16, 3)),
         rng.uniform(-np.pi, np.pi, (16, 1))], axis=1).astype(np.float32)
    got_np = iou_ops.boxes_iou_bev(a, a, xp=np)
    got_jnp = np.asarray(iou_ops.boxes_iou_bev(jnp.asarray(a), jnp.asarray(a), xp=jnp))
    np.testing.assert_allclose(got_np, got_jnp, atol=1e-3)


def test_nms_bev_suppresses_overlaps():
    boxes = jnp.asarray(
        np.array(
            [
                [0, 0, 0, 4, 2, 1.5, 0.0],
                [0.1, 0.0, 0, 4, 2, 1.5, 0.0],  # heavy overlap with #0
                [10, 10, 0, 4, 2, 1.5, 0.5],
                [30, 30, 0, 4, 2, 1.5, 0.0],
            ],
            np.float32,
        )
    )
    scores = jnp.asarray([0.9, 0.95, 0.5, 0.2])
    valid = jnp.asarray([True, True, True, False])
    sel, sel_valid = nms_ops.nms_bev(boxes, scores, valid, thresh=0.5, post_max_size=4)
    sel = np.asarray(sel)[np.asarray(sel_valid)]
    assert list(sel) == [1, 2]  # box 0 suppressed by 1; box 3 invalid


def test_circle_nms_matches_reference_loop():
    rng = np.random.RandomState(5)
    n = 50
    centers = rng.uniform(0, 20, (n, 2)).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    thresh = 4.0

    # reference numba loop, in numpy (centernet_utils.py:143-167)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(n, bool)
    keep_ref = []
    for _i in range(n):
        i = order[_i]
        if suppressed[i]:
            continue
        keep_ref.append(i)
        for _j in range(_i + 1, n):
            j = order[_j]
            d = ((centers[i] - centers[j]) ** 2).sum()
            if d <= thresh:
                suppressed[j] = True

    sel, sel_valid = nms_ops.circle_nms(
        jnp.asarray(centers), jnp.asarray(scores), jnp.ones(n, bool), thresh, n
    )
    got = list(np.asarray(sel)[np.asarray(sel_valid)])
    assert got == keep_ref


def test_fast_nms_agrees_on_sparse_scenes():
    """fast NMS == exact greedy when overlaps form no suppression chains."""
    from com_tpu.ops.nms import fast_nms_bev

    boxes = jnp.asarray(np.array(
        [[0, 0, 0, 4, 2, 1.5, 0.0],
         [0.1, 0.0, 0, 4, 2, 1.5, 0.0],
         [20, 20, 0, 4, 2, 1.5, 0.5],
         [40, 40, 0, 4, 2, 1.5, 0.0]], np.float32))
    scores = jnp.asarray([0.9, 0.95, 0.5, 0.2])
    valid = jnp.ones(4, bool)
    se, sv = nms_ops.nms_bev(boxes, scores, valid, 0.5, 4)
    sf, svf = fast_nms_bev(boxes, scores, valid, 0.5, 4)
    np.testing.assert_array_equal(
        np.asarray(se)[np.asarray(sv)], np.asarray(sf)[np.asarray(svf)]
    )


def test_multi_class_nms_keeps_cross_class_overlaps():
    from com_tpu.ops.nms import multi_class_nms_bev

    # two identical boxes with different classes: both survive per-class NMS
    boxes = jnp.asarray(np.array(
        [[0, 0, 0, 4, 2, 1.5, 0.0], [0, 0, 0, 4, 2, 1.5, 0.0],
         [0.05, 0, 0, 4, 2, 1.5, 0.0]], np.float32))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    labels = jnp.asarray([1, 2, 1])
    idx, valid = multi_class_nms_bev(boxes, scores, labels, jnp.ones(3, bool),
                                     num_classes=2, thresh=0.5, post_max_size=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 1}  # box 2 suppressed within class 1, box 1 kept (class 2)


def test_pallas_greedy_suppress_interpret_matches_lax():
    from com_tpu.ops.pallas.nms_kernel import greedy_suppress_pallas
    from com_tpu.ops.nms import _greedy_suppress

    rng = np.random.RandomState(9)
    k = 130
    iou = rng.rand(k, k).astype(np.float32)
    iou = (iou + iou.T) / 2
    np.fill_diagonal(iou, 1.0)
    valid = jnp.asarray(rng.rand(k) > 0.2)
    keep_ref = np.asarray(_greedy_suppress(jnp.asarray(iou), 0.75, valid))
    keep_pl = np.asarray(greedy_suppress_pallas(
        jnp.asarray((iou > 0.75).astype(np.float32)), valid, interpret=True))
    np.testing.assert_array_equal(keep_ref, keep_pl)


def test_zero_padded_boxes_have_zero_iou():
    """Degenerate (zero-size padded) boxes used to pass every half-plane
    test and report IoU ~1e6 against real boxes, wiping out whole frames in
    NMS; the intersection is now clamped to min(area_a, area_b)."""
    from com_tpu.ops.iou import boxes_iou_bev, boxes_iou3d, boxes_overlap_bev

    real = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32)
    pad = np.zeros((2, 7), np.float32)
    pad[1, :2] = 50.0
    for fn in (boxes_iou_bev, boxes_iou3d, boxes_overlap_bev):
        out = np.asarray(fn(real, pad))
        assert (out <= 1e-6).all(), (fn.__name__, out)
        out = np.asarray(fn(pad, pad))
        assert (out <= 1e-6).all(), (fn.__name__, out)
    # and IoU can never exceed 1 for any box pair
    rng = np.random.RandomState(0)
    a = np.concatenate([rng.uniform(-5, 5, (20, 3)), rng.uniform(0.1, 5, (20, 3)),
                        rng.uniform(-3, 3, (20, 1))], 1).astype(np.float32)
    assert np.asarray(boxes_iou_bev(a, a)).max() <= 1.0 + 1e-5


def test_fast_nms_padding_slots_invalid():
    """post_max_size > K: suppressed boxes' sentinel writes land in slot K
    and used to surface as valid duplicate detections."""
    from com_tpu.ops.nms import fast_nms_bev

    boxes = jnp.asarray(np.array(
        [[0, 0, 0, 4, 2, 1.5, 0.0], [0.05, 0, 0, 4, 2, 1.5, 0.0],
         [20, 0, 0, 4, 2, 1.5, 0.0]], np.float32))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    sel, valid = fast_nms_bev(boxes, scores, jnp.ones(3, bool),
                              thresh=0.5, post_max_size=5)
    kept = np.asarray(sel)[np.asarray(valid)]
    assert sorted(kept.tolist()) == [0, 2]  # box 1 suppressed, no duplicates


def test_multi_class_nms_post_larger_than_k():
    """NMS_POST_MAXSIZE above the candidate count used to crash top_k."""
    from com_tpu.ops.nms import multi_class_nms_bev

    boxes = jnp.asarray(np.array(
        [[0, 0, 0, 4, 2, 1.5, 0.0], [20, 0, 0, 4, 2, 1.5, 0.0],
         [0.05, 0, 0, 4, 2, 1.5, 0.0]], np.float32))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    labels = jnp.asarray([1, 1, 1])
    idx, valid = multi_class_nms_bev(boxes, scores, labels, jnp.ones(3, bool),
                                     num_classes=1, thresh=0.5,
                                     post_max_size=8)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 1}


def test_aligned_bev_iou_nearest_90deg_swap():
    """boxes3d_nearest_bev_iou parity: a box rotated ~90 degrees swaps its
    footprint dims before the axis-aligned IoU."""
    from com_tpu.ops.iou import boxes_iou_aligned_bev

    a = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    b90 = np.array([[0, 0, 0, 4, 2, 1.5, np.pi / 2]], np.float32)
    # a: 4x2 footprint; b90 snaps to 2x4 -> intersection 2x2=4, union 12
    got = float(np.asarray(boxes_iou_aligned_bev(a, b90))[0, 0])
    np.testing.assert_allclose(got, 4.0 / 12.0, rtol=1e-5)
    # same heading -> unchanged aligned IoU of 1
    same = float(np.asarray(boxes_iou_aligned_bev(a, a))[0, 0])
    np.testing.assert_allclose(same, 1.0, rtol=1e-6)


def test_rowblocked_self_iou_matches_direct():
    from com_tpu.ops.nms import _self_iou
    from com_tpu.ops.iou import boxes_iou_bev

    rng = np.random.RandomState(3)
    k = 1536  # > 1024 and divisible by 512 -> row-blocked path
    boxes = np.concatenate([
        rng.uniform(-30, 30, (k, 3)), rng.uniform(0.5, 5, (k, 3)),
        rng.uniform(-3, 3, (k, 1))], 1).astype(np.float32)
    got = np.asarray(_self_iou(jnp.asarray(boxes), True))
    # same-device oracle: only the row blocking may differ; XLA reassociates
    # f32 math differently across the two compilations, so allow ~1e-4
    want = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes),
                                    xp=jnp))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)
