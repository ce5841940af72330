"""SECONDHead rotated BEV pooling, proposal layer NMS, IoU loss, score fusion
(reference second_head.py / second_net_iou.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.roi_heads.proposal_layer import proposal_layer
from com_tpu.models.roi_heads.second_head import (
    SECONDHead,
    bilinear_sample,
    fuse_scores_by_npoints,
    rotated_roi_grid_sample,
    second_iou_loss,
)

PCR = (-16.0, -16.0, -2.0, 16.0, 16.0, 2.0)
VSIZE = (0.5, 0.5, 0.25)


def test_bilinear_sample_exact_and_zero_pad():
    fmap = jnp.arange(12.0).reshape(3, 4, 1)
    # exact grid points
    v = bilinear_sample(fmap, jnp.asarray([1.0, 3.0]), jnp.asarray([2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v)[:, 0], [9.0, 3.0])
    # midpoint interpolation
    v = bilinear_sample(fmap, jnp.asarray([0.5]), jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(v)[0, 0], (0 + 1 + 4 + 5) / 4)
    # outside -> 0
    v = bilinear_sample(fmap, jnp.asarray([-2.0, 10.0]), jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v)[:, 0], [0.0, 0.0])


def test_rotated_roi_grid_sample_constant_map():
    # constant feature map: any in-range roi pools the constant
    fmap = jnp.full((64, 64, 3), 2.5)
    rois = jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.7], [5.0, -3, 0, 2, 2, 1, -0.3]])
    out = rotated_roi_grid_sample(fmap, rois, PCR, VSIZE, 1.0, 5)
    assert out.shape == (2, 5, 5, 3)
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)


def test_rotated_roi_grid_sample_rotation_tracks_box():
    # gradient-in-x map; a box rotated 90deg samples the gradient along its v axis
    h = w = 64
    fmap = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :, None], (h, w, 1))
    roi0 = jnp.asarray([[0.0, 0, 0, 8, 2, 1.5, 0.0]])
    roi90 = jnp.asarray([[0.0, 0, 0, 8, 2, 1.5, np.pi / 2]])
    g = 7
    s0 = np.asarray(rotated_roi_grid_sample(fmap, roi0, PCR, VSIZE, 1.0, g))[0, :, :, 0]
    s90 = np.asarray(rotated_roi_grid_sample(fmap, roi90, PCR, VSIZE, 1.0, g))[0, :, :, 0]
    # unrotated: varies along u (rows of our (u, v) grid), constant along v
    assert np.abs(np.diff(s0, axis=0)).max() > 1e-3
    assert np.abs(np.diff(s0, axis=1)).max() < 1e-4
    # rotated 90deg: varies along v instead
    assert np.abs(np.diff(s90, axis=1)).max() > 1e-3
    assert np.abs(np.diff(s90, axis=0)).max() < 1e-4


def test_proposal_layer_suppresses_overlaps():
    boxes = np.zeros((1, 6, 7), np.float32)
    boxes[0, :, 3:6] = [4, 2, 1.5]
    boxes[0, 0, :2] = [0, 0]
    boxes[0, 1, :2] = [0.1, 0.0]  # heavy overlap with 0
    boxes[0, 2, :2] = [10, 10]
    boxes[0, 3, :2] = [10.05, 10]  # heavy overlap with 2
    boxes[0, 4, :2] = [-10, 5]
    boxes[0, 5, :2] = [5, -10]
    scores = np.asarray([[0.9, 0.8, 0.7, 0.75, 0.6, 0.5]], np.float32)
    labels = np.ones((1, 6), np.int32)
    rois, rs, rl, rv = proposal_layer(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        nms_pre=6, nms_post=4, nms_thresh=0.5)
    assert rois.shape == (1, 4, 7)
    kept = np.asarray(rois[0][np.asarray(rv[0])][:, :2])

    def has(xy):
        return (np.abs(kept - np.asarray(xy)).max(1) < 1e-3).any()

    assert has([0.0, 0.0]) and has([10.05, 10.0])  # winners kept
    assert not has([0.1, 0.0]) and not has([10.0, 10.0])  # overlaps suppressed


def test_second_head_forward_and_loss():
    rng = np.random.RandomState(0)
    cfg = {
        "SHARED_FC": [32, 32], "IOU_FC": [32], "DP_RATIO": 0.0,
        "ROI_GRID_POOL": {"GRID_SIZE": 4, "DOWNSAMPLE_RATIO": 1},
    }
    head = SECONDHead(model_cfg=cfg, num_class=1, point_cloud_range=PCR,
                      voxel_size=VSIZE)
    batch = {
        "rois": jnp.asarray(rng.uniform(-10, 10, (2, 8, 7)).astype(np.float32)),
        "spatial_features_2d": jnp.asarray(
            rng.rand(2, 64, 64, 16).astype(np.float32)),
    }
    variables = head.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = head.apply(variables, dict(batch), train=False)
    assert out["rcnn_iou"].shape == (2, 8)
    assert out["batch_box_preds"].shape == (2, 8, 7)

    class T:
        cls_labels = jnp.asarray(rng.rand(2, 8).astype(np.float32))
    out["roi_targets"] = T()
    loss = second_iou_loss(out, {"IOU_LOSS": "BinaryCrossEntropy",
                                 "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0}})
    assert np.isfinite(float(loss))
    # L2 and smoothL1 variants work too
    for kind in ("L2", "smoothL1"):
        loss = second_iou_loss(out, {"IOU_LOSS": kind,
                                     "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0}})
        assert np.isfinite(float(loss))


def test_fuse_scores_by_npoints_ramp():
    cls = jnp.asarray([0.9, 0.9, 0.9])
    iou = jnp.asarray([0.1, 0.1, 0.1])
    n = jnp.asarray([5.0, 55.0, 200.0])
    fused = np.asarray(fuse_scores_by_npoints(cls, iou, n))
    np.testing.assert_allclose(fused[0], 0.9, atol=1e-6)  # few points -> cls
    np.testing.assert_allclose(fused[2], 0.1, atol=1e-6)  # many points -> iou
    assert 0.1 < fused[1] < 0.9  # ramp in between
