"""MPPNet family: trajectory linking, point cropping, head forward + loss,
and a tiny overfit smoke test (reference mppnet_head.py semantics)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from com_tpu.models.mppnet import (
    MPPNetHead,
    generate_trajectory,
    mppnet_loss,
    sample_mppnet_targets,
)
from com_tpu.models.mppnet.mppnet_head import (
    corner_points_of_roi,
    crop_trajectory_points,
    proxy_points_of_roi,
    spherical_coordinate,
)

F, P, R, K = 4, 10, 6, 16

HEAD_CFG = {
    "TRANS_INPUT": 32,
    "USE_TRAJ_EMPTY_MASK": True,
    "ROI_GRID_POOL": {
        "GRID_SIZE": 2,
        "MLPS": [[16, 32]],  # last channel x num_radii == TRANS_INPUT
        "POOL_RADIUS": [1.6],
        "NSAMPLE": [8],
        "POOL_METHOD": "max_pool",
    },
    "Transformer": {
        "num_lidar_points": K,
        "num_proxy_points": 8,  # 2^3
        "enc_layers": 3,
        "dim_feedforward": 64,
        "hidden_dim": 32,
        "dropout": 0.0,
        "nheads": 2,
        "num_frames": F,
        "num_groups": F,
        "use_mlp_mixer": {"hidden_dim": 8},
    },
    "LOSS_CONFIG": {
        "CLS_LOSS": "BinaryCrossEntropy",
        "REG_LOSS": "smooth-l1",
        "CORNER_LOSS_REGULARIZATION": True,
        "LOSS_WEIGHTS": {
            "rcnn_cls_weight": 1.0,
            "rcnn_reg_weight": 1.0,
            "rcnn_corner_weight": 2.0,
            "traj_reg_weight": [2.0, 2.0, 2.0],
            "code_weights": [1.0] * 7,
        },
    },
}


def make_scene(rng, b=1):
    """One moving box per scene + distractors; 4 frames of fused points."""
    gt = np.zeros((b, 3, 8), np.float32)
    gt[:, 0] = [10, 5, 0.5, 4.2, 1.9, 1.6, 0.3, 1]
    gt[:, 1] = [-8, -12, 0.2, 0.9, 0.8, 1.7, 1.2, 2]
    gt[:, 2, -1] = 0  # padding

    vel = np.array([1.5, -0.5], np.float32)
    proposals = np.zeros((b, F, P, 9), np.float32)
    scores = np.zeros((b, F, P), np.float32)
    labels = np.zeros((b, P), np.int32)
    for f in range(F):
        # frame f: the box observed f frames back (ego-compensated coords)
        # trajectory convention (mppnet_head.py:646): past position =
        # previous position + vel columns, i.e. cols 7:9 hold the per-frame
        # backward displacement
        proposals[:, f, 0, :7] = gt[:, 0, :7]
        proposals[:, f, 0, 0:2] += vel * f
        proposals[:, f, 0, 7:9] = vel
        proposals[:, f, 1, :7] = gt[:, 1, :7]
        proposals[:, f, 1, 7:9] = 0
        # distractors far away
        proposals[:, f, 2:, 0] = 60.0 + 5 * np.arange(P - 2)
        proposals[:, f, 2:, 1] = -60.0
        proposals[:, f, 2:, 3:6] = 1.0
        scores[:, f, 0] = 0.9
        scores[:, f, 1] = 0.8
        scores[:, f, 2:] = 0.1
    labels[:, 0] = 1
    labels[:, 1] = 2

    # points: clusters inside each box per frame + noise, timestamp last
    pts = []
    for f in range(F):
        for box in (proposals[0, f, 0], proposals[0, f, 1]):
            c = rng.randn(40, 3).astype(np.float32) * 0.3 + box[None, :3]
            feat = rng.rand(40, 2).astype(np.float32)
            t = np.full((40, 1), f * 0.1, np.float32)
            pts.append(np.concatenate([c, feat, t], axis=1))
    noise = np.concatenate([
        rng.uniform(-70, 70, (200, 2)),
        rng.uniform(-2, 4, (200, 1)),
        rng.rand(200, 2),
        (rng.randint(0, F, (200, 1)) * 0.1),
    ], axis=1).astype(np.float32)
    pts.append(noise)
    points = np.concatenate(pts)[None].repeat(b, 0)
    pmask = np.ones(points.shape[:2], bool)
    return (
        jnp.asarray(gt), jnp.asarray(proposals), jnp.asarray(scores),
        jnp.asarray(labels), jnp.asarray(points), jnp.asarray(pmask),
    )


def test_generate_trajectory_links_moving_box():
    rng = np.random.RandomState(0)
    gt, proposals, scores, labels, points, pmask = make_scene(rng)
    traj, valid = generate_trajectory(proposals[:, 0], proposals)
    assert traj.shape == (1, F, P, 9)
    # the moving box should link through all frames to its per-frame proposal
    for f in range(1, F):
        np.testing.assert_allclose(
            np.asarray(traj[0, f, 0, :7]), np.asarray(proposals[0, f, 0, :7]),
            atol=1e-5,
        )
        assert valid[0, f, 0] == 1.0
    # static box matches itself each frame (identical proposals)
    assert valid[0, 1, 1] == 1.0


def test_crop_points_gets_in_box_points():
    rng = np.random.RandomState(1)
    gt, proposals, scores, labels, points, pmask = make_scene(rng)
    traj, valid = generate_trajectory(proposals[:, 0], proposals)
    src = crop_trajectory_points(points, pmask, traj, valid, K)
    assert src.shape == (1, P, F * K, 5)
    # roi 0 frame 0: cropped points near the box center
    seg = np.asarray(src[0, 0, :K])
    center = np.asarray(proposals[0, 0, 0, :2])
    live = np.abs(seg).sum(1) > 0
    assert live.sum() > 0
    d = np.linalg.norm(seg[live][:, :2] - center[None], axis=1)
    assert (d < 3.0).all()
    # distractor roi with no points -> zeros
    far = np.asarray(src[0, 4])
    assert (np.abs(far).sum(-1) == 0).all()


def test_proxy_and_corner_geometry():
    rois = jnp.asarray([[0.0, 0, 0, 4, 2, 1, 0]])
    corners = corner_points_of_roi(rois)
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(
        np.abs(np.asarray(corners)).max(0).max(0), [2, 1, 0.5], atol=1e-6)
    proxy, local = proxy_points_of_roi(rois, 2)
    assert proxy.shape == (1, 8, 3)
    np.testing.assert_allclose(
        np.abs(np.asarray(local)).max(0).max(0), [1, 0.5, 0.25], atol=1e-6)
    sph = spherical_coordinate(jnp.ones((1, 5, 27)), jnp.ones((1, 5, 1)))
    assert sph.shape == (1, 5, 27)


def _build_head_inputs(train=True):
    rng = np.random.RandomState(2)
    gt, proposals, scores, labels, points, pmask = make_scene(rng)
    traj, valid = generate_trajectory(proposals[:, 0], proposals)
    targets = sample_mppnet_targets(
        traj, valid, scores[:, 0], labels, gt,
        roi_per_image=R, reg_fg_thresh=0.55)
    batch = {
        "trajectory_rois": targets.trajectory_rois,
        "valid_length": targets.valid_length,
        "points": points,
        "points_mask": pmask,
    }
    return batch, targets


def test_target_sampling_fg_and_labels():
    _, t = _build_head_inputs()
    assert t.trajectory_rois.shape == (1, F, R, 9)
    # both true boxes are perfect proposals -> fg with cls label 1
    fg = np.asarray(t.reg_valid[0])
    assert fg[:2].all() and not fg[2:].any()
    np.testing.assert_allclose(np.asarray(t.cls_labels[0, :2]), 1.0)
    # canonical gt of a perfect roi is the roi in its own frame
    np.testing.assert_allclose(np.asarray(t.gt_of_rois_ct[0, 0, :3]), 0.0,
                               atol=1e-5)


def test_head_forward_and_loss_decreases():
    import optax

    batch, targets = _build_head_inputs()
    head = MPPNetHead(model_cfg=HEAD_CFG, num_class=1)
    variables = head.init(jax.random.PRNGKey(0), dict(batch), train=False)

    tdict = {
        "rois": targets.rois,
        "gt_of_rois_ct": targets.gt_of_rois_ct,
        "gt_of_rois_src": targets.gt_of_rois_src,
        "cls_labels": targets.cls_labels,
        "reg_valid": targets.reg_valid,
    }

    def loss_fn(params, state):
        out, mut = head.apply(
            {"params": params, **state}, dict(batch), train=True,
            mutable=["batch_stats"])
        total, parts = mppnet_loss(
            out["mppnet_preds"], tdict, HEAD_CFG["LOSS_CONFIG"])
        return total, (parts, mut)

    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    losses = []
    for i in range(30):
        (l, (parts, mut)), g = grad_fn(params, state)
        updates, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, updates)
        state = mut if mut else state
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]

    # eval path: decoded boxes present with right shapes
    out = head.apply(variables, dict(batch), train=False)
    assert out["batch_box_preds"].shape == (1, R, 7)
    assert out["batch_cls_preds"].shape == (1, R, 1)
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
