"""Two-stage eval decode: the RCNN-refined boxes (not the first-stage
proposals) are what post-processing reports (detector3d_template
post_processing role), and the canonical decode inverts the target
encoding exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from com_tpu.models.roi_heads.roi_targets import (
    canonical_transform,
    decode_rcnn_boxes,
)


def test_decode_inverts_canonical_transform():
    rng = np.random.RandomState(0)
    rois = np.concatenate([
        rng.uniform(-20, 20, (5, 3)),
        rng.uniform(1, 4, (5, 3)),
        rng.uniform(-np.pi, np.pi, (5, 1)),
    ], axis=1).astype(np.float32)
    gt = rois + rng.uniform(-0.5, 0.5, rois.shape).astype(np.float32)
    reg = canonical_transform(jnp.asarray(gt), jnp.asarray(rois))
    dec = decode_rcnn_boxes(jnp.asarray(rois), reg)
    # heading comes back modulo 2pi (limit_period in the encoding)
    np.testing.assert_allclose(np.asarray(dec[:, :6]), gt[:, :6],
                               rtol=1e-4, atol=1e-4)
    dyaw = np.asarray(dec[:, 6]) - gt[:, 6]
    np.testing.assert_allclose(np.abs(np.round(dyaw / (2 * np.pi)) * 2 * np.pi
                                      - dyaw), 0, atol=1e-4)


def test_pvrcnn_eval_uses_refined_boxes():
    from pathlib import Path

    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.train.eval import make_eval_step
    from com_tpu.utils.config import cfg_from_yaml_file

    repo = Path(__file__).resolve().parents[1]
    cfg = cfg_from_yaml_file(str(repo / "configs/waymo_models/pv_rcnn.yaml"))
    grid = (32, 32, 40)
    pc = [-3.2, -3.2, -2.0, 3.2, 3.2, 4.0]
    meta = DatasetMeta(cfg.CLASS_NAMES, pc, [0.2, 0.2, 0.15], grid, 5)
    mc = cfg.MODEL
    mc["BACKBONE_3D"]["VOXEL_CAPS"] = [2048, 2048, 1024, 512]
    mc["VFE"]["VOXELIZE_ON_DEVICE"] = {
        "MAX_POINTS_PER_VOXEL": 5, "MAX_NUMBER_OF_VOXELS": 2048}
    net = build_network(mc, meta)

    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(-3, 3, (1, 2048, 2)),
        rng.uniform(-1.5, 3.5, (1, 2048, 1)),
        rng.rand(1, 2048, 2),
    ], axis=2).astype(np.float32)
    batch = {"points": jnp.asarray(pts),
             "points_mask": jnp.ones((1, 2048), bool)}
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)
    step = make_eval_step(net, mc, list(cfg.CLASS_NAMES), meta)
    boxes, scores, labels, valid = jax.jit(step)(variables, batch)
    out = net.apply(variables, dict(batch), train=False)
    assert "rcnn_reg" in out  # two-stage path ran
    # the eval boxes are the decoded refinements, not the raw proposals
    refined = np.asarray(boxes)[np.asarray(valid)]
    rois = np.asarray(out["rois"][..., :7]).reshape(-1, 7)
    assert refined.shape[-1] == 7
    if refined.size:
        d = np.abs(refined[:, None, :] - rois[None, :, :]).sum(-1).min(1)
        assert (d > 1e-6).any() or np.abs(np.asarray(out["rcnn_reg"])).max() < 1e-6
