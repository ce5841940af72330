"""Random RoI fg/bg subsampling (reference proposal_target_layer
sample_rois_for_rcnn semantics) vs the deterministic fallback."""
import jax
import jax.numpy as jnp
import numpy as np

from com_tpu.models.roi_heads.roi_targets import assign_roi_targets


def _mk(rng, b=1, p=64, m=8):
    rois = np.zeros((b, p, 7), np.float32)
    rois[..., :2] = rng.uniform(-20, 20, (b, p, 2))
    rois[..., 3:6] = rng.uniform(1.5, 4, (b, p, 3))
    gt = np.zeros((b, m, 8), np.float32)
    gt[..., :2] = rois[:, :m, :2] + rng.uniform(-0.3, 0.3, (b, m, 2))
    gt[..., 3:6] = rois[:, :m, 3:6]
    gt[..., 7] = 1
    scores = rng.rand(b, p).astype(np.float32)
    labels = np.ones((b, p), np.int32)
    valid = np.ones((b, p), bool)
    return (jnp.asarray(rois), jnp.asarray(scores), jnp.asarray(labels),
            jnp.asarray(valid), jnp.asarray(gt))


def test_random_sampling_respects_ratio_and_varies_with_key():
    rng = np.random.RandomState(0)
    args = _mk(rng)
    t1 = assign_roi_targets(*args, roi_per_image=16, fg_ratio=0.5,
                            rng=jax.random.PRNGKey(1))
    t2 = assign_roi_targets(*args, roi_per_image=16, fg_ratio=0.5,
                            rng=jax.random.PRNGKey(2))
    t_det = assign_roi_targets(*args, roi_per_image=16, fg_ratio=0.5)
    # fg slots are the first fg_cap positions in all variants
    assert int(t1.reg_valid.sum()) == int(t_det.reg_valid.sum()) == 8
    # different keys pick different subsets (64 rois, 8 fg slots)
    assert not np.array_equal(np.asarray(t1.rois), np.asarray(t2.rois))
    # deterministic call is reproducible
    t_det2 = assign_roi_targets(*args, roi_per_image=16, fg_ratio=0.5)
    np.testing.assert_array_equal(np.asarray(t_det.rois), np.asarray(t_det2.rois))


def test_hard_bg_quota():
    rng = np.random.RandomState(1)
    rois, scores, labels, valid, gt = _mk(rng, p=64, m=4)
    t = assign_roi_targets(rois, scores, labels, valid, gt,
                           roi_per_image=32, fg_ratio=0.25,
                           hard_bg_ratio=0.5, rng=jax.random.PRNGKey(0))
    # bg slots: 24; hard quota 12 -> among selected bg, at most 12 with
    # iou >= lo unless the easy tier ran dry
    bg = np.asarray(t.gt_iou)[0, 8:]
    bg_valid = np.asarray(t.roi_valid)[0, 8:]
    hard_selected = int(((bg >= 0.1) & bg_valid).sum())
    assert hard_selected <= 12 + 4  # quota + tolerance for tier fill
