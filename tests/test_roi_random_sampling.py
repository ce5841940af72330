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


def test_canonical_heading_flip_for_opposite_gt():
    """roi_head_template.py:125-130 parity: a GT rotated ~pi relative to its
    RoI gets flipped to a small heading target, not +-pi."""
    import jax.numpy as jnp
    from com_tpu.models.roi_heads.roi_targets import canonical_transform

    roi = jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.3]])
    gt_flipped = jnp.asarray([[0.1, 0, 0, 4, 2, 1.5, 0.3 + np.pi + 0.05]])
    reg = np.asarray(canonical_transform(gt_flipped, roi))
    assert abs(reg[0, 6]) < 0.1, reg[0, 6]  # flipped to ~0.05, not ~pi
    gt_same = jnp.asarray([[0.1, 0, 0, 4, 2, 1.5, 0.35]])
    reg2 = np.asarray(canonical_transform(gt_same, roi))
    np.testing.assert_allclose(reg2[0, 6], 0.05, atol=1e-5)


def test_bg_backfill_when_few_foregrounds():
    """Reference proposal_target_layer gives unused fg quota to backgrounds;
    a fixed split would train half-empty RoI batches on sparse scenes."""
    import jax
    import jax.numpy as jnp
    from com_tpu.models.roi_heads.roi_targets import assign_roi_targets

    rng = np.random.RandomState(0)
    p = 64
    rois = np.zeros((1, p, 7), np.float32)
    rois[0, :, 0] = np.arange(p) * 10.0  # spread out
    rois[0, :, 3:6] = [4, 2, 1.5]
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0, :7] = rois[0, 0, :7]  # one perfect match
    gt[0, 0, 7] = 1
    labels = np.ones((1, p), np.int32)
    # negative scores: the old -1 sentinel discarded all such backgrounds
    scores = -np.abs(rng.randn(1, p)).astype(np.float32)
    t = assign_roi_targets(
        jnp.asarray(rois), jnp.asarray(scores), jnp.asarray(labels),
        jnp.ones((1, p), bool), jnp.asarray(gt),
        roi_per_image=32, fg_ratio=0.5,
        rng=jax.random.PRNGKey(0))
    valid = np.asarray(t.roi_valid[0])
    fg = np.asarray(t.reg_valid[0])
    assert fg.sum() == 1
    assert valid.sum() == 32  # 1 fg + 31 bg, not 1 fg + 16 bg
    # deterministic fallback path too (no rng)
    t2 = assign_roi_targets(
        jnp.asarray(rois), jnp.asarray(scores), jnp.asarray(labels),
        jnp.ones((1, p), bool), jnp.asarray(gt),
        roi_per_image=32, fg_ratio=0.5, rng=None)
    assert np.asarray(t2.roi_valid[0]).sum() == 32
