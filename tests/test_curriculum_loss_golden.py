"""COMLoss numeric parity vs a direct numpy port of the reference math
(loss_utils.py:1179-1309 neg_loss internals)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.losses.curriculum import (
    CurriculumState,
    focal_loss_center_curriculum,
    group_confidences,
)
from com_tpu.models.dense_heads.target_assign import CenterTargets


def build_targets(rng, b=2, m=12, h=32, w=32, c=2):
    centers = np.stack([rng.randint(0, w, (b, m)), rng.randint(0, h, (b, m))], -1)
    radii = rng.randint(2, 6, (b, m))
    cls = rng.randint(0, c, (b, m))
    group = rng.randint(1, 10, (b, m))
    mask = (rng.rand(b, m) > 0.3).astype(np.float32)
    heat = np.zeros((b, h, w, c), np.float32)
    for i in range(b):
        for j in range(m):
            if mask[i, j]:
                heat[i, centers[i, j, 1], centers[i, j, 0], cls[i, j]] = 1.0
    t = CenterTargets(
        heatmaps=jnp.asarray(heat),
        target_boxes=jnp.zeros((b, m, 8)),
        inds=jnp.asarray(centers[..., 1] * w + centers[..., 0]),
        mask=jnp.asarray(mask),
        center_int=jnp.asarray(centers, jnp.int32),
        radius=jnp.asarray(radii * mask.astype(int), jnp.int32),
        class_local=jnp.asarray(cls * mask.astype(int), jnp.int32),
        group=jnp.asarray(group * mask.astype(int), jnp.int32),
    )
    return t, heat, centers, radii, cls, group, mask


def test_weight_formula_and_mask_stamp():
    """Per-object weight h/(1+exp(e*(p-T)))+1-h/2 with FIX threshold, stamped
    as constant squares; box_mask carries the weights."""
    rng = np.random.RandomState(0)
    t, heat, centers, radii, cls, group, mask = build_targets(rng)
    b, h, w, c = heat.shape
    pred = np.clip(rng.rand(b, h, w, c).astype(np.float32), 1e-4, 1 - 1e-4)
    pred[heat == 1.0] = np.clip(pred[heat == 1.0], 0.05, 0.95)

    cfg = {"UCL": True, "THRESHOLD": 0.2, "ELONGATION": -10, "HEIGHT": 1,
           "FIX": True, "ALPHA": 0.001, "START": 0, "END": 30}
    state = CurriculumState.create()
    loss, new_state, aux = jax.jit(
        lambda p: focal_loss_center_curriculum(p, t, state, cfg, 5, c, 16)
    )(jnp.asarray(pred))

    # reference weight formula per object
    for i in range(b):
        for j in range(12):
            if not mask[i, j]:
                continue
            x, y = centers[i, j]
            p = pred[i, y, x, cls[i, j]]
            want = 1.0 / (1 + np.exp(-10 * (p - 0.2))) + 1 - 0.5
            got = float(np.asarray(aux.box_mask)[i, j])
            assert abs(got - want) < 1e-5, (i, j, got, want)

    # EMA update: alpha*batch_mean + (1-alpha)*0
    pos = heat == 1.0
    batch_mean = pred[pos].mean()
    assert abs(float(new_state.avg_confidence) - 0.001 * batch_mean) < 1e-7

    # group confidence sums/counts match direct accumulation
    sums = np.zeros((c, 16))
    cnts = np.zeros((c, 16))
    for i in range(b):
        for j in range(12):
            if mask[i, j] and group[i, j] >= 1:
                x, y = centers[i, j]
                sums[cls[i, j], group[i, j] - 1] += pred[i, y, x, cls[i, j]]
                cnts[cls[i, j], group[i, j] - 1] += 1
    np.testing.assert_allclose(np.asarray(aux.confidence_sum), sums, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux.confidence_cnt), cnts, atol=1e-6)


@pytest.mark.quick
def test_masked_focal_matches_reference_math():
    """With UCL off: loss == -(pos_loss + neg_loss)/num_pos, CornerNet form."""
    rng = np.random.RandomState(1)
    t, heat, *_ = build_targets(rng)
    b, h, w, c = heat.shape
    pred = np.clip(rng.rand(b, h, w, c).astype(np.float32), 1e-4, 1 - 1e-4)
    cfg = {"UCL": False, "THRESHOLD": 0.2, "FIX": True}
    loss, _, _ = focal_loss_center_curriculum(
        jnp.asarray(pred), t, CurriculumState.create(), cfg, 0, c, 16
    )
    pos = (heat == 1.0)
    neg = ~pos
    pos_loss = (np.log(pred) * (1 - pred) ** 2)[pos].sum()
    neg_loss = (np.log(1 - pred) * pred**2 * (1 - heat) ** 4)[neg].sum()
    want = -(pos_loss + neg_loss) / pos.sum()
    assert abs(float(loss) - want) < 1e-3


def test_epoch_window_gates_weighting():
    rng = np.random.RandomState(2)
    t, heat, centers, radii, cls, group, mask = build_targets(rng)
    b, h, w, c = heat.shape
    pred = jnp.asarray(np.clip(rng.rand(b, h, w, c).astype(np.float32), 1e-4, 1 - 1e-4))
    cfg = {"UCL": True, "THRESHOLD": 0.2, "ELONGATION": -10, "HEIGHT": 1,
           "FIX": True, "START": 0, "END": 30}
    _, _, aux_out = focal_loss_center_curriculum(
        pred, t, CurriculumState.create(), cfg, 31, c, 16  # epoch > END
    )
    np.testing.assert_allclose(np.asarray(aux_out.box_mask), np.asarray(t.mask))
