"""Anchor-path COMLoss golden parity against the reference's own
CurriculumSigmoidFocalClassificationLoss (loss_utils.py:79-345, torch-cpu):
same logits/targets/groups -> same per-anchor weighted loss, same
curriculum_weight tensor, and matching post-update EMA means/stds.
"""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.losses.anchor_losses import (
    AnchorCurriculumState,
    curriculum_sigmoid_focal_loss,
)
from test_curriculum_vs_reference_torch import _load_reference_loss

REF = Path("/root/reference/pcdet/utils/loss_utils.py")

CFG = {"UCL": True, "ALPHA": 0.001, "ELONGATION": -10, "HEIGHT": 1,
       "OFFSET": 0, "INV": False, "NORM": False, "POSW": 1,
       "START": 0, "END": 30}


def _inputs(rng, b=2, a=256, c=3):
    logits = rng.randn(b, a, c).astype(np.float32)
    target = np.zeros((b, a, c), np.float32)
    groups = np.zeros((b, a, c), np.int64)
    for i in range(b):
        pos = rng.choice(a, 40, replace=False)
        cls = rng.randint(0, c, 40)
        target[i, pos, cls] = 1.0
        groups[i, pos, cls] = rng.randint(1, 96, 40)
    weights = rng.rand(b, a).astype(np.float32)
    return logits, target, groups, weights


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_anchor_curriculum_matches_reference_torch():
    import torch

    lu = _load_reference_loss()
    rng = np.random.RandomState(0)
    logits, target, groups, weights = _inputs(rng)
    epoch = 7

    ref = lu.CurriculumSigmoidFocalClassificationLoss(
        model_config={"LOSS_CURRICULUM": dict(CFG)})
    ref_loss, ref_cw = ref.forward(
        torch.from_numpy(logits), torch.from_numpy(target),
        torch.from_numpy(weights), torch.from_numpy(groups), epoch)

    state = AnchorCurriculumState.create(3)
    loss, cw, new_state, _ = curriculum_sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(weights),
        jnp.asarray(groups), state, CFG, epoch)

    np.testing.assert_allclose(np.asarray(cw), ref_cw.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(loss), ref_loss.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.means),
                               np.asarray([float(m) for m in ref.means]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.stds),
                               np.asarray([float(s) for s in ref.stds]),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_anchor_curriculum_sm_variant_matches_reference():
    """SM small-score masking (epoch >= SME -> weight 0.5 on low-score
    positives)."""
    import torch

    lu = _load_reference_loss()
    rng = np.random.RandomState(1)
    logits, target, groups, weights = _inputs(rng)
    cfg = dict(CFG, SM=True, SME=5, SMT=0.5)
    epoch = 9

    ref = lu.CurriculumSigmoidFocalClassificationLoss(
        model_config={"LOSS_CURRICULUM": dict(cfg)})
    ref_loss, ref_cw = ref.forward(
        torch.from_numpy(logits), torch.from_numpy(target),
        torch.from_numpy(weights), torch.from_numpy(groups), epoch)

    loss, cw, _, _ = curriculum_sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(weights),
        jnp.asarray(groups), AnchorCurriculumState.create(3), cfg, epoch)
    np.testing.assert_allclose(np.asarray(cw), ref_cw.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(loss), ref_loss.detach().numpy(),
                               rtol=1e-4, atol=1e-4)
