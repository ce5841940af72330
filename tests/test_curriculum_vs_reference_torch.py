"""COMLoss golden parity against the REFERENCE's own torch implementation.

Loads pcdet/utils/loss_utils.py from /root/reference (torch-cpu is in the
image; numba and the pcdet-internal imports are stubbed), instantiates
FocalLossCenterCurriculum with a COM config, and runs its neg_loss on the
same inputs as our focal_loss_center_curriculum:

* per-object curriculum weights written into box_mask (B=2, C=3),
* the EMA'd avg_confidence,
* the final normalized focal loss at B=1, C=1 — the shape where the
  reference's mask[:, None] broadcast (its known shape bug, fixed on our
  side and documented in losses/centernet.py) is a no-op, so the scalar
  losses must agree to float tolerance.

Objects are placed with non-overlapping stamp squares: the reference stamps
sequentially with plain assignment, ours vectorized — overlap resolution
order is the one intended divergence.
"""
import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.losses.curriculum import (
    CurriculumState,
    focal_loss_center_curriculum,
)
from com_tpu.models.dense_heads.target_assign import CenterTargets

REF = Path("/root/reference/pcdet/utils/loss_utils.py")
REF_CN = Path("/root/reference/pcdet/models/model_utils/centernet_utils.py")


def _load_reference_loss():
    torch = pytest.importorskip("torch")  # noqa: F841

    def fake_numba():
        mod = types.ModuleType("numba")

        def jit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        mod.jit = jit
        mod.njit = jit
        mod.prange = range
        return mod

    stubs = {"numba": fake_numba()}
    for name in ["pcdet", "pcdet.utils", "pcdet.utils.box_utils",
                 "pcdet.models", "pcdet.models.model_utils"]:
        mod = types.ModuleType(name)
        mod.__path__ = []
        stubs[name] = mod
    stubs["pcdet.utils"].box_utils = stubs["pcdet.utils.box_utils"]

    saved = {k: sys.modules.get(k) for k in
             list(stubs) + ["pcdet.models.model_utils.centernet_utils",
                            "pcdet.utils.loss_utils"]}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.models.model_utils.centernet_utils", str(REF_CN))
        cn = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = cn
        spec.loader.exec_module(cn)
        stubs["pcdet.models.model_utils"].centernet_utils = cn

        spec = importlib.util.spec_from_file_location(
            "pcdet.utils.loss_utils", str(REF))
        lu = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = lu
        spec.loader.exec_module(lu)
        return lu
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


CFG = {"UCL": True, "THRESHOLD": 0.2, "ELONGATION": -10, "HEIGHT": 1,
       "FIX": True, "ALPHA": 0.001, "START": 0, "END": 30}


def _scene(rng, b, c, h, w, m):
    """Non-overlapping stamp squares on a (h, w) map."""
    # grid-place centers at least 11 apart; radius <= 4 -> squares disjoint
    coords = [(x, y) for y in range(5, h - 5, 12) for x in range(5, w - 5, 12)]
    rng.shuffle(coords)
    centers = np.zeros((b, m, 2), np.int64)
    radii = np.zeros((b, m), np.int64)
    cls = np.zeros((b, m), np.int64)
    mask = np.zeros((b, m), np.float32)
    heat = np.zeros((b, h, w, c), np.float32)
    for i in range(b):
        for j in range(min(m, len(coords))):
            if rng.rand() < 0.2:
                continue
            x, y = coords[j]
            centers[i, j] = (x, y)
            radii[i, j] = rng.randint(2, 5)
            cls[i, j] = rng.randint(0, c)
            mask[i, j] = 1.0
            heat[i, y, x, cls[i, j]] = 1.0
    pred = np.clip(rng.rand(b, h, w, c).astype(np.float32), 1e-3, 1 - 1e-3)
    return pred, heat, centers, radii, cls, mask


def _run_ours(pred, heat, centers, radii, cls, mask, c, epoch=5):
    b, h, w, _ = pred.shape
    t = CenterTargets(
        heatmaps=jnp.asarray(heat),
        target_boxes=jnp.zeros((b, mask.shape[1], 8)),
        inds=jnp.asarray(centers[..., 1] * w + centers[..., 0]),
        mask=jnp.asarray(mask),
        center_int=jnp.asarray(centers, jnp.int32),
        radius=jnp.asarray(radii, jnp.int32),
        class_local=jnp.asarray(cls, jnp.int32),
        group=jnp.asarray(np.ones_like(cls), jnp.int32),
    )
    return focal_loss_center_curriculum(
        jnp.asarray(pred), t, CurriculumState.create(), CFG, epoch, c, 16)


def _run_reference(lu, pred, heat, centers, radii, cls, mask, c, epoch=5):
    import torch

    b, h, w, _ = pred.shape
    m = mask.shape[1]
    loss_mod = lu.FocalLossCenterCurriculum({"LOSS_CURRICULUM": dict(CFG)})
    loss_mod.threshold = CFG["THRESHOLD"]
    # COM layout: [class, cx, cy, radius, true_flag] (>=5 cols required —
    # with 4 the reference's confidence_true variable is never bound)
    radius_map = np.zeros((b, m, 5), np.int64)
    radius_map[..., 0] = cls
    radius_map[..., 1] = centers[..., 0]
    radius_map[..., 2] = centers[..., 1]
    radius_map[..., 3] = radii * mask
    radius_map[..., 4] = mask
    pred_t = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)).copy())
    gt_t = torch.from_numpy(np.transpose(heat, (0, 3, 1, 2)).copy())
    box_mask = torch.ones((b, m))
    mask_t = torch.ones((b, c, h, w))
    loss, box_mask, avg_conf, _, _ = loss_mod.neg_loss(
        pred_t, gt_t, torch.from_numpy(radius_map), box_mask,
        mask=mask_t, epoch=epoch)
    return float(loss), box_mask.numpy(), float(avg_conf)


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_box_mask_weights_match_reference_torch():
    lu = _load_reference_loss()
    rng = np.random.RandomState(0)
    b, c, h, w, m = 2, 3, 48, 48, 8
    pred, heat, centers, radii, cls, mask = _scene(rng, b, c, h, w, m)
    _, _, aux = _run_ours(pred, heat, centers, radii, cls, mask, c)
    _, ref_box_mask, ref_avg = _run_reference(
        lu, pred, heat, centers, radii, cls, mask, c)
    ours_bm = np.asarray(aux.box_mask)
    np.testing.assert_allclose(ours_bm[mask > 0], ref_box_mask[mask > 0],
                               rtol=1e-5, atol=1e-5)
    # avg_confidence: the reference returns the raw batch average
    pos = heat == 1.0
    np.testing.assert_allclose(ref_avg, pred[pos].mean(), rtol=1e-5)


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_scalar_loss_matches_reference_torch_single_class():
    """B=1, C=1: the reference's mask[:, None] broadcast is shape-neutral, so
    the normalized focal losses must agree."""
    lu = _load_reference_loss()
    rng = np.random.RandomState(1)
    b, c, h, w, m = 1, 1, 48, 48, 6
    pred, heat, centers, radii, cls, mask = _scene(rng, b, c, h, w, m)
    loss, _, _ = _run_ours(pred, heat, centers, radii, cls, mask, c)
    ref_loss, _, _ = _run_reference(
        lu, pred, heat, centers, radii, cls, mask, c)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-4, atol=2e-4)
