"""MPPNetE2E memory bank: rolling semantics + 3-frame streaming inference."""
import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.models.mppnet import (
    MemoryBank,
    MPPNetHeadE2E,
    init_bank,
    mppnet_e2e_stream_step,
    push_bank,
)
from test_mppnet import HEAD_CFG, make_scene, F, P, K


def test_bank_roll_semantics():
    b, p, d = 1, 4, 9
    mk = lambda v: jnp.full((b, p, d), float(v))
    geo = lambda v: jnp.full((b, p, 8, 16), float(v))
    bank = init_bank(mk(0), jnp.zeros((b, p)), jnp.zeros((b, p)), geo(0), 3)
    assert bank.rois.shape == (b, 3, p, d)
    bank = push_bank(bank, mk(1), jnp.ones((b, p)), jnp.ones((b, p)), geo(1))
    np.testing.assert_allclose(np.asarray(bank.rois[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(bank.rois[:, 1]), 0.0)
    bank = push_bank(bank, mk(2), jnp.ones((b, p)), jnp.ones((b, p)), geo(2))
    np.testing.assert_allclose(np.asarray(bank.rois[:, 0]), 2.0)
    np.testing.assert_allclose(np.asarray(bank.rois[:, 1]), 1.0)
    np.testing.assert_allclose(np.asarray(bank.rois[:, 2]), 0.0)


def test_mppnet_e2e_streaming():
    rng = np.random.RandomState(0)
    gt, proposals, scores, labels, points, pmask = make_scene(rng)
    head = MPPNetHeadE2E(model_cfg=HEAD_CFG, num_class=1)

    # current-frame-only points (timestamp 0)
    t = np.asarray(points[..., -1])
    cur_mask = jnp.asarray(np.abs(t) < 1e-3) & pmask

    def frame_batch(f):
        return {
            "rois": proposals[:, f],
            "roi_scores": scores[:, f],
            "roi_labels": labels,
            "points": points,
            "points_mask": cur_mask,
        }

    # init needs a bank in the batch for tracing
    b0 = frame_batch(0)
    zero_geo = jnp.zeros((1, P, 8, 32), jnp.float32)
    bank0 = init_bank(b0["rois"], labels.astype(jnp.float32),
                      scores[:, 0], zero_geo, F)
    variables = head.init(jax.random.PRNGKey(0),
                          dict(b0, memory_bank=bank0), train=False)

    bank = None
    outs = []
    for f in range(3):
        out, bank = mppnet_e2e_stream_step(
            head, variables, frame_batch(f), bank, is_first=(f == 0))
        outs.append(out)
        assert out["batch_box_preds"].shape == (1, P, 7)
        assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
        # current-frame features written into slot 0
        assert np.abs(np.asarray(bank.geo[:, 0])).sum() > 0

    # bank rolled: frame-2 step's slot 1 equals frame-1 step's slot 0
    # (pushed before the head ran, geo from the PREVIOUS step)
    assert bank.rois.shape == (1, F, P, 9)
    np.testing.assert_allclose(
        np.asarray(bank.rois[:, 0]), np.asarray(proposals[:, 2]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bank.rois[:, 1]), np.asarray(proposals[:, 1]), atol=1e-6)
