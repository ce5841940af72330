"""Checkpoint roundtrip: save -> resume-latest restores state + sampler conf,
prunes old checkpoints, survives a corrupted newest checkpoint."""
import shutil

import numpy as np
import jax
import jax.numpy as jnp
import optax

from com_tpu.losses.curriculum import CurriculumState
from com_tpu.train.state import TrainState
from com_tpu.utils.checkpoint import _ckpt_dirs, resume_latest, save_checkpoint
from com_tpu.utils.transfer import host_zeros_like


def make_state(seed=0):
    params = {"w": jnp.asarray(np.random.RandomState(seed).randn(4, 4), jnp.float32),
              "b": jnp.zeros((4,))}
    tx = optax.adam(1e-3)
    return TrainState.create({"params": params}, tx, num_head_groups=1,
                             conf_shape=(3, 96)), tx


def test_roundtrip_and_prune(tmp_path):
    state, tx = make_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          curriculum=(CurriculumState(
                              avg_confidence=jnp.asarray(0.25),
                              mean=jnp.asarray(0.5), std=jnp.asarray(0.1),
                              initialized=jnp.asarray(True)),))
    sampler_state = {"confidence_groups": np.arange(288, dtype=np.float32).reshape(3, 96)}
    for epoch in range(1, 5):
        save_checkpoint(jax.device_get(state), tmp_path, epoch, epoch * 100,
                        sampler_state=sampler_state, max_ckpt_save_num=2)
    # pruned to 2 newest
    assert [e for e, _ in _ckpt_dirs(tmp_path)] == [3, 4]

    payload = resume_latest(tmp_path, host_zeros_like(jax.device_get(state)))
    assert payload is not None
    assert int(payload["meta"]["epoch"]) == 4
    rs = payload["state"]
    # the restore must come back TYPED even though the payload carries the
    # extra "sampler" subtree — a {state, meta}-only template used to
    # structure-mismatch and silently degrade the payload to raw dicts,
    # which then crashed the resumed train step (state.params on a dict)
    assert isinstance(rs, TrainState), type(rs)
    np.testing.assert_allclose(np.asarray(rs.params["w"]),
                               np.asarray(state.params["w"]))
    assert abs(float(rs.curriculum[0].avg_confidence) - 0.25) < 1e-6
    np.testing.assert_allclose(payload["sampler"]["confidence_groups"],
                               sampler_state["confidence_groups"])


def test_resume_skips_corrupted(tmp_path):
    state, _ = make_state()
    save_checkpoint(jax.device_get(state), tmp_path, 1, 100)
    save_checkpoint(jax.device_get(state), tmp_path, 2, 200)
    # corrupt the newest
    newest = dict(_ckpt_dirs(tmp_path))[2]
    shutil.rmtree(newest)
    newest.mkdir()
    (newest / "garbage").write_text("not a checkpoint")
    payload = resume_latest(tmp_path, host_zeros_like(jax.device_get(state)))
    assert payload is not None and int(payload["meta"]["epoch"]) == 1


def test_latest_model_rolls_and_resumes(tmp_path):
    """In-epoch time-based latest_model (reference train_utils.py:198-206):
    rolling overwrite, outranks older epoch checkpoints on resume."""
    import numpy as np

    from com_tpu.utils.checkpoint import (
        resume_latest,
        save_checkpoint,
        save_latest,
    )

    state = {"w": np.arange(4.0)}
    save_checkpoint(state, tmp_path, epoch=1, it=10)
    save_latest({"w": np.arange(4.0) + 5}, tmp_path, epoch=1, it=37)
    got = resume_latest(tmp_path)
    assert got["meta"]["it"] == 37  # latest_model newer than epoch 1
    np.testing.assert_allclose(got["state"]["w"], np.arange(4.0) + 5)
    # an epoch save AFTER the latest outranks it
    save_checkpoint({"w": np.arange(4.0) + 9}, tmp_path, epoch=2, it=50)
    got = resume_latest(tmp_path)
    assert got["meta"]["it"] == 50


def test_load_params_only_skips_mismatches(tmp_path):
    """--pretrained_model semantics: matching tensors load, shape
    mismatches keep the fresh init (load_params_from_file:330-384)."""
    import numpy as np

    from com_tpu.utils.checkpoint import load_params_only, save_checkpoint

    src_state = {
        "params": {"a": np.ones((3, 3)), "b": {"w": np.full((2,), 7.0)}},
        "batch_stats": {"m": np.full((4,), 2.0)},
    }
    save_checkpoint(src_state, tmp_path, epoch=1, it=0)

    dst = {
        "params": {"a": np.zeros((3, 3)),           # match -> loaded
                   "b": {"w": np.zeros((5,))},       # mismatch -> kept
                   "c": np.zeros((2, 2))},           # absent -> kept
        "batch_stats": {"m": np.zeros((4,))},
    }
    out = load_params_only(tmp_path / "checkpoint_epoch_1", dst)
    np.testing.assert_allclose(out["params"]["a"], 1.0)
    np.testing.assert_allclose(out["params"]["b"]["w"], 0.0)
    np.testing.assert_allclose(out["params"]["c"], 0.0)
    np.testing.assert_allclose(out["batch_stats"]["m"], 2.0)
