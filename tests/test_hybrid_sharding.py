"""Hybrid data x spatial x model mesh: the TPU-side scaling modes beyond the
reference's DDP-only design (pcdet/utils/common_utils.py:144-186 — SURVEY
§2.8 lists data-parallel as the reference's sole strategy).

* ``spatial`` shards the BEV canvas rows; XLA's SPMD partitioner inserts the
  conv halo exchanges, so the same train step runs with per-chip canvas
  slices.
* ``model`` shards conv kernels over output channels; GSPMD propagates and
  inserts contraction psums.

The oracle is the single-device step on the identical global batch: every
mesh layout must reproduce its loss.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from com_tpu.parallel import sharding as shmod
from com_tpu.parallel.mesh import make_mesh, shard_batch, shard_state

from test_train_step import _setup, synthetic_batch


@pytest.fixture(autouse=True)
def _clear_active_mesh():
    yield
    shmod.activate(None)


def test_make_mesh_hybrid_shape():
    mesh = make_mesh(spatial=2, model=2)
    assert mesh.axis_names == ("data", "spatial", "model")
    assert mesh.shape == {"data": 2, "spatial": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(spatial=3)


@pytest.mark.quick
def test_constrain_shards_canvas():
    mesh = make_mesh(spatial=4)  # (2, 4, 1)
    shmod.activate(mesh)

    def f(x):
        return shmod.constrain(x, *shmod.canvas_spec()) * 2.0

    x = jnp.ones((2, 8, 8, 4))
    out = jax.jit(f)(x)
    # the constraint inside the jit pins the layout; GSPMD propagates it to
    # the (unspecified) output sharding
    spec = out.sharding.spec
    assert spec[:2] == P("data", "spatial")[:2]


def test_constrain_noop_without_mesh():
    shmod.activate(None)
    x = jnp.ones((2, 8, 8, 4))
    out = jax.jit(lambda x: shmod.constrain(x, *shmod.canvas_spec()))(x)
    assert np.asarray(out).shape == (2, 8, 8, 4)


@pytest.mark.quick
def test_shard_state_model_axis():
    _, state, _ = _setup(curriculum=False)
    mesh = make_mesh(spatial=2, model=2)
    st = shard_state(state, mesh)
    kernels = [x for x in jax.tree_util.tree_leaves(st.params)
               if getattr(x, "ndim", 0) == 4]
    assert kernels, "no conv kernels found"
    sharded = [k for k in kernels
               if k.sharding.spec and k.sharding.spec[-1] == "model"]
    assert sharded, "no conv kernel got model-sharded"


def test_eval_model_mesh_matches_single_device():
    """DP eval (eval_model(mesh=...)) must produce the same detections as the
    unsharded loop; the trailing non-divisible batch falls back unsharded."""
    from test_train_step import META, CLASS_NAMES, tiny_model_cfg
    from com_tpu.models.detectors import build_network
    from com_tpu.train.eval import eval_model, make_eval_step

    cfg = tiny_model_cfg(curriculum=False)
    cfg["DENSE_HEAD"]["POST_PROCESSING"] = {
        "SCORE_THRESH": 0.0, "MAX_OBJ_PER_SAMPLE": 16,
        "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                       "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
    }
    net = build_network(cfg, META)
    rng = np.random.RandomState(0)
    batches = [synthetic_batch(np.random.RandomState(s), b=2)
               for s in (1, 2)]
    host_batches = [
        {k: np.asarray(v) for k, v in b.items()} for b in batches]
    variables = net.init(jax.random.PRNGKey(0), dict(batches[0]), train=False)
    step = make_eval_step(net, cfg, CLASS_NAMES, META)

    ref, _, _ = eval_model(step, variables, list(host_batches), CLASS_NAMES)
    mesh = make_mesh(jax.devices()[:2])
    got, _, _ = eval_model(step, variables, list(host_batches), CLASS_NAMES,
                           mesh=mesh)
    assert len(ref) == len(got) == 4
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a["boxes_lidar"], b["boxes_lidar"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a["score"], b["score"],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("spatial,model", [(4, 1), (2, 2)])
def test_hybrid_step_matches_single_device(spatial, model):
    step, state, _ = _setup(curriculum=True)
    rng = np.random.RandomState(1)
    big = synthetic_batch(rng, b=2)  # data axis is 2 in both layouts

    # oracle: single-device step on the same global batch
    _, ref = step(state, big, 0)
    ref_loss = float(ref["loss"])

    mesh = make_mesh(spatial=spatial, model=model)
    shmod.activate(mesh)
    with mesh:
        sb = shard_batch(big, mesh)
        st = shard_state(state, mesh)
        st, metrics = step(st, sb, 0)
        loss = float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, ref_loss, rtol=5e-4)
    # curriculum feedback reduces globally across every axis
    np.testing.assert_allclose(
        np.asarray(metrics["confidence_sum"]),
        np.asarray(ref["confidence_sum"]), rtol=5e-3, atol=1e-5)


def test_hybrid_step_compact_canvas_matches_dense(monkeypatch):
    """The compact canvas scatter (COM_TPU_COMPACT_CANVAS) must reproduce
    the dense-path loss under a hybrid data x spatial x model mesh — the
    run-compaction flattens the batch axis, so this guards against the
    mesh reintroducing gathers or shard-local run miscounts."""
    # oracle: dense path, single device (deterministic _setup)
    step, state, _ = _setup(curriculum=True)
    rng = np.random.RandomState(1)
    big = synthetic_batch(rng, b=2)
    _, ref = step(state, big, 0)
    ref_loss = float(ref["loss"])

    monkeypatch.setenv("COM_TPU_COMPACT_CANVAS", "4096")
    step2, state2, _ = _setup(curriculum=True)  # fresh trace reads the env
    mesh = make_mesh(spatial=2, model=2)
    shmod.activate(mesh)
    with mesh:
        sb = shard_batch(big, mesh)
        st = shard_state(state2, mesh)
        st, metrics = step2(st, sb, 0)
        loss = float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, ref_loss, rtol=5e-4)


def test_replicate_pins_assembled_weights():
    """sharding.replicate forces P() on the active mesh (constrain cannot:
    it skips an all-None spec).  This layout pin is load-bearing: XLA's
    SPMD partitioner miscompiles conv(spatial-sharded input,
    feature-sharded kernel) — the fused head's assembled kernels must
    reach the conv replicated (found via a 5.4x wrong hybrid-2x2 loss,
    2026-08-19, reproduced with a bare lax.conv on the CPU backend)."""
    mesh = make_mesh(spatial=2, model=2)
    shmod.activate(mesh)
    w = jnp.ones((3, 3, 8, 4))
    with mesh:
        ws = jax.device_put(
            w, NamedSharding(mesh, P(None, None, None, "model")))

        out = jax.jit(lambda v: shmod.replicate(v) * 2.0)(ws)
        assert out.sharding.is_fully_replicated
        # constrain() with an all-None spec is a no-op by design
        out2 = jax.jit(lambda v: shmod.constrain(v, None, None, None, None)
                       * 2.0)(ws)
        assert not out2.sharding.is_fully_replicated
