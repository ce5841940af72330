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
