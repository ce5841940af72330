"""Fused SeparateHead == separate branch stacks, exactly.

The fused compute path (one wide hidden conv + slice-BN + one block-masked
final conv, models/dense_heads/center_head.py) must be a pure reshuffle of
the same math: identical variable tree, identical outputs, identical grads,
identical BN running-stat updates.  Reference shape: the COM CenterHead
branches (curriculum_center_head.py:11-45)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.models.dense_heads.center_head import SeparateHead

pytestmark = pytest.mark.quick

SEP = {
    "center": {"out_channels": 2, "num_conv": 2},
    "center_z": {"out_channels": 1, "num_conv": 2},
    "dim": {"out_channels": 3, "num_conv": 2},
    "rot": {"out_channels": 2, "num_conv": 2},
    "hm": {"out_channels": 3, "num_conv": 2},
}


def _mk(fused, use_bias=True, dtype=None):
    return SeparateHead(SEP, dtype=dtype, use_bias=use_bias, fused=fused)


@pytest.mark.parametrize("use_bias", [True, False])
def test_same_tree_and_outputs(use_bias):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 24, 16))
    sep_m, fus_m = _mk(False, use_bias), _mk(True, use_bias)
    vs = sep_m.init(jax.random.PRNGKey(1), x, train=False)
    vf = fus_m.init(jax.random.PRNGKey(1), x, train=False)
    # identical variable trees (paths AND shapes)
    ts = jax.tree_util.tree_map(jnp.shape, vs)
    tf = jax.tree_util.tree_map(jnp.shape, vf)
    assert ts == tf
    # identical eval outputs with the SAME variables
    os = sep_m.apply(vs, x, train=False)
    of = fus_m.apply(vs, x, train=False)
    for k in SEP:
        np.testing.assert_allclose(np.asarray(os[k]), np.asarray(of[k]),
                                   atol=1e-5, rtol=1e-5)


def test_train_mode_grads_and_bn_stats_match():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    sep_m, fus_m = _mk(False), _mk(True)
    vs = sep_m.init(jax.random.PRNGKey(1), x, train=False)

    def loss(m):
        def f(params, stats):
            out, upd = m.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in out.values()), upd["batch_stats"]
        return f

    (ls, us), gs = jax.value_and_grad(loss(sep_m), has_aux=True)(
        vs["params"], vs["batch_stats"])
    (lf, uf), gf = jax.value_and_grad(loss(fus_m), has_aux=True)(
        vs["params"], vs["batch_stats"])
    assert abs(float(ls) - float(lf)) < 1e-2 * max(1.0, abs(float(ls)))
    for (ps, a), (pf, b) in zip(
            jax.tree_util.tree_flatten_with_path(gs)[0],
            jax.tree_util.tree_flatten_with_path(gf)[0]):
        assert ps == pf
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=str(ps))
    for (ps, a), (pf, b) in zip(
            jax.tree_util.tree_flatten_with_path(us)[0],
            jax.tree_util.tree_flatten_with_path(uf)[0]):
        assert ps == pf
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=str(ps))


def test_num_conv_one_branch_reads_input():
    """A num_conv=1 branch has no hidden conv: its final conv consumes the
    shared-conv output directly in both modes."""
    sep = {"hm": {"out_channels": 3, "num_conv": 1},
           "center": {"out_channels": 2, "num_conv": 2}}
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 12, 8))
    ms = SeparateHead(sep, use_bias=True, fused=False)
    mf = SeparateHead(sep, use_bias=True, fused=True)
    vs = ms.init(jax.random.PRNGKey(1), x, train=False)
    vf = mf.init(jax.random.PRNGKey(1), x, train=False)
    assert (jax.tree_util.tree_map(jnp.shape, vs)
            == jax.tree_util.tree_map(jnp.shape, vf))
    os = ms.apply(vs, x, train=False)
    of = mf.apply(vs, x, train=False)
    for k in sep:
        np.testing.assert_allclose(np.asarray(os[k]), np.asarray(of[k]),
                                   atol=1e-5, rtol=1e-5)
