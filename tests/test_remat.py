"""REMAT on the BEV backbone: jax.checkpoint must not change the math —
loss and gradients equal the non-remat path (only peak activation memory
differs, which CPU tests can't observe)."""
import numpy as np

import jax
import jax.numpy as jnp

from com_tpu.models.detectors import build_network

from test_train_step import CLASS_NAMES, META, synthetic_batch, tiny_model_cfg


def _loss_and_grads(cfg):
    net = build_network(cfg, META)
    rng = np.random.RandomState(3)
    batch = synthetic_batch(rng)
    variables = net.init(jax.random.PRNGKey(0), dict(batch), train=False)

    def loss_fn(params):
        out, _ = net.apply(
            {**variables, "params": params}, dict(batch), train=True,
            mutable=["batch_stats"])
        s = jnp.zeros(())
        for x in jax.tree_util.tree_leaves(out):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                s = s + (x.astype(jnp.float32) ** 2).mean()
        return s

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    return float(loss), grads


def test_remat_backbone_matches_plain():
    plain = tiny_model_cfg(curriculum=False)
    remat = tiny_model_cfg(curriculum=False)
    remat["BACKBONE_2D"]["REMAT"] = True

    l1, g1 = _loss_and_grads(plain)
    l2, g2 = _loss_and_grads(remat)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    # same param tree (remat only adds a checkpoint boundary, not structure)
    f1 = jax.tree_util.tree_leaves_with_path(g1)
    f2 = jax.tree_util.tree_leaves_with_path(g2)
    assert [p for p, _ in f1] == [p for p, _ in f2]
    for (_, a), (_, b) in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
