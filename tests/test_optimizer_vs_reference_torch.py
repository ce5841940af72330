"""Optimizer golden parity vs the reference's own torch optimizers.

Executes the reference factory semantics directly (torch.optim.Adam / SGD,
and the fastai OptimWrapper step rule for adam_onecycle: true_wd=True,
bn_wd=True — reference tools/train_utils/optimization/__init__.py:12-32,
fastai_optim.py:136-151) on identical params/grads and checks our optax
chains (com_tpu/train/optim.py) produce the same parameter trajectories,
including the weight-decay coupling/decoupling and its application to
bias/norm params.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from com_tpu.train.optim import build_optimizer
from com_tpu.utils.config import CfgNode

torch = pytest.importorskip("torch")


def _params(rng):
    # names chosen so a bias/norm mask (if wrongly applied) would show up
    return {
        "conv": {"kernel": rng.randn(4, 3).astype(np.float32)},
        "bn": {"scale": rng.randn(3).astype(np.float32),
               "bias": rng.randn(3).astype(np.float32)},
    }


def _grads(rng, params):
    import jax

    return jax.tree_util.tree_map(
        lambda x: rng.randn(*x.shape).astype(np.float32), params)


def _run_ours(name, params, grad_seq, lr, wd, extra=None):
    import jax
    import optax

    cfg = CfgNode({"OPTIMIZER": name, "LR": lr, "WEIGHT_DECAY": wd,
                   "MOMENTUM": 0.9, "DECAY_STEP_LIST": [1000],
                   "LR_DECAY": 0.1, "LR_CLIP": 1e-7, "WARMUP_EPOCH": 0,
                   "LR_WARMUP": False, "GRAD_NORM_CLIP": 0.0,
                   **(extra or {})})
    p = jax.tree_util.tree_map(jnp.asarray, params)
    tx, _ = build_optimizer(p, cfg, total_steps=len(grad_seq),
                            steps_per_epoch=1)
    state = tx.init(p)
    for g in grad_seq:
        g = jax.tree_util.tree_map(jnp.asarray, g)
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
    return jax.tree_util.tree_map(np.asarray, p)


def _torch_tensors(params):
    flat = {
        "conv.kernel": params["conv"]["kernel"],
        "bn.scale": params["bn"]["scale"],
        "bn.bias": params["bn"]["bias"],
    }
    return {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
            for k, v in flat.items()}


def _assign_grads(tp, g):
    tp["conv.kernel"].grad = torch.from_numpy(g["conv"]["kernel"].copy())
    tp["bn.scale"].grad = torch.from_numpy(g["bn"]["scale"].copy())
    tp["bn.bias"].grad = torch.from_numpy(g["bn"]["bias"].copy())


def _check(tp, ours):
    np.testing.assert_allclose(ours["conv"]["kernel"],
                               tp["conv.kernel"].detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["bn"]["scale"],
                               tp["bn.scale"].detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours["bn"]["bias"],
                               tp["bn.bias"].detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adam_coupled_wd_matches_torch():
    rng = np.random.RandomState(0)
    params = _params(rng)
    grads = [_grads(rng, params) for _ in range(5)]
    lr, wd = 3e-3, 0.05

    tp = _torch_tensors(params)
    opt = torch.optim.Adam(tp.values(), lr=lr, weight_decay=wd,
                           betas=(0.9, 0.999), eps=1e-8)
    for g in grads:
        _assign_grads(tp, g)
        opt.step()

    ours = _run_ours("adam", params, grads, lr, wd)
    _check(tp, ours)


def test_sgd_coupled_wd_matches_torch():
    rng = np.random.RandomState(1)
    params = _params(rng)
    grads = [_grads(rng, params) for _ in range(5)]
    lr, wd = 1e-2, 0.05

    tp = _torch_tensors(params)
    opt = torch.optim.SGD(tp.values(), lr=lr, weight_decay=wd, momentum=0.9)
    for g in grads:
        _assign_grads(tp, g)
        opt.step()

    ours = _run_ours("sgd", params, grads, lr, wd)
    _check(tp, ours)


def test_adam_onecycle_true_wd_decays_every_param():
    """fastai true_wd + bn_wd=True: p *= (1 - wd*lr) on EVERY param (bias
    and norm included) before a weight_decay=0 Adam step.  One step with
    zero grads isolates the decay: Adam's update is exactly 0, so parity
    means every param shrank by the decoupled factor."""
    rng = np.random.RandomState(2)
    params = _params(rng)
    zero = [
        {"conv": {"kernel": np.zeros((4, 3), np.float32)},
         "bn": {"scale": np.zeros(3, np.float32),
                "bias": np.zeros(3, np.float32)}}
    ]
    lr, wd = 1e-2, 0.1
    ours = _run_ours("adam_onecycle", params, zero, lr, wd,
                     extra={"MOMS": [0.95, 0.85], "DIV_FACTOR": 10.0,
                            "PCT_START": 0.4})
    # one-cycle lr at step 0 = LR / DIV_FACTOR
    lr0 = lr / 10.0
    for a, b in ((ours["conv"]["kernel"], params["conv"]["kernel"]),
                 (ours["bn"]["scale"], params["bn"]["scale"]),
                 (ours["bn"]["bias"], params["bn"]["bias"])):
        np.testing.assert_allclose(a, b * (1 - wd * lr0), rtol=1e-5,
                                   atol=1e-7)


def test_adam_onecycle_bn_wd_false_masks_bias_norm():
    rng = np.random.RandomState(3)
    params = _params(rng)
    zero = [
        {"conv": {"kernel": np.zeros((4, 3), np.float32)},
         "bn": {"scale": np.zeros(3, np.float32),
                "bias": np.zeros(3, np.float32)}}
    ]
    lr, wd = 1e-2, 0.1
    ours = _run_ours("adam_onecycle", params, zero, lr, wd,
                     extra={"BN_WD": False, "MOMS": [0.95, 0.85],
                            "DIV_FACTOR": 10.0, "PCT_START": 0.4})
    lr0 = lr / 10.0
    np.testing.assert_allclose(ours["conv"]["kernel"],
                               params["conv"]["kernel"] * (1 - wd * lr0),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(ours["bn"]["scale"], params["bn"]["scale"])
    np.testing.assert_array_equal(ours["bn"]["bias"], params["bn"]["bias"])
