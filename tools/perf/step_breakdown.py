"""Per-stage timing breakdown of the flagship train step at bench scale.

Times, each as its own jit (device-synced by a host float read):
  - full train step (fwd + bwd + optimizer + curriculum stats)
  - full model fwd only
  - VFE fwd / fwd+bwd          (DynamicPillarVFE sorted-scan + canvas)
  - backbone2d fwd / fwd+bwd   (BaseBEVBackbone conv stack, Pallas or XLA)
  - head fwd / fwd+bwd         (CurriculumCenterHead convs + decode)

Stage fwd+bwd costs use a surrogate scalar (sum of stage outputs) so the
stage is timed in isolation; the decomposition is for *attribution*, not an
identity — stage sums can exceed the full step where XLA fuses across
stage boundaries.  Run on the TPU (ambient env) or CPU (env -u ... ).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("BD_BATCH", 2))
NUM_POINTS = int(os.environ.get("BD_POINTS", 163840))
ITERS = int(os.environ.get("BD_ITERS", 10))
GRID = int(os.environ.get("BD_GRID", 0))  # 0 = bench-scale 468x468


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:32s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import __graft_entry__ as ge
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    cfg, meta, net, batch = ge._build(
        batch_size=BATCH, num_points=NUM_POINTS, num_max_objs=500,
        grid=(GRID, GRID, 1) if GRID else None)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=30000, steps_per_epoch=1000)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    grid = meta.grid_size
    batch = jax.device_put(batch)

    step = jax.jit(make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES),
                                   meta, tx, (grid[1], grid[0])))
    t_step = timeit("full train step", lambda: step(state, batch, 0)[1])

    # full fwd: reduce every float leaf so nothing is DCE'd
    def full_fwd(v, b):
        out, _ = net.apply(v, dict(b), train=True, mutable=["batch_stats"])
        leaves = [x.astype(jnp.float32).sum() for x in
                  jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(leaves)
    full_fwd = jax.jit(full_fwd)
    timeit("model fwd only", lambda: full_fwd(variables, batch))

    # full model fwd+bwd at full-graph granularity (surrogate scalar over all
    # outputs, grad wrt params): subtracting this and the loss/optimizer
    # timings below from the full step attributes the residual without the
    # per-stage fusion mismatch
    def fwd_loss(params, b):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        out, _ = net.apply(v, dict(b), train=True, mutable=["batch_stats"])
        leaves = [x.astype(jnp.float32).sum() for x in
                  jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(leaves)
    full_bwd = jax.jit(jax.grad(fwd_loss))
    timeit("model fwd+bwd (param grads)",
           lambda: full_bwd(variables["params"], batch))

    # loss tail on frozen model outputs: target assignment + focal/reg loss +
    # curriculum statistics, fwd and fwd+grad-wrt-predictions
    from com_tpu.train.step import (compute_centerpoint_loss, is_anchor_head)
    if not is_anchor_head(cfg.MODEL) and "DENSE_HEAD" in cfg.MODEL:
        out_full, _ = jax.jit(lambda v, b: net.apply(
            v, dict(b), train=True, mutable=["batch_stats"]))(variables, batch)
        preds0 = out_full["pred_dicts"]
        fixed = {k: v for k, v in out_full.items()
                 if k in ("gt_boxes", "num_points_in_gt", "true_object",
                          "occupancy_ratio", "facade_type")}
        state_cur = state.curriculum

        def loss_only(pred_dicts):
            b = dict(fixed)
            b["pred_dicts"] = pred_dicts
            loss, _, _, _ = compute_centerpoint_loss(
                b, cfg.MODEL, list(cfg.CLASS_NAMES), meta, state_cur, 0,
                (grid[1], grid[0]))
            return loss
        lf = jax.jit(loss_only)
        lg = jax.jit(jax.grad(loss_only))
        timeit("loss+assign fwd", lambda: lf(preds0))
        timeit("loss+assign fwd+bwd", lambda: lg(preds0))

    # optimizer alone: tx.update + param add on a frozen grads pytree
    grads0 = full_bwd(variables["params"], batch)

    def opt_only(params, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), new_opt
    of = jax.jit(opt_only)
    timeit("optimizer (clip+adam+apply)",
           lambda: of(state.params, state.opt_state, grads0)[0])

    # --- stage timings: each stage module applied standalone against its
    # sub-tree of the full variables (flax auto-names nested modules
    # "<ClassName>_<i>", so the sub-tree keys line up with the standalone
    # root scope) ---

    # produce stage inputs by running the model fwd once
    out, _ = jax.jit(lambda v, b: net.apply(
        v, dict(b), train=True, mutable=["batch_stats"]))(variables, batch)
    sf = out.get("spatial_features")
    sf2 = out.get("spatial_features_2d")

    def _reduce(out):
        leaves = [x.astype(jnp.float32).sum() for x in
                  jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")
                  and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(leaves)

    def _subvars(mod):
        """Slice each variable collection down to this submodule's subtree."""
        key = next((k for k in variables["params"]
                    if k.startswith(type(mod).__name__ + "_")), None)
        if key is None:
            raise KeyError(f"no param subtree for {type(mod).__name__}")
        return {col: tree[key] for col, tree in variables.items()
                if key in tree}

    # build each stage module standalone: the raw (unwrapped) builder dodges
    # flax's auto-parenting, so the module has no parent and can be applied
    # as its own root against the matching variables subtree
    def _build(name, *a):
        return getattr(type(net), name).__wrapped__(net, *a)

    stages = [("vfe", _build("_build_vfe"), dict(batch))]
    if sf is not None:
        stages.append(("backbone2d",
                       _build("_build_backbone2d", sf.shape[-1]),
                       {"spatial_features": sf}))
    if sf2 is not None:
        stages.append(("dense_head", _build("_build_dense_head"),
                       {"spatial_features_2d": sf2,
                        "gt_boxes": batch["gt_boxes"]}))

    for name, mod, inp in stages:
        if mod is None:
            continue
        try:
            sv = _subvars(mod)

            def stage_fwd(params, inp, mod=mod, sv=sv):
                v = dict(sv, params=params)
                out = mod.apply(v, dict(inp), train=True,
                                mutable=["batch_stats"])[0]
                return _reduce(out)

            f = jax.jit(stage_fwd)
            g = jax.jit(jax.grad(stage_fwd))
            p = sv["params"]
            timeit(f"{name} fwd", lambda f=f, p=p, inp=inp: f(p, inp))
            timeit(f"{name} fwd+bwd", lambda g=g, p=p, inp=inp: g(p, inp))
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)

    print(f"# step_only scenes/sec = {BATCH / (t_step / 1e3):.2f}", flush=True)


if __name__ == "__main__":
    main()
