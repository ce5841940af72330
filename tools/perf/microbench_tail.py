"""Decompose the train step's ~28 ms loss/curriculum/optimizer tail on TPU.

The step breakdown attributes 36/59/44 ms to vfe/backbone2d/head fwd+bwd,
leaving ~28 ms for target assignment + focal/reg losses + curriculum stats
+ adam.  This times each tail component through the dedup-proof chain
harness (tpu_timeit) at bench scale so the next optimization lands on the
actual hot spot instead of a guess.

Components (each jitted standalone, perturbed-operand chain, ms/iter):
  assign    assign_centerpoint_targets (500-obj windowed scatter stamping)
  loss_fwd  compute_centerpoint_loss forward
  loss_bwd  value_and_grad of the loss wrt the 5 head prediction tensors
  optim     tx.update + param apply at real param/grad shapes

Usage (ambient TPU env; serialize with other tunnel users):
    python tools/perf/microbench_tail.py
Env: TAIL_ITERS=30
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

sys.path.insert(0, os.path.join(REPO, "tools", "perf"))
from tpu_timeit import chain_time  # noqa: E402

ITERS = int(os.environ.get("TAIL_ITERS", 30))
BATCH, NUM_POINTS, MAX_OBJS = 2, 163840, 500


def main():
    import __graft_entry__ as ge
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import (compute_centerpoint_loss, conf_shape_for,
                                    com_groups_for)
    from com_tpu.models.dense_heads.target_assign import (
        assign_centerpoint_targets)

    cfg, meta, net, batch = ge._build(
        batch_size=BATCH, num_points=NUM_POINTS, num_max_objs=MAX_OBJS)
    class_names = list(cfg.CLASS_NAMES)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=30000, steps_per_epoch=1000)
    state = TrainState.create_jit(
        variables, tx, num_head_groups=1,
        conf_shape=conf_shape_for(cfg.MODEL, class_names))
    grid = meta.grid_size

    # one real forward for authentically-shaped outputs (pred_dicts + gt
    # passthrough); train=True so the COM side-arrays are present
    fwd = jax.jit(lambda v, b: net.apply(
        v, b, train=True, mutable=["batch_stats"],
        rngs={"roi_sampling": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)})[0])
    t0 = time.perf_counter()
    out = fwd(variables, dict(batch))
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"# model fwd compiled+ran in {time.perf_counter() - t0:.0f}s",
          flush=True)

    head_cfg = cfg.MODEL["DENSE_HEAD"]
    ta = head_cfg["TARGET_ASSIGNER_CONFIG"]
    fmap_hw = (int(grid[1]), int(grid[0]))
    gt_boxes = out["gt_boxes"]
    npgt = out.get("num_points_in_gt", jnp.zeros(gt_boxes.shape[:2]))
    group = com_groups_for(out, gt_boxes, True, class_names)
    class_ids = tuple(range(1, len(class_names) + 1))

    # --- assign: stamping + window scatter ---
    def assign_fn(gtb):
        t = assign_centerpoint_targets(
            gtb, npgt, group, class_ids, fmap_hw[0], fmap_hw[1],
            meta.point_cloud_range, meta.voxel_size,
            int(ta.get("FEATURE_MAP_STRIDE", 1)),
            gaussian_overlap=float(ta.get("GAUSSIAN_OVERLAP", 0.1)),
            min_radius=int(ta.get("MIN_RADIUS", 2)),
            min_points=int(ta.get("MIN_POINTS", 0)),
            epoch_gate=jnp.asarray(0) <= 100)
        return t.heatmaps
    dt = chain_time(assign_fn, (gt_boxes,), iters=ITERS)
    print(f"assign_targets            {dt * 1e3:8.2f} ms", flush=True)

    # --- loss fwd / fwd+bwd wrt head predictions ---
    pred0 = dict(out["pred_dicts"][0])
    pred_names = sorted(k for k in pred0 if k != "hm")

    def loss_of(preds_list, hm_first):
        pd = dict(zip(pred_names, preds_list))
        pd["hm"] = hm_first
        o = dict(out)
        o["pred_dicts"] = [pd]
        loss, _, _, _ = compute_centerpoint_loss(
            o, cfg.MODEL, class_names, meta, state.curriculum, 0, fmap_hw)
        return loss

    others = [pred0[n] for n in pred_names]
    dt = chain_time(lambda hm, *rest: loss_of(rest, hm),
                    (pred0["hm"], *others), iters=ITERS)
    print(f"loss_fwd                  {dt * 1e3:8.2f} ms", flush=True)

    dt = chain_time(
        lambda hm, *rest: jax.grad(
            lambda h, r: loss_of(r, h), argnums=(0, 1))(hm, list(rest))[0],
        (pred0["hm"], *others), iters=ITERS)
    print(f"loss_fwd+bwd              {dt * 1e3:8.2f} ms", flush=True)

    # --- optimizer: tx.update + apply at real shapes (grads := params) ---
    flat, treedef = jax.tree_util.tree_flatten(state.params)

    def optim_fn(first, *rest):
        params = jax.tree_util.tree_unflatten(treedef, (first,) + rest)
        updates, _ = tx.update(params, state.opt_state, params)
        new = jax.tree.map(lambda p, u: p + u, params, updates)
        return jax.tree_util.tree_leaves(new)[0]
    dt = chain_time(optim_fn, tuple(flat), iters=ITERS)
    print(f"optimizer_update          {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
