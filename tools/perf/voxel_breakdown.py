"""Attribution for the sparse-voxel train step (bench.py --voxel scale).

The full step measured 804 ms (2.487 scenes/sec at batch 2) while the
VoxelBackBone8x alone measures 258 ms fwd+bwd — this script locates the
other ~550 ms.  Times, each as its own jit through the chained harness:

  full_step       train step (fwd+bwd+optimizer+curriculum)
  loss_fwd        loss scalar only
  loss_fwd_bwd    loss + grads
  model_fwd       net.apply train=True

Usage: python tools/perf/voxel_breakdown.py [--iters 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from tools.perf.tpu_timeit import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import __graft_entry__ as ge
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.ops.voxelize import voxelize_points
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step
    from com_tpu.utils.config import cfg_from_yaml_file

    BATCH, NUM_POINTS = 2, 163840
    cfg = cfg_from_yaml_file(os.path.join(
        REPO, "configs/waymo_models/com/centerpoint_voxel_comloss.yaml"))
    pc_range = [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0]
    vsize = [0.1, 0.1, 0.15]
    grid = (1504, 1504, 40)
    meta = DatasetMeta(cfg.CLASS_NAMES, pc_range, vsize, grid, 5)
    net = build_network(cfg.MODEL, meta)

    rng = np.random.RandomState(0)
    pts = ge._waymo_like_points(rng, BATCH, NUM_POINTS, pc_range)
    max_vox = 80000
    vs, cs, ns = [], [], []
    for bi in range(BATCH):
        v, c, n = voxelize_points(pts[bi], pc_range, vsize, 5, max_vox,
                                  pad_to_max=True)
        vs.append(v), cs.append(c), ns.append(n)
    m = 500
    gt = np.zeros((BATCH, m, 8), np.float32)
    k = 24
    gt[:, :k, 0:2] = rng.uniform(pc_range[0] * 0.8, pc_range[3] * 0.8,
                                 (BATCH, k, 2))
    gt[:, :k, 2] = rng.uniform(-0.5, 1.0, (BATCH, k))
    gt[:, :k, 3:6] = rng.uniform(1.5, 5.0, (BATCH, k, 3))
    gt[:, :k, 6] = rng.uniform(-np.pi, np.pi, (BATCH, k))
    gt[:, :k, 7] = rng.randint(1, 4, (BATCH, k))
    batch = {
        "voxels": np.stack(vs), "voxel_coords": np.stack(cs),
        "voxel_num_points": np.stack(ns), "gt_boxes": gt,
        "num_points_in_gt": (gt[..., 7] > 0).astype(np.float32) * 10,
        "true_object": (gt[..., 7] > 0).astype(np.float32),
        "occupancy_ratio": rng.rand(BATCH, m).astype(np.float32),
        "facade_type": rng.randint(0, 4, (BATCH, m)).astype(np.float32),
    }
    batch = jax.device_put(batch)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=30000, steps_per_epoch=1000)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step_fn = make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta,
                              tx, (grid[1] // 8, grid[0] // 8))

    # full step, timed open-loop like bench.py (state donation makes the
    # chained harness awkward here; dedup is broken by the state update)
    step = jax.jit(step_fn, donate_argnums=(0,))
    for _ in range(2):
        state, metrics = step(state, batch, 0)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters * 2):
        state, metrics = step(state, batch, 0)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / (args.iters * 2)
    print(f"full_step         {dt*1e3:8.2f} ms")
    params = state.params

    # model fwd (train mode, mutable batch stats discarded)
    def model_fwd(pf, p):
        b2 = dict(batch)
        b2["voxels"] = pf
        out, _ = net.apply({"params": p, "batch_stats": state.batch_stats},
                           b2, train=True, mutable=["batch_stats"])
        leaves = [v for v in jax.tree_util.tree_leaves(out)
                  if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)]
        return sum(l.astype(jnp.float32).sum() for l in leaves)

    pf = jnp.asarray(batch["voxels"])
    try:
        dt = chain_time(model_fwd, (pf, params), iters=args.iters)
        print(f"model_fwd         {dt*1e3:8.2f} ms")
    except Exception as e:
        print(f"model_fwd failed: {type(e).__name__}: {e}")

    # loss fwd / fwd+bwd: model fwd + centerpoint loss, mirroring the
    # step's loss_fn closure (train/step.py:401-427)
    from com_tpu.train.step import compute_centerpoint_loss

    def loss_fwd(pf2, p):
        b2 = dict(batch)
        b2["voxels"] = pf2
        out, _ = net.apply(
            {"params": p, "batch_stats": state.batch_stats}, b2,
            train=True, mutable=["batch_stats"])
        loss, _, _, _ = compute_centerpoint_loss(
            out, cfg.MODEL, list(cfg.CLASS_NAMES), meta, state.curriculum,
            0, (grid[1] // 8, grid[0] // 8))
        return loss

    dt = chain_time(loss_fwd, (pf, params), iters=args.iters)
    print(f"loss_fwd          {dt*1e3:8.2f} ms")

    def loss_bwd(pf2, p):
        l, g = jax.value_and_grad(
            lambda pp: loss_fwd(pf2, pp))(p)
        # reduce every grad leaf: returning one leaf lets XLA DCE most of
        # the backward pass (first round-5 run measured fwd == fwd+bwd)
        gsum = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(g))
        return l, gsum

    dt = chain_time(loss_bwd, (pf, params), iters=args.iters)
    print(f"loss_fwd_bwd      {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
