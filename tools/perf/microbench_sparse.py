"""Sparse conv engine A/B on TPU: v1 (27x lookup+gather+narrow-GEMM) vs
v2 (one batched lookup + one wide GEMM), x lookup structure (sorted binary
search vs dense cell->row table).

Times the full VoxelBackBone8x at the bench scale (80k-voxel cap, Waymo
1504x1504x41 grid, centerpoint_voxel_comloss ladder) — fwd and fwd+bwd —
through the dedup-proof chained harness (tools/perf/tpu_timeit.py).

Usage:  python tools/perf/microbench_sparse.py [--iters 10]
Engine/lookup selection happens at TRACE time (ops/sparse reads the env in
the conv bodies), so each config re-jits from scratch.

Queued by ROADMAP "Sparse-voxel engine: v1 measurement + v2 redesign";
target per VERDICT r4 #2 is >=10x the measured 0.574 scenes/sec v1 floor
(the full-step headline comes from `python bench.py --voxel`).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from tools.perf.tpu_timeit import chain_time, sanity_matmul


def build_inputs(batch=2, num_points=163840, max_vox=80000):
    import __graft_entry__ as ge
    from com_tpu.ops.voxelize import voxelize_points

    pc_range = [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0]
    vsize = [0.1, 0.1, 0.15]
    grid = (1504, 1504, 40)
    rng = np.random.RandomState(0)
    pts = ge._waymo_like_points(rng, batch, num_points, pc_range)
    vs, cs, ns = [], [], []
    for bi in range(batch):
        v, c, n = voxelize_points(pts[bi], pc_range, vsize, 5, max_vox,
                                  pad_to_max=True)
        vs.append(v), cs.append(c), ns.append(n)
    voxels = np.stack(vs)
    coords = np.stack(cs)
    nums = np.stack(ns)
    # MeanVFE: mean of the real points per voxel -> (B, V, 5)
    denom = np.maximum(nums, 1)[..., None].astype(np.float32)
    feats = voxels.sum(axis=2) / denom
    n_real = int((nums > 0).sum())
    return (jnp.asarray(feats), jnp.asarray(coords), grid,
            n_real // batch)


def build_backbone(grid):
    from com_tpu.models.backbone3d import VoxelBackBone8x

    model_cfg = {"CHANNELS": [16, 32, 64, 128], "OUT_CHANNELS": 128}
    return VoxelBackBone8x(
        model_cfg=model_cfg, input_channels=5, grid_size=grid,
        voxel_size=(0.1, 0.1, 0.15),
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--configs", default="v2:auto,v2:sorted,v2:dense,v1:-")
    args = ap.parse_args()

    ms_sane, tf_sane = sanity_matmul(2048, iters=10)
    print(f"# harness sanity: 2048^3 GEMM {ms_sane:.2f} ms {tf_sane:.0f} "
          f"TFLOP/s (v5e peak ~197)")

    feats, coords, grid, vps = build_inputs()
    print(f"# inputs: batch={feats.shape[0]} V_cap={feats.shape[1]} "
          f"real_voxels/scene={vps} grid={grid}")
    net = build_backbone(grid)

    def fwd(f, c, params):
        batch = {"pillar_features": f, "voxel_coords": c}
        out = net.apply(params, batch, train=False)
        return out["encoded_spconv_tensor"]

    def fwd_bwd(f, c, params):
        def loss(p, ff):
            return jnp.sum(fwd(ff, c, p).astype(jnp.float32) ** 2) * 1e-6
        l, g = jax.value_and_grad(loss)(params, f)
        # reduce EVERY grad leaf into the output: returning only one leaf
        # lets XLA dead-code-eliminate most of the backward pass (the
        # round-5 "fwd == fwd+bwd" readings measured exactly that)
        gsum = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(g))
        return l, gsum

    results = {}
    for spec in args.configs.split(","):
        engine, lookup = spec.split(":")
        os.environ["COM_TPU_SPARSE"] = engine
        if lookup != "-":
            os.environ["COM_TPU_SPARSE_LOOKUP"] = lookup
        else:
            os.environ.pop("COM_TPU_SPARSE_LOOKUP", None)
        params = jax.jit(net.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            {"pillar_features": feats, "voxel_coords": coords}, train=False)
        dt_f = chain_time(lambda f, c, p: fwd(f, c, p),
                          (feats, coords, params), iters=args.iters)
        dt_fb = chain_time(lambda f, c, p: fwd_bwd(f, c, p),
                           (feats, coords, params), iters=args.iters)
        results[spec] = {"fwd_ms": round(dt_f * 1e3, 2),
                         "fwd_bwd_ms": round(dt_fb * 1e3, 2)}
        print(f"{spec:10s} fwd {dt_f * 1e3:8.2f} ms   "
              f"fwd+bwd {dt_fb * 1e3:8.2f} ms")

    print(json.dumps({"backbone": "VoxelBackBone8x@80k", "results": results}))


if __name__ == "__main__":
    main()
