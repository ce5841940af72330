"""Knob-level A/B of the round-5 sparse-engine changes at bench scale.

Times one stage-1 submanifold conv and one strided conv under each knob:
  COM_TPU_SPARSE_TAPINV   0 | 1   (probe 27 vs 14 taps + scatter invert)
  COM_TPU_SPARSE_STRIDED  inprobe | outprobe

Usage: python tools/perf/microbench_sparse_knobs.py [--iters 15]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from tools.perf.tpu_timeit import chain_time
import com_tpu.ops.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    from tools.perf.microbench_sparse import build_inputs
    feats, coords, grid_xyz, _ = build_inputs()
    b, v, cin = feats.shape
    grid = (grid_xyz[2] + 1, grid_xyz[1], grid_xyz[0])
    valid = coords[..., 0] >= 0
    feats = feats.astype(jnp.float32)
    os.environ["COM_TPU_SPARSE_LOOKUP"] = "dense"
    w = jnp.asarray(np.random.RandomState(0).randn(27, cin, 16), jnp.float32)

    def subm(f, c, m):
        return sp.submanifold_conv3d(f, c, m, w, grid)

    for tapinv in ("0", "1"):
        os.environ["COM_TPU_SPARSE_TAPINV"] = tapinv
        dt = chain_time(lambda f: jax.vmap(subm)(f, coords, valid).sum(),
                        (feats,), iters=args.iters)
        print(f"subm tapinv={tapinv}          {dt*1e3:8.2f} ms")

    def strided(f, c, m):
        out, *_ = sp.strided_conv3d(f, c, m, w, grid, v, (2, 2, 2),
                                    (3, 3, 3), pad=1)
        return out

    for mode in ("inprobe", "outprobe"):
        os.environ["COM_TPU_SPARSE_STRIDED"] = mode
        dt = chain_time(lambda f: jax.vmap(strided)(f, coords, valid).sum(),
                        (feats,), iters=args.iters)
        print(f"strided {mode:8s}       {dt*1e3:8.2f} ms")

    # rulebook pieces under tapinv
    for tapinv in ("0", "1"):
        os.environ["COM_TPU_SPARSE_TAPINV"] = tapinv

        def rb(f, c, m):
            return (sp.subm_rulebook(c, m, grid).astype(jnp.float32).sum()
                    + f.sum() * 0)

        dt = chain_time(lambda f: jax.vmap(rb)(f, coords, valid).sum(),
                        (feats,), iters=args.iters)
        print(f"rulebook tapinv={tapinv}      {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
