"""Per-piece timing of the v2 sparse conv engine at bench scale.

Decomposes one stage-1 submanifold conv (V=80k, grid 41x1504x1504, C 16->16,
batch 2 vmapped like the real backbone) into its pipeline pieces, plus the
strided-conv site derivation, to locate the ~258 ms the full backbone fwd
costs (fwd ~= fwd+bwd in microbench_sparse.py, so the time is in the index
machinery whose results bwd reuses, not in the GEMMs).

Usage: python tools/perf/microbench_sparse_pieces.py [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from tools.perf.microbench_sparse import build_inputs
    feats, coords, grid_xyz, vps = build_inputs()
    b, v, cin = feats.shape
    nz, ny, nx = grid_xyz[2] + 1, grid_xyz[1], grid_xyz[0]
    grid = (nz, ny, nx)
    valid = coords[..., 0] >= 0
    feats = feats.astype(jnp.float32)
    print(f"# B={b} V={v} Cin={cin} grid={grid} real/scene={vps}")

    offs = jnp.asarray(sp._offsets(3), jnp.int32)

    def neighbor_queries(c, m):
        nc = c[None, :, :] + offs[:, None, :]
        inb = ((nc[..., 0] >= 0) & (nc[..., 0] < nz)
               & (nc[..., 1] >= 0) & (nc[..., 1] < ny)
               & (nc[..., 2] >= 0) & (nc[..., 2] < nx) & m[None, :])
        return nc, inb

    # piece 1: batched lookup, dense table
    os.environ["COM_TPU_SPARSE_LOOKUP"] = "dense"

    def lk_dense(f, c, m):
        nc, inb = neighbor_queries(c, m)
        nidx = sp._batched_lookup(c, m, grid, nc, inb)
        return nidx.astype(jnp.float32).sum() + f.sum() * 0

    dt = chain_time(lambda f: jax.vmap(lk_dense)(f, coords, valid).sum(),
                    (feats,), iters=args.iters)
    print(f"lookup_dense            {dt*1e3:8.2f} ms")

    # piece 2: batched lookup, sorted keys
    os.environ["COM_TPU_SPARSE_LOOKUP"] = "sorted"
    dt = chain_time(lambda f: jax.vmap(lk_dense)(f, coords, valid).sum(),
                    (feats,), iters=args.iters)
    print(f"lookup_sorted           {dt*1e3:8.2f} ms")
    os.environ["COM_TPU_SPARSE_LOOKUP"] = "dense"

    # fixed nidx for the gather/GEMM pieces (computed once, NOT timed)
    def mk_nidx(c, m):
        nc, inb = neighbor_queries(c, m)
        return sp._batched_lookup(c, m, grid, nc, inb)

    nidx = jax.jit(jax.vmap(mk_nidx))(coords, valid)
    nidx.block_until_ready()

    w = jnp.asarray(np.random.RandomState(0).randn(27, cin, 16), jnp.float32)

    # piece 3: gather + wide GEMM given nidx
    def g_gemm(f, ni, m):
        return sp._im2col_matmul(f, m, ni, w, f.dtype)

    dt = chain_time(
        lambda f: jax.vmap(g_gemm)(f, nidx, valid).sum(),
        (feats,), iters=args.iters)
    print(f"gather+wide_gemm        {dt*1e3:8.2f} ms")

    # piece 3b: gather only
    def g_only(f, ni, m):
        v_, cin_ = f.shape
        fp = jnp.concatenate(
            [f * m[:, None].astype(f.dtype), jnp.zeros((1, cin_), f.dtype)], 0)
        return fp[jnp.where(ni >= 0, ni, v_)]

    dt = chain_time(lambda f: jax.vmap(g_only)(f, nidx, valid).sum(),
                    (feats,), iters=args.iters)
    print(f"gather_only             {dt*1e3:8.2f} ms")

    # piece 4: downsample_sites (strided-conv output set derivation)
    def ds(f, c, m):
        oc, ov, _ = sp.downsample_sites(c, m, (2, 2, 2), v, grid)
        return oc.astype(jnp.float32).sum() + ov.sum() + f.sum() * 0

    dt = chain_time(lambda f: jax.vmap(ds)(f, coords, valid).sum(),
                    (feats,), iters=args.iters)
    print(f"downsample_sites        {dt*1e3:8.2f} ms")

    # piece 5: full submanifold conv (lookup + gather + GEMM)
    def subm(f, c, m):
        return sp.submanifold_conv3d(f, c, m, w, grid)

    dt = chain_time(lambda f: jax.vmap(subm)(f, coords, valid).sum(),
                    (feats,), iters=args.iters)
    print(f"subm_conv_full          {dt*1e3:8.2f} ms")

    # piece 6: full strided conv
    def strided(f, c, m):
        out, oc, ov, _ = sp.strided_conv3d(f, c, m, w, grid, v, (2, 2, 2),
                                           (3, 3, 3), pad=1)
        return out

    dt = chain_time(lambda f: jax.vmap(strided)(f, coords, valid)[0].sum(),
                    (feats,), iters=args.iters)
    print(f"strided_conv_full       {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
