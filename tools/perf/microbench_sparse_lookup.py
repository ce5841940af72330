"""Sub-piece timing of the v2 dense-table lookup (the 74 ms dominator).

Splits one stage-1 batched lookup (B=2, V=80k, grid 41x1504x1504 = 92.7M
cells) into: table build (full + scatter), table probe (2.16M random
int32 gathers per item), query-key computation, and variants that could
replace them (half-tap + inverse scatter, smaller probe batches).

Usage: python tools/perf/microbench_sparse_lookup.py [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from tools.perf.microbench_sparse import build_inputs
    feats, coords, grid_xyz, _ = build_inputs()
    b, v, _ = feats.shape
    nz, ny, nx = grid_xyz[2] + 1, grid_xyz[1], grid_xyz[0]
    grid = (nz, ny, nx)
    ncells = nz * ny * nx
    valid = coords[..., 0] >= 0
    feats = feats.astype(jnp.float32)
    print(f"# B={b} V={v} grid={grid} ncells={ncells/1e6:.1f}M "
          f"table={(ncells + 1) * 4 / 1e6:.0f}MB/item")

    offs = jnp.asarray(sp._offsets(3), jnp.int32)
    imax = jnp.iinfo(jnp.int32).max

    def qkeys_of(c, m):
        nc = c[None, :, :] + offs[:, None, :]
        inb = ((nc[..., 0] >= 0) & (nc[..., 0] < nz)
               & (nc[..., 1] >= 0) & (nc[..., 1] < ny)
               & (nc[..., 2] >= 0) & (nc[..., 2] < nx) & m[None, :])
        return sp.flat_key(nc.reshape(-1, 3), grid, inb.reshape(-1))

    # precomputed query keys + table (untimed) for isolation
    qkeys = jax.jit(jax.vmap(qkeys_of))(coords, valid)

    def build_table(c, m):
        keys = sp.flat_key(c, grid, m)
        table = jnp.full((ncells + 1,), -1, jnp.int32)
        return table.at[jnp.where(m, keys, ncells)].set(
            jnp.arange(c.shape[0], dtype=jnp.int32), mode="drop")

    table = jax.jit(jax.vmap(build_table))(coords, valid)
    table.block_until_ready()

    # 1: query-key computation alone
    dt = chain_time(
        lambda f: jax.vmap(qkeys_of)(coords, valid).sum() + f.sum() * 0,
        (feats,), iters=args.iters)
    print(f"query_keys              {dt*1e3:8.2f} ms")

    # 2: table build alone
    dt = chain_time(
        lambda f: jax.vmap(build_table)(coords, valid).sum() + f.sum() * 0,
        (feats,), iters=args.iters)
    print(f"table_build             {dt*1e3:8.2f} ms")

    # 3: table probe alone (given table + qkeys — passed as ARGS, not
    # closure constants: a closed-over 371MB table gets baked into the
    # program and the remote_compile request dies with HTTP 413)
    def probe(t, q):
        safe = jnp.where(q == imax, ncells, q)
        r = t[safe]
        return jnp.where(q == imax, -1, r)

    dt = chain_time(
        lambda f, t, q: jax.vmap(probe)(t, q).sum() + f.sum() * 0,
        (feats, table, qkeys), iters=args.iters)
    print(f"table_probe_27taps      {dt*1e3:8.2f} ms")

    # 4: probe with only 14 taps (half + center; other 13 recovered by
    # scatter-inverting: nidx_(-d)[j]=i iff nidx_d[i]=j)
    q14 = qkeys.reshape(b, 27, v)[:, :14].reshape(b, -1)

    def probe14_invert(t, q, m):
        safe = jnp.where(q == imax, ncells, q)
        r = jnp.where(q == imax, -1, t[safe]).reshape(14, v)
        # invert the 13 non-center taps: rows i with r[k,i]=j>=0 imply
        # tap (26-k) at row j hits i
        inv = jnp.full((13, v), -1, jnp.int32)
        src = r[:13]
        rows = jnp.where(src >= 0, src, v)  # v = drop slot
        inv = inv.at[jnp.arange(13)[:, None],
                     rows].set(jnp.broadcast_to(
                         jnp.arange(v, dtype=jnp.int32), (13, v)),
                     mode="drop")
        return jnp.concatenate([r, inv[::-1]], axis=0)

    dt = chain_time(
        lambda f, t, q: jax.vmap(probe14_invert)(t, q, valid).sum()
        + f.sum() * 0,
        (feats, table, q14), iters=args.iters)
    print(f"probe14_plus_invert     {dt*1e3:8.2f} ms")

    # 5: full current lookup for reference
    def full_lookup(c, m):
        nc = c[None, :, :] + offs[:, None, :]
        inb = ((nc[..., 0] >= 0) & (nc[..., 0] < nz)
               & (nc[..., 1] >= 0) & (nc[..., 1] < ny)
               & (nc[..., 2] >= 0) & (nc[..., 2] < nx) & m[None, :])
        return sp._batched_lookup(c, m, grid, nc, inb)

    os.environ["COM_TPU_SPARSE_LOOKUP"] = "dense"
    dt = chain_time(
        lambda f: jax.vmap(full_lookup)(coords, valid).sum() + f.sum() * 0,
        (feats,), iters=args.iters)
    print(f"full_lookup_dense       {dt*1e3:8.2f} ms")

    # 6: int16 table probe (half the random-access bytes; rows < 32k only
    # valid when V <= 32767 — here V=80k, so this is a BANDWIDTH PROBE ONLY)
    t16 = table.astype(jnp.int16)
    dt = chain_time(
        lambda f, t, q: jax.vmap(
            lambda ti, qi: ti[jnp.where(qi == imax, ncells, qi)])(
            t, q).astype(jnp.int32).sum() + f.sum() * 0,
        (feats, t16, qkeys), iters=args.iters)
    print(f"table_probe_int16       {dt*1e3:8.2f} ms  (bandwidth probe)")


if __name__ == "__main__":
    main()
