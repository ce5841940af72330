"""Sparse 3D convolution engine — gather/matmul/scatter with sorted rulebooks.

TPU-native replacement for the external spconv package (SubMConv3d /
SparseConv3d used by pcdet/models/backbones_3d/spconv_backbone.py).  Design
(per the BASELINE.json north star):

* Active voxels live in fixed-size (V_cap, C) feature arrays + (V_cap, 3)
  zyx coords + valid mask — static shapes everywhere.
* Neighbor lookup = binary search over the *sorted* flat coordinate keys
  (jnp.searchsorted, vectorized) instead of a hash table: O(27 V log V)
  VPU work, no host round-trips, fully jittable.
* The conv itself is 27 gathers + 27 (V, Cin) @ (Cin, Cout) matmuls
  accumulated — the FLOPs land on the MXU as dense GEMMs.
* Strided (downsampling) conv derives its output voxel set with a
  sort-unique over downsampled keys, padded to a fixed output cap.

The submanifold convolution computes outputs only at input sites (like
SubMConv3d); the strided convolution computes outputs at the unique
downsampled sites reachable from inputs (like SparseConv3d with k=3, s=2,
p=1).
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

# Engine selection (see submanifold_conv3d/strided_conv3d/inverse_conv3d):
#   COM_TPU_SPARSE=v2 (default) — ONE batched neighbor lookup for all K^3
#     taps + ONE row gather + ONE wide (V, K3*Cin) @ (K3*Cin, Cout) GEMM.
#   COM_TPU_SPARSE=v1 — the original 27x (lookup + gather + narrow GEMM)
#     loop, kept as the correctness oracle (tests run both).
# Lookup mode inside v2:
#   COM_TPU_SPARSE_LOOKUP=auto (default) — O(1) dense index-grid when the
#     grid has <= COM_TPU_SPARSE_DENSE_CAP cells (int32 table, built with
#     one V-row scatter), else sorted-key binary search.
#   =dense / =sorted force either path.


def _engine():
    return os.environ.get("COM_TPU_SPARSE", "v2").lower()


def _dense_cell_cap():
    return int(os.environ.get("COM_TPU_SPARSE_DENSE_CAP", 100_000_000))


def _use_dense_lookup(grid_zyx):
    mode = os.environ.get("COM_TPU_SPARSE_LOOKUP", "auto").lower()
    if mode == "dense":
        return True
    if mode == "sorted":
        return False
    nz, ny, nx = (int(g) for g in grid_zyx)
    return nz * ny * nx <= _dense_cell_cap()


def flat_key(coords, grid_zyx, valid):
    """(V, 3) zyx int coords -> unique int32 key; invalid -> INT32_MAX."""
    nz, ny, nx = (int(g) for g in grid_zyx)
    key = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    return jnp.where(valid, key, jnp.iinfo(jnp.int32).max)


def _offsets(kernel=3):
    r = kernel // 2
    o = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    return o  # (K^3, 3) zyx


def build_hash(coords, valid, grid_zyx):
    """Sorted-key 'hash': returns (sorted_keys (V,), argsort order (V,))."""
    keys = flat_key(coords, grid_zyx, valid)
    order = jnp.argsort(keys)
    return keys[order], order


def lookup(sorted_keys, order, query_keys):
    """Indices into the ORIGINAL array for each query key; -1 if absent.

    Invalid queries carry the INT32_MAX sentinel, which must never "match"
    the INT32_MAX rows of invalid table entries."""
    pos = jnp.searchsorted(sorted_keys, query_keys)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[pos] == query_keys) & (
        query_keys != jnp.iinfo(jnp.int32).max
    )
    idx = order[pos]
    return jnp.where(hit, idx, -1)


def _batched_lookup(coords, valid, grid_zyx, qcoords, qok):
    """Neighbor row indices for a whole (K3, V, 3) query block at once.

    Returns (K3, V) int32 indices into the original row array, -1 when the
    queried cell is unoccupied/out-of-bounds.  Two interchangeable lookup
    structures (same result, measured on TPU via tools/perf/
    microbench_sparse.py): a sorted-key binary search (O(K3*V*logV) VPU
    work, no big buffers) or a dense cell->row int32 table (O(1) per query,
    one V-row scatter + (nz*ny*nx,) buffer)."""
    k3, v = qok.shape
    nz, ny, nx = (int(g) for g in grid_zyx)
    qkeys = flat_key(qcoords.reshape(-1, 3), grid_zyx, qok.reshape(-1))
    if _use_dense_lookup(grid_zyx):
        ncells = nz * ny * nx
        keys = flat_key(coords, grid_zyx, valid)
        table = jnp.full((ncells + 1,), -1, jnp.int32)
        table = table.at[jnp.where(valid, keys, ncells)].set(
            jnp.arange(coords.shape[0], dtype=jnp.int32), mode="drop")
        # invalid queries carry INT32_MAX -> route to the sentinel slot
        safe_q = jnp.where(qkeys == jnp.iinfo(jnp.int32).max, ncells, qkeys)
        nidx = table[safe_q]
        # the sentinel slot may have been overwritten only by invalid rows
        # (they also map to ncells) which are themselves -1-routed queries
        nidx = jnp.where(qkeys == jnp.iinfo(jnp.int32).max, -1, nidx)
    else:
        sorted_keys, order = build_hash(coords, valid, grid_zyx)
        nidx = lookup(sorted_keys, order, qkeys)
    return nidx.reshape(k3, v)


def _im2col_matmul(features, valid, nidx, weights, out_dtype):
    """(K3, V) neighbor rows -> one wide GEMM.

    Gathers all taps in one shot to (V, K3*Cin) and multiplies by the
    (K3*Cin, Cout) reshaped kernel — K3x fewer, K3x wider MXU calls than
    the per-tap loop, and one gather instead of K3.  The gather indexes
    with the TRANSPOSED (Q, K3) row table so the patches land directly in
    (Q, K3, Cin) layout — no (K3, Q, Cin) -> (Q, K3, Cin) activation
    transpose in the graph."""
    v, cin = features.shape
    k3, q = nidx.shape  # q = query-site count (= v for subm, out_cap strided)
    cout = weights.shape[-1]
    feats_pad = jnp.concatenate(
        [features * valid[:, None].astype(features.dtype),
         jnp.zeros((1, cin), features.dtype)], axis=0)
    if os.environ.get("COM_TPU_SPARSE_GATHER", "qk3") == "qk3":
        rows = jnp.where(nidx >= 0, nidx, v).T  # (Q, K3)
        patches = feats_pad[rows].reshape(q, k3 * cin)
    else:  # k3q: gather in (K3, Q, Cin) then transpose
        gathered = feats_pad[jnp.where(nidx >= 0, nidx, v)]
        patches = gathered.transpose(1, 0, 2).reshape(q, k3 * cin)
    return jnp.dot(patches, weights.reshape(k3 * cin, cout),
                   preferred_element_type=out_dtype)


def subm_rulebook(coords, valid, grid_zyx, kernel: int = 3):
    """(K3, V) neighbor-row indices for a submanifold conv at these sites.

    The expensive half of a v2 subm conv (the dense-table probe measured
    67 ms of the 74 ms stage-1 lookup; tools/perf/microbench_sparse_lookup
    .py).  Two cost cuts vs the naive 27-tap probe:

    * **Tap inversion** (COM_TPU_SPARSE_TAPINV=1, default): submanifold
      queries and sites are the same set, so the neighbor relation is
      antisymmetric — nidx[-d][j] = i  iff  nidx[d][i] = j (both sites
      valid + in-grid by construction).  Probe only the first
      ceil(K3/2) taps (center included) and recover the mirror taps with
      (K3//2) cheap 1D scatters: ~2x fewer random table reads.
    * Callers that run several subm convs over the SAME coordinate set
      (every backbone stage body) compute this once and pass it to each
      conv — XLA's CSE is not relied on across vmap/module boundaries.
    """
    nz, ny, nx = (int(g) for g in grid_zyx)
    offs_np = _offsets(kernel)
    k3 = offs_np.shape[0]
    v = coords.shape[0]
    tapinv = os.environ.get("COM_TPU_SPARSE_TAPINV", "1") != "0"
    h = k3 // 2 + 1 if tapinv else k3  # probed taps (center = row k3//2)
    offs = jnp.asarray(offs_np[:h], jnp.int32)
    nc = coords[None, :, :] + offs[:, None, :]  # (h, V, 3)
    inb = (
        (nc[..., 0] >= 0) & (nc[..., 0] < nz)
        & (nc[..., 1] >= 0) & (nc[..., 1] < ny)
        & (nc[..., 2] >= 0) & (nc[..., 2] < nx)
        & valid[None, :]
    )
    nidx = _batched_lookup(coords, valid, grid_zyx, nc, inb)  # (h, V)
    if not tapinv:
        return nidx
    # mirror taps k in [h, K3): offset[k] = -offset[K3-1-k], so
    # nidx[k][j] = i  iff  nidx[K3-1-k][i] = j — a scatter inversion.
    # Keys are unique per valid site, so writes never collide; rows with
    # no preimage keep -1; invalid probes (-1) route to the drop slot v.
    src = nidx[: h - 1]  # taps 0 .. K3//2-1
    rows = jnp.where(src >= 0, src, v)
    inv = jnp.full((h - 1, v + 1), -1, jnp.int32)
    inv = inv.at[jnp.arange(h - 1)[:, None], rows].set(
        jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (h - 1, v)))
    # row j of inv[t] answers tap K3-1-t; assemble rows h..K3-1 in order
    return jnp.concatenate([nidx, inv[::-1, :v]], axis=0)


def submanifold_conv3d(
    features,  # (V, Cin)
    coords,  # (V, 3) zyx
    valid,  # (V,) bool
    weights,  # (K^3, Cin, Cout)
    grid_zyx,  # static (nz, ny, nx)
    kernel: int = 3,
    nidx=None,  # optional precomputed subm_rulebook (v2 engine only)
):
    """SubMConv3d: output at input sites only (spconv SubMConv3d semantics)."""
    if _engine() != "v1":
        return _submanifold_conv3d_v2(features, coords, valid, weights,
                                      grid_zyx, kernel, nidx=nidx)
    v = features.shape[0]
    cout = weights.shape[-1]
    sorted_keys, order = build_hash(coords, valid, grid_zyx)
    offs = _offsets(kernel)
    nz, ny, nx = (int(g) for g in grid_zyx)

    out = jnp.zeros((v, cout), features.dtype)
    feats_pad = jnp.concatenate(
        [features * valid[:, None].astype(features.dtype),
         jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )
    for k, off in enumerate(offs):
        ncoords = coords + jnp.asarray(off, coords.dtype)
        inb = (
            (ncoords[:, 0] >= 0) & (ncoords[:, 0] < nz)
            & (ncoords[:, 1] >= 0) & (ncoords[:, 1] < ny)
            & (ncoords[:, 2] >= 0) & (ncoords[:, 2] < nx)
            & valid
        )
        qkeys = flat_key(ncoords, grid_zyx, inb)
        nidx = lookup(sorted_keys, order, qkeys)  # -1 when missing
        gathered = feats_pad[jnp.where(nidx >= 0, nidx, v)]
        out = out + jnp.dot(gathered, weights[k], preferred_element_type=out.dtype)
    return out * valid[:, None].astype(out.dtype)


def _subm_patches(features, valid, nidx):
    """Masked im2col patches (Q, K3*Cin) for a submanifold rulebook."""
    v, cin = features.shape
    k3, q = nidx.shape
    feats_pad = jnp.concatenate(
        [features * valid[:, None].astype(features.dtype),
         jnp.zeros((1, cin), features.dtype)], axis=0)
    rows = jnp.where(nidx >= 0, nidx, v).T  # (Q, K3)
    return feats_pad[rows].reshape(q, k3 * cin)


@jax.custom_vjp
def _subm_im2col_mirror(features, valid, nidx, weights):
    """im2col + wide GEMM for SUBMANIFOLD rulebooks with a gather-only
    backward pass.

    XLA's autodiff transpose of the patch gather is a scatter-add of
    (K3*V, Cin) rows — measured pathologically slow on TPU (the 13-row
    tap-inversion scatter alone costs ~20 ms at stage-1 scale).  For a
    submanifold rulebook the transpose IS another rulebook gather:
    nidx[t, q] = j  iff  nidx[K3-1-t, j] = q (sites == queries, symmetric
    cubic kernel), so

        dfeats[j] = sum_t dpatches[nidx[K3-1-t, j], t]

    — one flat gather of (K3, V) rows from the (Q*K3, Cin) dpatches
    array, no scatter anywhere.  dW recomputes the patches (cheap gather)
    instead of saving the 100+ MB patch matrix as a residual."""
    return jnp.dot(_subm_patches(features, valid, nidx),
                   weights.reshape(-1, weights.shape[-1]),
                   preferred_element_type=features.dtype)


def _subm_im2col_mirror_fwd(features, valid, nidx, weights):
    return _subm_im2col_mirror(features, valid, nidx, weights), (
        features, valid, nidx, weights)


def _subm_im2col_mirror_bwd(res, dy):
    features, valid, nidx, weights = res
    v, cin = features.shape
    k3, q = nidx.shape
    cout = weights.shape[-1]
    w2 = weights.reshape(k3 * cin, cout)
    # dW via recomputed patches: (K3*Cin, Q) @ (Q, Cout)
    patches = _subm_patches(features, valid, nidx)
    dw = jnp.dot(patches.T, dy.astype(patches.dtype),
                 preferred_element_type=weights.dtype).reshape(weights.shape)
    # dfeatures via the mirrored rulebook — gather, not scatter
    dpat = jnp.dot(dy.astype(w2.dtype), w2.T,
                   preferred_element_type=features.dtype)  # (Q, K3*Cin)
    dpat3 = jnp.concatenate(
        [dpat.reshape(q * k3, cin),
         jnp.zeros((1, cin), dpat.dtype)], axis=0)  # drop row at q*k3
    mirror = nidx[::-1]  # row t answers tap K3-1-t
    flat = jnp.where(mirror >= 0,
                     mirror * k3 + jnp.arange(k3, dtype=nidx.dtype)[:, None],
                     q * k3)  # (K3, V) into dpat3
    dfeats = dpat3[flat].sum(axis=0)  # (V, Cin)
    dfeats = dfeats * valid[:, None].astype(dfeats.dtype)
    f0 = np.zeros(valid.shape, jax.dtypes.float0)
    i0 = np.zeros(nidx.shape, jax.dtypes.float0)
    return dfeats.astype(features.dtype), f0, i0, dw


_subm_im2col_mirror.defvjp(_subm_im2col_mirror_fwd, _subm_im2col_mirror_bwd)


def _submanifold_conv3d_v2(features, coords, valid, weights, grid_zyx,
                           kernel=3, nidx=None):
    """v2 SubMConv3d: batched lookup + im2col wide GEMM (same math as v1,
    verified bit-level in tests/test_sparse_engine_ab.py).

    COM_TPU_SPARSE_BWD=mirror (default) routes the GEMM through the
    gather-only custom VJP above; =auto uses XLA's autodiff (scatter-add
    transpose), kept as the gradient oracle."""
    if nidx is None:
        nidx = subm_rulebook(coords, valid, grid_zyx, kernel)
    if os.environ.get("COM_TPU_SPARSE_BWD", "mirror") == "mirror":
        out = _subm_im2col_mirror(features, valid, nidx, weights)
    else:
        out = _im2col_matmul(features, valid, nidx, weights, features.dtype)
    return out * valid[:, None].astype(out.dtype)


def downsample_sites(coords, valid, stride_zyx, out_cap: int, grid_zyx,
                     kernel=3, pad=1):
    """Unique SparseConv3d output sites, padded to out_cap.

    spconv's SparseConv3d emits an output at EVERY site whose kernel
    window touches an occupied input voxel: on one axis, output o covers
    input i iff s*o - p <= i <= s*o - p + k - 1, i.e.
    o in [ceil((i+p-k+1)/s), floor((i+p)/s)].  For k=3 s=2 p=1 that is
    {i//2} for even i but {i//2, i//2+1} for odd i — floor-division alone
    drops the halo sites at odd coordinates, thinning the active set
    relative to spconv.  Candidates are enumerated statically
    (((k-1)//s)+1 per axis) and deduplicated.

    Returns (out_coords (out_cap, 3), out_valid (out_cap,), dgrid).
    """
    stride = tuple(int(s) for s in stride_zyx)
    ker = (kernel,) * 3 if np.isscalar(kernel) else tuple(int(k) for k in kernel)
    pd = (pad,) * 3 if np.isscalar(pad) else tuple(int(p) for p in pad)
    dgrid = tuple(
        (int(grid_zyx[a]) + 2 * pd[a] - ker[a]) // stride[a] + 1
        for a in range(3)
    )
    # per-axis candidate lists: o = floor((i + p)/s) - c
    ncand = [((ker[a] - 1) // stride[a]) + 1 for a in range(3)]
    o_hi = [
        (coords[:, a] + pd[a]) // stride[a] for a in range(3)
    ]
    o_lo = [
        -((-(coords[:, a] + pd[a] - ker[a] + 1)) // stride[a])
        for a in range(3)
    ]
    cand_keys = []
    for cz in range(ncand[0]):
        for cy in range(ncand[1]):
            for cx in range(ncand[2]):
                o = jnp.stack([o_hi[0] - cz, o_hi[1] - cy, o_hi[2] - cx],
                              axis=1)
                ok = valid
                for a, c in zip(range(3), (cz, cy, cx)):
                    ok = ok & (o[:, a] >= o_lo[a]) & (o[:, a] >= 0) \
                        & (o[:, a] < dgrid[a])
                cand_keys.append(flat_key(o, dgrid, ok))
    keys = jnp.concatenate(cand_keys)
    skeys = jnp.sort(keys)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    ) & (skeys != jnp.iinfo(jnp.int32).max)
    rank = jnp.cumsum(first) - 1  # unique rank per sorted slot
    ukeys = jnp.full((out_cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
    ukeys = ukeys.at[jnp.where(first, rank, out_cap)].set(skeys, mode="drop")
    out_valid = ukeys != jnp.iinfo(jnp.int32).max
    nzk, nyk, nxk = dgrid
    safe = jnp.where(out_valid, ukeys, 0)
    oz = safe // (nyk * nxk)
    oy = (safe // nxk) % nyk
    ox = safe % nxk
    out_coords = jnp.stack([oz, oy, ox], axis=1)
    return out_coords, out_valid, dgrid


def strided_conv3d(
    features,  # (V, Cin)
    coords,  # (V, 3) zyx (input resolution)
    valid,  # (V,)
    weights,  # (K^3, Cin, Cout)
    grid_zyx,
    out_cap: int,
    stride=(2, 2, 2),
    kernel=3,
    pad=1,
):
    """SparseConv3d: output at every site whose kernel window touches an
    occupied input voxel (downsample_sites, incl. the odd-coordinate halo);
    each output gathers its footprint in input space: in = s*out + j - p,
    j in [0, k) per dim."""
    if _engine() != "v1":
        return _strided_conv3d_v2(features, coords, valid, weights, grid_zyx,
                                  out_cap, stride, kernel, pad)
    cout = weights.shape[-1]
    v = features.shape[0]
    sorted_keys, order = build_hash(coords, valid, grid_zyx)
    out_coords, out_valid, dgrid = downsample_sites(
        coords, valid, stride, out_cap, grid_zyx, kernel=kernel, pad=pad
    )
    ker = (kernel,) * 3 if np.isscalar(kernel) else tuple(int(k) for k in kernel)
    pd = (pad,) * 3 if np.isscalar(pad) else tuple(int(p) for p in pad)
    offs = np.stack(
        np.meshgrid(*[np.arange(k) - p for k, p in zip(ker, pd)],
                    indexing="ij"), axis=-1
    ).reshape(-1, 3)
    nz, ny, nx = (int(g) for g in grid_zyx)
    s = jnp.asarray(stride, jnp.int32)

    feats_pad = jnp.concatenate(
        [features * valid[:, None].astype(features.dtype),
         jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )
    out = jnp.zeros((out_cap, cout), features.dtype)
    for k, off in enumerate(offs):
        in_coords = out_coords * s[None, :] + jnp.asarray(off, jnp.int32)
        inb = (
            (in_coords[:, 0] >= 0) & (in_coords[:, 0] < nz)
            & (in_coords[:, 1] >= 0) & (in_coords[:, 1] < ny)
            & (in_coords[:, 2] >= 0) & (in_coords[:, 2] < nx)
            & out_valid
        )
        qkeys = flat_key(in_coords, grid_zyx, inb)
        nidx = lookup(sorted_keys, order, qkeys)
        gathered = feats_pad[jnp.where(nidx >= 0, nidx, v)]
        out = out + jnp.dot(gathered, weights[k], preferred_element_type=out.dtype)
    return out * out_valid[:, None].astype(out.dtype), out_coords, out_valid, dgrid


def _strided_rulebook_outprobe(coords, valid, out_coords, out_valid, dgrid,
                               stride, ker, pd):
    """(K3, O) strided rulebook built from the INPUT side.

    The naive direction probes the input table with K3 taps per output —
    at stage 1 that is 27 x O random reads into a 371 MB table (the
    measured 67 ms dominator).  Flipped: each INPUT voxel is covered by at
    most prod(ceil(k/s)) (= 8 for k=3,s=2) candidate outputs, so probe the
    OUTPUT table (a grid_zyx/prod(s) ~ 8x smaller buffer) with ~8 x V
    queries, derive each hit's tap index t = i - s*o + p, and scatter
    nidx[t, j] = i.  (i, o) pairs are unique per (t, j), so writes never
    collide; outputs dropped by the out_cap overflow simply receive no
    writes (identical to the in-probe semantics where their rows don't
    exist)."""
    v = coords.shape[0]
    o_cap = out_coords.shape[0]
    k3 = ker[0] * ker[1] * ker[2]
    ncand = [((ker[a] - 1) // stride[a]) + 1 for a in range(3)]
    o_hi = [(coords[:, a] + pd[a]) // stride[a] for a in range(3)]
    o_lo = [-((-(coords[:, a] + pd[a] - ker[a] + 1)) // stride[a])
            for a in range(3)]
    cands, oks = [], []
    for cz in range(ncand[0]):
        for cy in range(ncand[1]):
            for cx in range(ncand[2]):
                o = jnp.stack(
                    [o_hi[0] - cz, o_hi[1] - cy, o_hi[2] - cx], axis=1)
                ok = valid
                for a, c in zip(range(3), (cz, cy, cx)):
                    ok = ok & (o[:, a] >= o_lo[a]) & (o[:, a] >= 0) \
                        & (o[:, a] < dgrid[a])
                cands.append(o)
                oks.append(ok)
    q_o = jnp.stack(cands)  # (C, V, 3)
    q_ok = jnp.stack(oks)  # (C, V)
    j = _batched_lookup(out_coords, out_valid, dgrid, q_o, q_ok)  # (C, V)
    s = jnp.asarray(stride, jnp.int32)
    t_off = coords[None, :, :] - q_o * s[None, None, :] \
        + jnp.asarray(pd, jnp.int32)[None, None, :]  # (C, V, 3) in [0, k)
    t = (t_off[..., 0] * ker[1] + t_off[..., 1]) * ker[2] + t_off[..., 2]
    hit = q_ok & (j >= 0)
    jj = jnp.where(hit, j, o_cap).reshape(-1)  # o_cap = drop column
    tt = jnp.where(hit, t, 0).reshape(-1)
    src = jnp.broadcast_to(
        jnp.arange(v, dtype=jnp.int32), q_ok.shape).reshape(-1)
    nidx = jnp.full((k3, o_cap + 1), -1, jnp.int32)
    nidx = nidx.at[tt, jj].set(src)
    return nidx[:, :o_cap]


def _strided_conv3d_v2(features, coords, valid, weights, grid_zyx, out_cap,
                       stride=(2, 2, 2), kernel=3, pad=1):
    """v2 SparseConv3d: batched footprint rulebook + im2col wide GEMM.

    COM_TPU_SPARSE_STRIDED=outprobe (default) builds the rulebook from the
    input side (_strided_rulebook_outprobe); =inprobe restores the
    output-side K3-tap probe of the input table."""
    out_coords, out_valid, dgrid = downsample_sites(
        coords, valid, stride, out_cap, grid_zyx, kernel=kernel, pad=pad)
    ker = (kernel,) * 3 if np.isscalar(kernel) else tuple(int(k) for k in kernel)
    pd = (pad,) * 3 if np.isscalar(pad) else tuple(int(p) for p in pad)
    if os.environ.get("COM_TPU_SPARSE_STRIDED", "outprobe") != "inprobe":
        nidx = _strided_rulebook_outprobe(coords, valid, out_coords,
                                          out_valid, dgrid, stride, ker, pd)
    else:
        offs = np.stack(
            np.meshgrid(*[np.arange(k) - p for k, p in zip(ker, pd)],
                        indexing="ij"), axis=-1).reshape(-1, 3)
        nz, ny, nx = (int(g) for g in grid_zyx)
        s = jnp.asarray(stride, jnp.int32)
        in_coords = (out_coords[None, :, :] * s[None, None, :]
                     + jnp.asarray(offs, jnp.int32)[:, None, :])  # (K3, O, 3)
        inb = (
            (in_coords[..., 0] >= 0) & (in_coords[..., 0] < nz)
            & (in_coords[..., 1] >= 0) & (in_coords[..., 1] < ny)
            & (in_coords[..., 2] >= 0) & (in_coords[..., 2] < nx)
            & out_valid[None, :]
        )
        nidx = _batched_lookup(coords, valid, grid_zyx, in_coords, inb)
    out = _im2col_matmul(features, valid, nidx, weights, features.dtype)
    return (out * out_valid[:, None].astype(out.dtype),
            out_coords, out_valid, dgrid)


def _inv_offsets(kernel, pad):
    """Per-axis offsets j - p, j in [0, k) — the transpose of
    strided_conv3d's in = s*out + j - p rulebook (pad=1 cubic reproduces
    the centered _offsets enumeration)."""
    ker = (kernel,) * 3 if np.isscalar(kernel) else tuple(int(k) for k in kernel)
    pd = (pad,) * 3 if np.isscalar(pad) else tuple(int(p) for p in pad)
    return np.stack(
        np.meshgrid(*[np.arange(k) - p for k, p in zip(ker, pd)],
                    indexing="ij"), axis=-1).reshape(-1, 3)


def inverse_conv3d(
    features,  # (Vlo, Cin) low-resolution features
    coords,  # (Vlo, 3) zyx at the DOWNSAMPLED resolution
    valid,  # (Vlo,)
    weights,  # (K^3, Cin, Cout)
    hi_coords,  # (Vhi, 3) zyx target (pre-downsample) sites
    hi_valid,  # (Vhi,)
    grid_lo_zyx,  # static low-res grid
    stride=(2, 2, 2),
    kernel: int = 3,
    pad=1,
):
    """SparseInverseConv3d role (spconv_unet.py inverseconv blocks): output at
    the known higher-resolution site set; output site c gathers the low-res
    site l = (c - off) // s for each kernel offset off = j - p where
    (c - off) is divisible by the stride — the exact transpose of
    strided_conv3d's in = s * out + j - p rulebook (spconv reuses the
    forward conv's indice rulebook, so ``pad`` must match the downsampling
    conv's padding, e.g. (0, 1, 1) for the z-unpadded conv4 stage)."""
    if _engine() != "v1":
        return _inverse_conv3d_v2(features, coords, valid, weights,
                                  hi_coords, hi_valid, grid_lo_zyx,
                                  stride, kernel, pad)
    cout = weights.shape[-1]
    vlo = features.shape[0]
    sorted_keys, order = build_hash(coords, valid, grid_lo_zyx)
    offs = _inv_offsets(kernel, pad)
    nzl, nyl, nxl = (int(g) for g in grid_lo_zyx)
    s = jnp.asarray(stride, jnp.int32)

    feats_pad = jnp.concatenate(
        [features * valid[:, None].astype(features.dtype),
         jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )
    out = jnp.zeros((hi_coords.shape[0], cout), features.dtype)
    for k, off in enumerate(offs):
        shifted = hi_coords - jnp.asarray(off, jnp.int32)
        divisible = (shifted % s[None, :] == 0).all(axis=1)
        lo = shifted // s[None, :]
        inb = (
            divisible & hi_valid
            & (lo[:, 0] >= 0) & (lo[:, 0] < nzl)
            & (lo[:, 1] >= 0) & (lo[:, 1] < nyl)
            & (lo[:, 2] >= 0) & (lo[:, 2] < nxl)
        )
        qkeys = flat_key(lo, grid_lo_zyx, inb)
        nidx = lookup(sorted_keys, order, qkeys)
        gathered = feats_pad[jnp.where(nidx >= 0, nidx, vlo)]
        out = out + jnp.dot(gathered, weights[k], preferred_element_type=out.dtype)
    return out * hi_valid[:, None].astype(out.dtype)


def _inverse_conv3d_v2(features, coords, valid, weights, hi_coords, hi_valid,
                       grid_lo_zyx, stride=(2, 2, 2), kernel=3, pad=1):
    """v2 SparseInverseConv3d: batched transpose-rulebook lookup + im2col."""
    nzl, nyl, nxl = (int(g) for g in grid_lo_zyx)
    offs = jnp.asarray(_inv_offsets(kernel, pad), jnp.int32)  # (K3, 3)
    s = jnp.asarray(stride, jnp.int32)
    shifted = hi_coords[None, :, :] - offs[:, None, :]  # (K3, H, 3)
    divisible = (shifted % s[None, None, :] == 0).all(axis=-1)
    lo = shifted // s[None, None, :]
    inb = (
        divisible & hi_valid[None, :]
        & (lo[..., 0] >= 0) & (lo[..., 0] < nzl)
        & (lo[..., 1] >= 0) & (lo[..., 1] < nyl)
        & (lo[..., 2] >= 0) & (lo[..., 2] < nxl)
    )
    nidx = _batched_lookup(coords, valid, grid_lo_zyx, lo, inb)
    out = _im2col_matmul(features, valid, nidx, weights, features.dtype)
    return out * hi_valid[:, None].astype(out.dtype)


def voxel_query(
    query_vox,  # (S, 3) float voxel-space coords (z, y, x) of query points
    coords,  # (V, 3) int zyx voxel coords at this scale
    valid,  # (V,)
    grid_zyx,  # static grid at this scale
    max_range: int = 4,
    radius_vox: float = 4.0,
    nsample: int = 16,
    cell_zyx=None,  # per-axis world cell size (z, y, x) at this scale
    radius_world: float | None = None,
):
    """Voxel neighborhood query (pointnet2_stack voxel_query_utils role,
    used by VoxelRCNN grid pooling): for each query, the first ``nsample``
    occupied voxels within ``max_range`` cells of the query's (floored)
    cell and within the radius, filled center-outward.

    With ``cell_zyx`` + ``radius_world`` the radius test is the TRUE world
    distance from the query point to the neighbor voxel's center — the
    reference CUDA kernel's semantics (voxel_query_gpu.cu:63-65), exact
    under anisotropic voxels where a cell-unit radius would stretch the
    ball along the coarser axis.  Without them, the legacy isotropic
    cell-unit test against ``radius_vox`` from the rounded cell.

    Returns (idx (S, nsample) int32 into coords, empty (S,) bool).
    A lax.scan walks the distance-sorted offset list so the unrolled graph
    stays small; hits fill each query's buffer in offset order.
    """
    sorted_keys, order = build_hash(coords, valid, grid_zyx)
    r = int(max_range)
    offs = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    metric = cell_zyx is not None and radius_world is not None
    if metric:
        cell = np.asarray(cell_zyx, np.float64)
        # conservative prefilter: closest possible center given any query
        # fraction within its cell is (|off| - 1) cells away per axis
        dmin2 = (((np.maximum(np.abs(offs) - 1, 0)) * cell) ** 2).sum(1)
        keep = dmin2 <= float(radius_world) ** 2
        d2 = ((offs * cell) ** 2).sum(1)
    else:
        d2 = (offs**2).sum(1)
        keep = d2 <= radius_vox * radius_vox
    offs = offs[keep][np.argsort(d2[keep], kind="stable")]
    offs = jnp.asarray(offs, jnp.int32)

    s = query_vox.shape[0]
    base = (jnp.floor(query_vox).astype(jnp.int32) if metric
            else jnp.round(query_vox).astype(jnp.int32))
    nz, ny, nx = (int(g) for g in grid_zyx)
    cell_j = (jnp.asarray(cell_zyx, query_vox.dtype) if metric else None)

    def step(carry, off):
        cnt, buf = carry
        nc = base + off[None, :]
        inb = (
            (nc[:, 0] >= 0) & (nc[:, 0] < nz)
            & (nc[:, 1] >= 0) & (nc[:, 1] < ny)
            & (nc[:, 2] >= 0) & (nc[:, 2] < nx)
        )
        qk = flat_key(nc, grid_zyx, inb)
        nidx = lookup(sorted_keys, order, qk)
        hit = (nidx >= 0) & (cnt < nsample)
        if metric:
            rel = (nc.astype(query_vox.dtype) + 0.5 - query_vox) * cell_j
            hit = hit & ((rel**2).sum(-1) <= float(radius_world) ** 2)
        slot = jnp.clip(cnt, 0, nsample - 1)
        buf = buf.at[jnp.arange(s), slot].set(
            jnp.where(hit, nidx, buf[jnp.arange(s), slot])
        )
        return (cnt + hit.astype(jnp.int32), buf), None

    init = (jnp.zeros((s,), jnp.int32), jnp.zeros((s, nsample), jnp.int32))
    (cnt, buf), _ = jax.lax.scan(step, init, offs)
    empty = cnt == 0
    # pad unfilled slots with the first hit (CUDA kernel repeats slot 0)
    filled = jnp.arange(nsample)[None, :] < jnp.maximum(cnt, 1)[:, None]
    buf = jnp.where(filled, buf, buf[:, :1])
    # slot_valid marks REAL hits (count-sensitive consumers mask with it;
    # the repeated pad slots are fine under max-pooling only)
    slot_valid = jnp.arange(nsample)[None, :] < cnt[:, None]
    return buf, empty, slot_valid


def focal_split_and_spawn(feats, coords, valid, imps, grid_zyx,
                          threshold: float, spawn_cap: int,
                          mask_multi: bool = False):
    """Focal sparse conv voxel split/spawn (focal_sparse_conv.py
    _gen_sparse_features + focal_sparse_utils.split_voxels roles):
    voxels whose predicted 'cubic importance' (imps[:, -1], sigmoid) exceeds
    the threshold are foreground; each foreground voxel spawns new voxels at
    kernel-offset positions whose per-offset importance also exceeds the
    threshold, carrying the parent's features scaled by that importance.
    Foreground voxels' own features are scaled by their importance (the
    straight-through path that trains the predictor).  Static shapes: the
    spawn set is deduplicated (against existing voxels and itself, highest
    score wins) and capped at ``spawn_cap``.

    Returns (feats', coords', valid', own_prob) with V + spawn_cap rows.
    """
    v, c = feats.shape
    own = jax.nn.sigmoid(imps[:, -1])
    fg = (own > threshold) & valid
    scale = jnp.where(fg, own, 1.0)
    base_feats = feats * (scale[:, None] if not mask_multi else
                          own[:, None] * valid[:, None])

    offs = np.delete(_offsets(3), 13, axis=0)  # 26 neighbors, center removed
    k = offs.shape[0]
    nz, ny, nx = (int(g) for g in grid_zyx)
    cand = coords[:, None, :] + jnp.asarray(offs, jnp.int32)[None]
    inb = (
        (cand[..., 0] >= 0) & (cand[..., 0] < nz)
        & (cand[..., 1] >= 0) & (cand[..., 1] < ny)
        & (cand[..., 2] >= 0) & (cand[..., 2] < nx)
    )
    score = jax.nn.sigmoid(imps[:, :k])
    ok = (score > threshold) & fg[:, None] & inb

    sorted_keys, order = build_hash(coords, valid, grid_zyx)
    flat_cand = cand.reshape(-1, 3)
    flat_ok = ok.reshape(-1)
    cand_keys = flat_key(flat_cand, grid_zyx, flat_ok)
    exists = lookup(sorted_keys, order, cand_keys) >= 0
    flat_ok = flat_ok & ~exists
    flat_score = jnp.where(flat_ok, score.reshape(-1), 0.0)

    # dedup among candidates: lexicographic sort by (key, -score); the first
    # slot of each key run is the highest-scoring parent
    keys_m = jnp.where(flat_ok, cand_keys, jnp.iinfo(jnp.int32).max)
    skeys, sneg, sidx = jax.lax.sort(
        (keys_m, -flat_score, jnp.arange(v * k, dtype=jnp.int32)), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    ) & (skeys != jnp.iinfo(jnp.int32).max)
    uniq_score = jnp.where(first, -sneg, -1.0)
    top_score, top_slot = jax.lax.top_k(uniq_score, spawn_cap)
    sel = sidx[top_slot]
    sel_valid = top_score > 0
    parent = sel // k
    spawn_coords = flat_cand[sel]
    spawn_feats = feats[parent] * top_score[:, None]
    spawn_feats = spawn_feats * sel_valid[:, None].astype(feats.dtype)
    spawn_coords = jnp.where(sel_valid[:, None], spawn_coords, -1)

    out_feats = jnp.concatenate([base_feats, spawn_feats], axis=0)
    out_coords = jnp.concatenate(
        [jnp.where(valid[:, None], coords, -1), spawn_coords], axis=0)
    out_valid = jnp.concatenate([valid, sel_valid], axis=0)
    return out_feats, out_coords, out_valid, own


def scatter_to_dense(features, coords, valid, grid_zyx):
    """(V, C) sparse -> (D, H, W, C) dense (for HeightCompression)."""
    nz, ny, nx = (int(g) for g in grid_zyx)
    c = features.shape[-1]
    keys = flat_key(coords, grid_zyx, valid)
    canvas = jnp.zeros((nz * ny * nx + 1, c), features.dtype)
    safe = jnp.where(valid, keys, nz * ny * nx)
    canvas = canvas.at[safe].add(features * valid[:, None].astype(features.dtype))
    return canvas[:-1].reshape(nz, ny, nx, c)
