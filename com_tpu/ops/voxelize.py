"""Voxelization: host hard-voxelizer + device dynamic pillarization.

Replaces the spconv Point2VoxelCPU3d / cumm voxel generator used by the
reference data processor (pcdet/datasets/processor/data_processor.py:15-60).

Two paths, by design:

* **Host path** (`voxelize_points`, numpy): hard voxelization with
  MAX_POINTS_PER_VOXEL / MAX_NUMBER_OF_VOXELS caps, first-come point order —
  same contract as the reference, used by the input pipeline for the classic
  padded (V, T, F) PillarVFE/MeanVFE encoders.  Output is fixed-shape padded so
  batches are static for XLA.

* **Device path** (`point_voxel_ids`, jnp): *dynamic* pillarization — each
  point maps to a flat pillar id; feature encoding then uses segment
  reductions directly (see models/vfe.py DynamicPillarVFE).  No voxel list is
  ever materialized; voxelize+encode+scatter fuse into a few XLA ops.  This is
  the TPU-native fast path.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def grid_size_from_range(pc_range, voxel_size) -> np.ndarray:
    pc_range = np.asarray(pc_range, dtype=np.float64)
    voxel_size = np.asarray(voxel_size, dtype=np.float64)
    grid = (pc_range[3:6] - pc_range[0:3]) / voxel_size
    return np.round(grid).astype(np.int64)  # (nx, ny, nz)


def voxelize_points(
    points: np.ndarray,
    pc_range,
    voxel_size,
    max_points_per_voxel: int,
    max_voxels: int,
    pad_to_max: bool = False,
):
    """Hard voxelization (numpy host path).

    Args:
        points: (N, F) with xyz in the first 3 columns.
        pad_to_max: if True, outputs are padded to max_voxels rows (static
            shape for the device); otherwise trimmed to the true voxel count.

    Returns:
        voxels: (V, T, F) float32, zero-padded
        coords: (V, 3) int32 [zyx] order (reference convention,
            data_processor.py:125-153 emits zyx for the model)
        num_points: (V,) int32
    """
    pc_range = np.asarray(pc_range, dtype=np.float32)
    voxel_size = np.asarray(voxel_size, dtype=np.float32)
    grid = grid_size_from_range(pc_range, voxel_size)  # (nx, ny, nz)
    nx, ny, nz = int(grid[0]), int(grid[1]), int(grid[2])

    coords_f = (points[:, :3] - pc_range[:3]) / voxel_size
    # floor, not int-cast: truncation maps below-range points (negative cell
    # coords in (-1, 0)) onto edge cells instead of rejecting them
    vx = np.floor(coords_f[:, 0]).astype(np.int64)
    vy = np.floor(coords_f[:, 1]).astype(np.int64)
    vz = np.floor(coords_f[:, 2]).astype(np.int64)
    in_range = (
        (vx >= 0) & (vx < nx) & (vy >= 0) & (vy < ny) & (vz >= 0) & (vz < nz)
    )
    pts = points[in_range]
    flat = (vz[in_range] * ny + vy[in_range]) * nx + vx[in_range]

    # first-occurrence unique keeps arrival order of voxels, like spconv
    uniq, first_idx, inv = np.unique(flat, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank_of_uniq = np.empty_like(order)
    rank_of_uniq[order] = np.arange(len(order))
    voxel_id = rank_of_uniq[inv]  # per-point voxel slot in arrival order

    num_voxels = min(len(uniq), max_voxels)
    keep_pt = voxel_id < num_voxels

    # per-point slot within its voxel (arrival order), capped at T
    sort_by_voxel = np.argsort(voxel_id, kind="stable")
    sorted_vid = voxel_id[sort_by_voxel]
    counts = np.bincount(sorted_vid, minlength=len(uniq))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot_sorted = np.arange(len(sorted_vid)) - starts[sorted_vid]
    slot = np.empty_like(slot_sorted)
    slot[sort_by_voxel] = slot_sorted

    sel = keep_pt & (slot < max_points_per_voxel)
    out_rows = max_voxels if pad_to_max else num_voxels
    voxels = np.zeros((out_rows, max_points_per_voxel, points.shape[1]), np.float32)
    voxels[voxel_id[sel], slot[sel]] = pts[sel]
    num_points = np.minimum(counts[:num_voxels], max_points_per_voxel).astype(np.int32)
    if pad_to_max:
        num_points = np.pad(num_points, (0, max_voxels - num_voxels))

    uniq_in_order = uniq[order][:num_voxels]
    czyx = np.stack(
        [
            uniq_in_order // (nx * ny),
            (uniq_in_order // nx) % ny,
            uniq_in_order % nx,
        ],
        axis=1,
    ).astype(np.int32)
    if pad_to_max:
        czyx = np.pad(czyx, ((0, max_voxels - num_voxels), (0, 0)), constant_values=-1)
    return voxels, czyx, num_points


def device_hard_voxelize(points, points_mask, pc_range, voxel_size, grid_size,
                         max_points_per_voxel: int, max_voxels: int):
    """Device-side hard voxelization, jit-safe and scatter-free.

    Produces the same (voxels, coords, num_points) contract as the host
    voxelizer (spconv Point2Voxel role, data_processor.py:15-60) so the
    standard padded-pillar PFN + PointPillarScatter run unchanged — but on
    raw device-resident points.  Built for TPU: one stable argsort by cell
    key, run starts via a second sort of first-flag positions, then a dense
    (V, T) *gather* from the sorted points.  XLA's duplicate-index scatters
    (the round-1 hot spot, ~0.1 us/row) are avoided entirely.

    Deviations from the host path (documented): voxels emerge in cell-key
    order rather than point-arrival order (downstream is order-invariant —
    scatter-by-coords), and when the voxel count exceeds max_voxels the
    lowest-keyed voxels win instead of the earliest-seen.  Point order
    *within* a voxel is arrival order in both (stable sort), so per-voxel
    contents are bit-equal under the cap.

    Args:
        points: (B, N, F) with xyz first.
        points_mask: (B, N) bool validity.
    Returns:
        voxels (B, V, T, F) zero-padded, coords (B, V, 3) int32 zyx (-1 pad),
        num_points (B, V) int32.
    """
    import jax

    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    T, V = int(max_points_per_voxel), int(max_voxels)
    cells = nx * ny * nz
    r = jnp.asarray(pc_range, dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)

    def per_sample(p, m):
        n = p.shape[0]
        vi = jnp.floor((p[:, :3] - r[:3]) / vs).astype(jnp.int32)
        inb = (
            m
            & (vi[:, 0] >= 0) & (vi[:, 0] < nx)
            & (vi[:, 1] >= 0) & (vi[:, 1] < ny)
            & (vi[:, 2] >= 0) & (vi[:, 2] < nz)
        )
        key = jnp.where(inb, (vi[:, 2] * ny + vi[:, 1]) * nx + vi[:, 0], cells)
        order = jnp.argsort(key, stable=True)
        skey = key[order]
        sp = p[order]
        prev = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
        first = (skey != prev) & (skey != cells)
        startpos = jnp.where(first, jnp.arange(n, dtype=jnp.int32), n)
        # next-run boundaries must come from ALL run starts, not the V-
        # truncated list: with more occupied cells than max_voxels, the last
        # kept voxel would otherwise absorb points of the dropped runs
        allstart = jnp.concatenate(
            [jax.lax.sort(startpos),
             jnp.full((max(V + 1 - n, 1),), n, jnp.int32)])
        sstart = allstart[:V]  # run starts, ascending; n = pad
        total = jnp.sum(inb).astype(jnp.int32)
        nxt = allstart[1 : V + 1]
        cnt = jnp.clip(jnp.minimum(nxt, total) - sstart, 0, T)
        uvalid = sstart < n
        ukey = skey[jnp.clip(sstart, 0, n - 1)]
        gidx = jnp.clip(sstart[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :],
                        0, n - 1)
        tmask = jnp.arange(T, dtype=jnp.int32)[None, :] < cnt[:, None]
        vox = sp[gidx] * tmask[..., None].astype(p.dtype)
        safe = jnp.where(uvalid, ukey, 0)
        coords = jnp.where(
            uvalid[:, None],
            jnp.stack([safe // (ny * nx), (safe // nx) % ny, safe % nx], axis=1),
            -1,
        ).astype(jnp.int32)
        return vox, coords, jnp.where(uvalid, cnt, 0).astype(jnp.int32)

    return jax.vmap(per_sample)(points, points_mask)


def point_voxel_ids(points_xyz, pc_range, voxel_size, grid_size):
    """Device path: per-point flat BEV pillar id (jittable).

    Args:
        points_xyz: (..., 3) jnp array.
        grid_size: static (nx, ny, nz) ints.
    Returns:
        flat_id: (...,) int32 = vy * nx + vx  (BEV flattening, z folded)
        in_range: (...,) bool
    """
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    pc_range = jnp.asarray(pc_range, dtype=points_xyz.dtype)
    voxel_size = jnp.asarray(voxel_size, dtype=points_xyz.dtype)
    v = (points_xyz - pc_range[:3]) / voxel_size
    vi = jnp.floor(v).astype(jnp.int32)
    in_range = (
        (vi[..., 0] >= 0)
        & (vi[..., 0] < nx)
        & (vi[..., 1] >= 0)
        & (vi[..., 1] < ny)
        & (vi[..., 2] >= 0)
        & (vi[..., 2] < nz)
    )
    flat = vi[..., 1] * nx + vi[..., 0]
    return jnp.where(in_range, flat, nx * ny), in_range
