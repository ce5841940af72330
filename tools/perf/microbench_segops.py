"""Microbenchmark the segment-op design space for the dynamic-pillar VFE.

Measures, on the attached TPU, the primitives that compete to implement
"pool points into pillars and broadcast back":
  - jax.ops.segment_sum/max over the full BEV canvas segment space (status quo)
  - gather back from canvas (status quo broadcast)
  - one-shot sort of pillar keys + row gather to sorted order
  - cumsum over N (rank computation)
  - compact scatter (R rows) to canvas
  - narrow (1-col) scatter
Prints one line per primitive: name, ms/call.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N1 = 2, 163840
N = B * N1
HW = 468 * 468
M = B * HW + 1
C = 64
R = 60000  # compact run cap

rng = np.random.RandomState(0)
# realistic clustering: ~30k occupied pillars/scene
occ = rng.choice(HW, size=30000, replace=False)
seg_np = np.concatenate([
    occ[rng.randint(0, 30000, N1)] + b * HW for b in range(B)
]).astype(np.int32)
vals_np = rng.randn(N, C).astype(np.float32)

seg_raw = jnp.asarray(seg_np)
vals = jnp.asarray(vals_np)
seg_sorted = jnp.sort(seg_raw)
perm = jnp.argsort(seg_raw)
compact_vals = jnp.asarray(rng.randn(R, C).astype(np.float32))
compact_rows = jnp.asarray(np.sort(rng.choice(M - 1, R, replace=False)).astype(np.int32))
canvas = jnp.asarray(rng.randn(M, C).astype(np.float32))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    # device->host sync to defeat async enqueue through the tunnel
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


segsum = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=M))
segmax = jax.jit(lambda v, s: jax.ops.segment_max(v, s, num_segments=M))
segsum_sorted = jax.jit(
    lambda v, s: jax.ops.segment_sum(v, s, num_segments=M, indices_are_sorted=True)
)
segsum_R = jax.jit(lambda v, s: jax.ops.segment_sum(v, jnp.clip(s, 0, R - 1), num_segments=R))
gather_canvas = jax.jit(lambda c, s: c[s])
gather_canvas_sorted = jax.jit(lambda c, s: jnp.take(c, s, axis=0, indices_are_sorted=True))
sort_keys = jax.jit(lambda s: jnp.sort(s))
argsort_keys = jax.jit(lambda s: jnp.argsort(s))
sort_rows = jax.jit(lambda s, v: jax.lax.sort([s] + [v[:, i] for i in range(8)], num_keys=1))
gather_rows = jax.jit(lambda v, p: v[p])
cumsum_n = jax.jit(lambda s: jnp.cumsum((s[1:] != s[:-1]).astype(jnp.int32)))
compact_scatter = jax.jit(
    lambda cv, cr: jnp.zeros((M, C), jnp.float32).at[cr].set(cv, mode="drop", unique_indices=True)
)
narrow_scatter = jax.jit(
    lambda s: jnp.zeros((M,), jnp.int32).at[s].add(1, mode="drop")
)
flip_rows = jax.jit(lambda v: jnp.flip(v, axis=0))

# end-to-end canvas-write candidates at VFE shapes: sorted per-sample stream
import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from com_tpu.ops.scatter import compact_canvas_max  # noqa: E402

HW = 468 * 468
seg_b = jnp.asarray(np.sort(seg_np.reshape(B, N1) % HW, axis=1).astype(np.int32))
vals_b = vals.reshape(B, N1, C)
segg_b = (seg_b + jnp.arange(B, dtype=jnp.int32)[:, None] * (HW + 1)).reshape(-1)
dense_canvas = jax.jit(
    lambda v: jax.ops.segment_max(
        v.reshape(B * N1, C), segg_b, num_segments=B * (HW + 1),
        indices_are_sorted=True))
compact_canvas = jax.jit(
    lambda v: compact_canvas_max(v, seg_b, HW, cap=65536)[0])


def _canvas_loss(write):
    def f(v):
        cv = write(v)
        return jnp.sum(jnp.where(jnp.isfinite(cv), cv, 0.0))
    return jax.jit(jax.grad(f))


if __name__ == "__main__":
    print(f"N={N} M={M} C={C} R={R} on {jax.devices()[0].platform}")
    timeit("segment_sum (N,64)->M canvas", segsum, vals, seg_raw)
    timeit("segment_max (N,64)->M canvas", segmax, vals, seg_raw)
    timeit("segment_sum sorted+hint", segsum_sorted, vals, seg_sorted)
    timeit("segment_sum (N,64)->R=60k compact", segsum_R, vals, seg_raw)
    timeit("gather canvas[seg] (N,64)", gather_canvas, canvas, seg_raw)
    timeit("gather canvas[seg] sorted+hint", gather_canvas_sorted, canvas, seg_sorted)
    timeit("sort keys (N,)", sort_keys, seg_raw)
    timeit("argsort keys (N,)", argsort_keys, seg_raw)
    timeit("lax.sort 1key+8vals rows", sort_rows, seg_raw, vals[:, :8])
    timeit("gather rows v[perm] (N,64)", gather_rows, vals, perm)
    timeit("cumsum over N", cumsum_n, seg_sorted)
    timeit("compact scatter R->canvas (unique)", compact_scatter, compact_vals, compact_rows)
    timeit("narrow scatter-add count (N,)->M", narrow_scatter, seg_raw)
    timeit("flip rows (N,64)", flip_rows, vals)
    timeit("canvas write DENSE fwd", dense_canvas, vals_b)
    timeit("canvas write COMPACT fwd (cap 64k)", compact_canvas, vals_b)
    timeit("canvas write DENSE fwd+bwd", _canvas_loss(dense_canvas), vals_b)
    timeit("canvas write COMPACT fwd+bwd", _canvas_loss(compact_canvas), vals_b)
