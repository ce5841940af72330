"""On-TPU sweep of wgrad kernel formulations for the 3x3 BEV conv.

microbench_wgrad.py isolated the backward gap to wgrad at the narrow-channel
stage (468x468 c64: wgrad 3.0 ms/conv vs fwd 2.1, ~11 TFLOPs) where both the
XLA conv emitter and the current Pallas kernel tie.  The current kernel
(ops/pallas/conv2d.py:_wgrad_kernel) issues nine dot_generals per tile, each
contracting BOTH operands on dim 0 with a (cin, cout) = (64, 64) output —
quarter-MXU utilization at best, plus whatever layout fixups Mosaic inserts
for the double-dim0 contraction.

Variants measured here (all accumulate dw across the (B, H/TH) grid):
  gt9     nine dots with the TRANSPOSED x tile pre-staged in VMEM (default)
  gtcol   transposed-x staging + the nine taps as one column-buffer dot
          (default)
  gcol    ONE dot: x (K,cin) vs g_col (K,9*cout) -> (cin, 9*cout): the nine
          taps become lanes of the rhs (g shifted per tap into a VMEM col
          buffer), so N = 576 full lanes instead of 64   [WG_COL=1]
  xcol    ONE dot: x_col (K,9*cin) vs g (K,cout) -> (9*cin, cout): taps in
          the lhs; output M=576 tall but N=64 stays narrow   [WG_COL=1]
  v0      nine (K,cin)^T (K,cout) dots           [current kernel; WG_V0=1]
main() runs gt9/gtcol by default; set WG_COL=1 to add gcol/xcol, WG_V0=1 to
add v0, WG_ITERS=N to change the timed loop count.  All variants are
numerically checked on-device against an f32 einsum oracle.
"""
from __future__ import annotations

import functools
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from com_tpu.ops.pallas.conv2d import _conv3x3_wgrad_pallas, _halo_specs

ITERS = int(os.environ.get("WG_ITERS", 20))


def _assemble(pad_ref, top_ref, mid_ref, bot_ref, th, w_dim, i, n_i):
    pad_ref[...] = jnp.zeros_like(pad_ref)
    top_row = top_ref[0, th - 1]
    bot_row = bot_ref[0, 0]
    zero = jnp.zeros_like(top_row)
    pad_ref[0, 1 : w_dim + 1] = jnp.where(i > 0, top_row, zero)
    pad_ref[1 : th + 1, 1 : w_dim + 1] = mid_ref[0]
    pad_ref[th + 1, 1 : w_dim + 1] = jnp.where(i < n_i - 1, bot_row, zero)


def _gcol_kernel(th, w_dim, cin, cout, x_ref, gt_ref, gm_ref, gb_ref,
                 dw_ref, gpad_ref, col_ref):
    b, i = pl.program_id(0), pl.program_id(1)
    n_i = pl.num_programs(1)
    _assemble(gpad_ref, gt_ref, gm_ref, gb_ref, th, w_dim, i, n_i)
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            sl = gpad_ref[2 - dy : 2 - dy + th, 2 - dx : 2 - dx + w_dim]
            col_ref[:, tap * cout : (tap + 1) * cout] = sl.reshape(
                th * w_dim, cout)
    x = x_ref[0].reshape(th * w_dim, cin)
    contrib = jax.lax.dot_general(
        x, col_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    is_first = jnp.logical_and(b == 0, i == 0)
    prev = jnp.where(is_first, jnp.zeros_like(contrib), dw_ref[...])
    dw_ref[...] = prev + contrib


def wgrad_gcol(x, g, th):
    b, h, wd, cin = x.shape
    cout = g.shape[-1]
    hpad = (-h) % th
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    grid_h = (h + hpad) // th
    dwt = pl.pallas_call(
        functools.partial(_gcol_kernel, th, wd, cin, cout),
        out_shape=jax.ShapeDtypeStruct((cin, 9 * cout), jnp.float32),
        grid=(b, grid_h),
        in_specs=[pl.BlockSpec((1, th, wd, cin), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _halo_specs(th, wd, cout, grid_h),
        out_specs=pl.BlockSpec((cin, 9 * cout), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + 2, wd + 2, cout), g.dtype),
                        pltpu.VMEM((th * wd, 9 * cout), g.dtype)],
    )(x, g, g, g)
    # (cin, 9*cout) -> (3, 3, cin, cout)
    return dwt.reshape(cin, 3, 3, cout).transpose(1, 2, 0, 3)


def _xcol_kernel(th, w_dim, cin, cout, xt_ref, xm_ref, xb_ref, g_ref,
                 dw_ref, xpad_ref, col_ref):
    b, i = pl.program_id(0), pl.program_id(1)
    n_i = pl.num_programs(1)
    _assemble(xpad_ref, xt_ref, xm_ref, xb_ref, th, w_dim, i, n_i)
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            sl = xpad_ref[dy : dy + th, dx : dx + w_dim]
            col_ref[:, tap * cin : (tap + 1) * cin] = sl.reshape(
                th * w_dim, cin)
    g = g_ref[0].reshape(th * w_dim, cout)
    contrib = jax.lax.dot_general(
        col_ref[...], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    is_first = jnp.logical_and(b == 0, i == 0)
    prev = jnp.where(is_first, jnp.zeros_like(contrib), dw_ref[...])
    dw_ref[...] = prev + contrib


def wgrad_xcol(x, g, th):
    b, h, wd, cin = x.shape
    cout = g.shape[-1]
    hpad = (-h) % th
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    grid_h = (h + hpad) // th
    dwf = pl.pallas_call(
        functools.partial(_xcol_kernel, th, wd, cin, cout),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        grid=(b, grid_h),
        in_specs=_halo_specs(th, wd, cin, grid_h)
        + [pl.BlockSpec((1, th, wd, cout), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + 2, wd + 2, cin), x.dtype),
                        pltpu.VMEM((th * wd, 9 * cin), x.dtype)],
    )(x, x, x, g)
    return dwf.reshape(3, 3, cin, cout)


def _gt9_kernel(th, w_dim, cin, cout, xt_ref, xm_ref, xb_ref, g_ref,
                dw_ref, xpad_ref):
    """Transpose g ONCE per tile, then nine MXU-native (M,K)@(K,N) dots
    (gT (cout,K) @ x_tap (K,cin)) accumulated at lane offsets of a
    (cout, 9*cin) output — no per-tap Mosaic transpose temporaries."""
    b, i = pl.program_id(0), pl.program_id(1)
    n_i = pl.num_programs(1)
    _assemble(xpad_ref, xt_ref, xm_ref, xb_ref, th, w_dim, i, n_i)
    gT = g_ref[0].reshape(th * w_dim, cout).T  # (cout, K), one relayout
    is_first = jnp.logical_and(b == 0, i == 0)
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            sl = xpad_ref[dy : dy + th, dx : dx + w_dim].reshape(
                th * w_dim, cin)
            contrib = jax.lax.dot_general(
                gT, sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            prev = jnp.where(is_first,
                             jnp.zeros_like(contrib),
                             dw_ref[:, tap * cin : (tap + 1) * cin])
            dw_ref[:, tap * cin : (tap + 1) * cin] = prev + contrib


def wgrad_gt9(x, g, th):
    b, h, wd, cin = x.shape
    cout = g.shape[-1]
    hpad = (-h) % th
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    grid_h = (h + hpad) // th
    dwt = pl.pallas_call(
        functools.partial(_gt9_kernel, th, wd, cin, cout),
        out_shape=jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
        grid=(b, grid_h),
        in_specs=_halo_specs(th, wd, cin, grid_h)
        + [pl.BlockSpec((1, th, wd, cout), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cout, 9 * cin), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + 2, wd + 2, cin), x.dtype)],
    )(x, x, x, g)
    # (cout, 9*cin) -> (3, 3, cin, cout)
    return dwt.reshape(cout, 3, 3, cin).transpose(1, 2, 3, 0)


def _gtcol_kernel(th, w_dim, cin, cout, xt_ref, xm_ref, xb_ref, g_ref,
                  dw_ref, xpad_ref, col_ref):
    """gT once + ONE native dot against an im2col buffer: gT (cout,K) @
    col (K, 9*cin) -> (cout, 576): full output lanes."""
    b, i = pl.program_id(0), pl.program_id(1)
    n_i = pl.num_programs(1)
    _assemble(xpad_ref, xt_ref, xm_ref, xb_ref, th, w_dim, i, n_i)
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            sl = xpad_ref[dy : dy + th, dx : dx + w_dim].reshape(
                th * w_dim, cin)
            col_ref[:, tap * cin : (tap + 1) * cin] = sl
    gT = g_ref[0].reshape(th * w_dim, cout).T
    contrib = jax.lax.dot_general(
        gT, col_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    is_first = jnp.logical_and(b == 0, i == 0)
    prev = jnp.where(is_first, jnp.zeros_like(contrib), dw_ref[...])
    dw_ref[...] = prev + contrib


def wgrad_gtcol(x, g, th):
    b, h, wd, cin = x.shape
    cout = g.shape[-1]
    hpad = (-h) % th
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    grid_h = (h + hpad) // th
    dwt = pl.pallas_call(
        functools.partial(_gtcol_kernel, th, wd, cin, cout),
        out_shape=jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
        grid=(b, grid_h),
        in_specs=_halo_specs(th, wd, cin, grid_h)
        + [pl.BlockSpec((1, th, wd, cout), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cout, 9 * cin), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + 2, wd + 2, cin), x.dtype),
                        pltpu.VMEM((th * wd, 9 * cin), x.dtype)],
    )(x, x, x, g)
    return dwt.reshape(cout, 3, 3, cin).transpose(1, 2, 3, 0)


def oracle(x, g):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    h, wd = x.shape[1], x.shape[2]
    gf = g.astype(jnp.float32)
    return jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwd->cd", xp[:, dy : dy + h, dxo : dxo + wd],
                       gf)
            for dxo in range(3)])
        for dy in range(3)])


def timeit(name, fn, *a, flops=0):
    # chain_time (one executable, dependent iterations, host-fetch barrier):
    # open-loop timing under the axon runtime reads from a request cache and
    # block_until_ready returns at enqueue — see tools/perf/tpu_timeit.py.
    from tools.perf.tpu_timeit import chain_time

    try:
        out = fn(*a)
        dt = chain_time(fn, a, iters=ITERS)
    except Exception as e:  # compile OOM or async dispatch error — record
        print(f"{name:36s} FAILED: {str(e).splitlines()[0][:90]}", flush=True)
        return None, float("inf")
    rate = flops / dt / 1e12 if flops else 0.0
    print(f"{name:36s} {dt*1e3:8.3f} ms  {rate:6.1f} TFLOP/s", flush=True)
    return out, dt


def main():
    run_v0 = os.environ.get("WG_V0", "0") == "1"
    shapes = [(2, 468, 468, 64, 64), (2, 468, 468, 128, 64)]
    for b, h, wd, cin, cout in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, wd, cin),
                              jnp.float32).astype(jnp.bfloat16) * 0.3
        g = jax.random.normal(jax.random.PRNGKey(1), (b, h, wd, cout),
                              jnp.float32).astype(jnp.bfloat16) * 0.3
        fl = 2 * b * h * wd * 9 * cin * cout
        print(f"--- {h}x{wd} cin{cin} cout{cout} (wgrad {fl/1e9:.1f} GFLOP)")
        ref = jax.jit(oracle)(x, g)
        scale = float(jnp.abs(ref).max())

        o0 = None
        if run_v0:
            o0, _ = timeit("v0 current", jax.jit(_conv3x3_wgrad_pallas),
                           x, g, flops=fl)
        if o0 is not None:
            print(f"    v0 err {float(jnp.abs(o0 - ref).max()) / scale:.2e}")
        variants = {"gt9": wgrad_gt9, "gtcol": wgrad_gtcol}
        if os.environ.get("WG_COL", "0") == "1":
            variants.update({"gcol": wgrad_gcol, "xcol": wgrad_xcol})
        for th in (8, 16):
            for name, fn in variants.items():
                ov, _ = timeit(f"{name} th={th}",
                               jax.jit(functools.partial(fn, th=th)),
                               x, g, flops=fl)
                if ov is not None:
                    print(f"    {name} err "
                          f"{float(jnp.abs(ov - ref).max()) / scale:.2e}")


if __name__ == "__main__":
    main()
