"""Pure-XLA wgrad reformulations for the 3x3 BEV conv (no Pallas/Mosaic).

The col-buffer Pallas variants (microbench_wgrad_kernels.py gcol/xcol) never
compile through the axon remote-compile helper (deterministic HTTP 500 =
Mosaic crash), so this probes the same algebra as plain HLO, which the XLA
TPU backend compiles reliably:

  conv    jax.grad of lax.conv (XLA's own wgrad emitter)      [baseline]
  dot9    nine (K,ci)^T (K,co) dots on shifted views of padded x
  xcol    materialize x_col (K, 9ci) once, ONE dot -> (9ci, co): M=576
  gcol    materialize g_col (K, 9co) once, ONE dot -> (ci, 9co): N=576

All bf16 inputs, f32 accumulation (preferred_element_type), checked against
an f32 einsum oracle.  HBM floor at 468x468 c64: x+g = 112 MB -> ~0.14 ms;
col materialization adds ~0.5 GB traffic -> ~0.7 ms; current measured wgrad
is ~3.0 ms/conv, so a 2x win is available if either single-dot shape beats
the MXU narrow-output cliff.

Usage: python tools/perf/microbench_wgrad_xla.py   (on the TPU)
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
import numpy as np

ITERS = int(os.environ.get("WX_ITERS", 30))


def oracle(x, g):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    h, wd = x.shape[1], x.shape[2]
    gf = g.astype(jnp.float32)
    return jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwd->cd", xp[:, dy : dy + h, dxo : dxo + wd],
                       gf)
            for dxo in range(3)])
        for dy in range(3)])  # (3, 3, ci, co)


@jax.jit
def w_conv(x, g):
    # keep the conv bf16-in/bf16-out so the transpose (wgrad emitter) sees
    # matching dtypes; accumulate the vdot in f32.
    def fwd(w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w0 = jnp.zeros((3, 3, x.shape[-1], g.shape[-1]), x.dtype)
    return jax.grad(
        lambda w: jnp.vdot(fwd(w).astype(jnp.float32),
                           g.astype(jnp.float32)))(w0)


@jax.jit
def w_dot9(x, g):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b, h, wd, ci = x.shape
    co = g.shape[-1]
    gf = g.reshape(b * h * wd, co)
    taps = []
    for dy in range(3):
        for dxo in range(3):
            xs = xp[:, dy : dy + h, dxo : dxo + wd].reshape(b * h * wd, ci)
            taps.append(jax.lax.dot_general(
                xs, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(3, 3, ci, co)


@jax.jit
def w_xcol(x, g):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b, h, wd, ci = x.shape
    co = g.shape[-1]
    xcol = jnp.concatenate(
        [xp[:, dy : dy + h, dxo : dxo + wd]
         for dy in range(3) for dxo in range(3)], axis=-1
    ).reshape(b * h * wd, 9 * ci)
    gf = g.reshape(b * h * wd, co)
    dw = jax.lax.dot_general(xcol, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dw.reshape(3, 3, ci, co)


@jax.jit
def w_gcol(x, g):
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b, h, wd, ci = x.shape
    co = g.shape[-1]
    # tap (dy,dx) of dw contracts x[y+dy-1, x+dx-1] with g[y, x]; shifting g
    # the OPPOSITE way gives the same sum: sum_y x[y] g_shifted[y].
    gcol = jnp.concatenate(
        [gp[:, 2 - dy : 2 - dy + h, 2 - dxo : 2 - dxo + wd]
         for dy in range(3) for dxo in range(3)], axis=-1
    ).reshape(b * h * wd, 9 * co)
    xf = x.reshape(b * h * wd, ci)
    dw = jax.lax.dot_general(xf, gcol, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dw.reshape(ci, 3, 3, co).transpose(1, 2, 0, 3)


def timeit(name, fn, x, g, flops, ref):
    # chain_time, NOT an open loop: on the axon runtime block_until_ready
    # returns at enqueue and repeated identical execute requests are served
    # from a request cache (first version of this file read >1 PFLOP/s).
    from tools.perf.tpu_timeit import chain_time

    try:
        out = fn(x, g)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        dt = chain_time(fn, (x, g), iters=ITERS)
    except Exception as e:
        print(f"{name:10s} FAILED: {str(e).splitlines()[0][:90]}", flush=True)
        return
    print(f"{name:10s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s  "
          f"err {err:.2e}", flush=True)
    return dt


def main():
    # wgrad tap (dy,dx) boundary check first, tiny shape on CPU-side numpy
    for b, h, wd, ci, co in [(2, 468, 468, 64, 64), (2, 234, 234, 128, 128),
                             (2, 468, 468, 64, 128)]:
        x = (jax.random.normal(jax.random.PRNGKey(0), (b, h, wd, ci),
                               jnp.float32) * 0.3).astype(jnp.bfloat16)
        g = (jax.random.normal(jax.random.PRNGKey(1), (b, h, wd, co),
                               jnp.float32) * 0.3).astype(jnp.bfloat16)
        ref = jax.block_until_ready(oracle(x, g)).transpose(0, 1, 2, 3)
        ref = ref.reshape(3, 3, ci, co)
        flops = 2 * b * h * wd * 9 * ci * co
        print(f"--- {h}x{wd} cin{ci} cout{co} (wgrad {flops/1e9:.1f} GFLOP)")
        for name, fn in [("conv", w_conv), ("dot9", w_dot9),
                         ("xcol", w_xcol), ("gcol", w_gcol)]:
            timeit(name, fn, x, g, flops, ref)


if __name__ == "__main__":
    main()
