"""On-TPU probe: where conv backward time goes — dgrad vs wgrad.

The full-step decomposition (step_breakdown.py, 2026-08-18) shows backward
runs at ~half the forward's TFLOPs (model fwd 40 ms, fwd+bwd 159 ms); the
matmul probe says narrow-output huge-K contractions (exactly wgrad's
(9*Cin, Cout) output over K=B*H*W) are the MXU's worst regime.  This probe
separates the two backward legs per conv shape, in-graph:

  chain fwd      : y_{i+1} = conv3x3(y_i, w_i), CHAIN links, via fori_loop
                   over stacked weights — one dispatch, no tunnel per-call
                   overhead (which inflated microbench_conv ~3x)
  grad wrt x     : dgrad only (the unused dw legs are DCE'd)
  grad wrt (x,w) : dgrad + wgrad

wgrad cost = [grad(x,w)] - [grad x]; both routes (pallas / xla) measured.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

CHAIN = int(os.environ.get("WG_CHAIN", 8))
ITERS = int(os.environ.get("WG_ITERS", 5))

# (B, H, W, C) square-channel chains at the backbone's three stages plus the
# head-branch shape; the 384->64 shared conv can't chain (cin != cout).
SHAPES = [
    (2, 468, 468, 64),
    (2, 234, 234, 128),
    (2, 117, 117, 256),
]


def timeit(name, fn, *a, flops=0):
    out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS
    per_link = dt / CHAIN * 1e3
    rate = flops / dt / 1e12 if flops else 0.0
    print(f"{name:44s} {dt*1e3:8.2f} ms  ({per_link:6.3f} ms/conv, "
          f"{rate:6.1f} TFLOPs)", flush=True)
    return dt


def main():
    from com_tpu.ops.pallas.conv2d import conv3x3

    for b, h, wd, c in SHAPES:
        x = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (b, h, wd, c), jnp.float32
        ).astype(jnp.bfloat16) * 0.1)()
        ws = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(1), (CHAIN, 3, 3, c, c), jnp.float32
        ).astype(jnp.bfloat16) * (0.05 / c ** 0.5))()

        for route, force in (("pallas", None), ("xla", "cpu")):
            def chain(x, ws, force=force):
                def body(i, y):
                    return conv3x3(y, ws[i], force)
                return jax.lax.fori_loop(0, CHAIN, body, x)

            def loss(x, ws):
                return chain(x, ws).astype(jnp.float32).sum()

            fl1 = 2 * b * h * wd * 9 * c * c * CHAIN  # fwd flops of the chain
            f = jax.jit(loss)
            gx = jax.jit(jax.grad(loss, argnums=0))
            gxw = jax.jit(jax.grad(loss, argnums=(0, 1)))
            tag = f"{h}x{wd} c{c} [{route}]"
            t_f = timeit(f"fwd            {tag}", f, x, ws, flops=fl1)
            t_gx = timeit(f"fwd+dgrad      {tag}", gx, x, ws, flops=2 * fl1)
            t_gxw = timeit(f"fwd+dgrad+wgrad {tag}", gxw, x, ws, flops=3 * fl1)
            print(f"  -> dgrad {1e3*(t_gx-t_f)/CHAIN:6.3f} ms/conv, "
                  f"wgrad {1e3*(t_gxw-t_gx)/CHAIN:6.3f} ms/conv "
                  f"(fwd {1e3*t_f/CHAIN:6.3f})", flush=True)


if __name__ == "__main__":
    main()
