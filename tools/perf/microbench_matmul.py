"""On-TPU probe: raw MXU matmul rates at BEV-backbone-equivalent shapes.

The 3x3 conv stages run at ~15-26 TFLOPs on a v5e (microbench_conv).  This
probe answers *why*: it times plain (M,K)@(K,N) bf16 matmuls at the same
M / K / N the conv emitter effectively uses, plus square controls, so the
gap decomposes into (a) narrow-N MXU occupancy vs (b) conv-specific
overhead (im2col shifts, halo loads).  Informs whether an algorithmic
change (Winograd: 2.25x fewer MACs but K=N=64 transform-domain matmuls)
can win at all.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# (M, K, N, note)
SHAPES = [
    (438048, 576, 64, "conv1 im2col: 468x468xB2, 9*64 -> 64"),
    (438048, 576, 128, "same M/K, N=128 control"),
    (438048, 64, 64, "winograd tile matmul: K=N=64"),
    (438048, 128, 128, "K=N=128 control"),
    (109512, 64, 64, "winograd F(2x2): M/4, K=N=64"),
    (438048, 3456, 64, "head shared conv im2col: 9*384 -> 64"),
    (109512, 1152, 128, "stage2 im2col: 234^2*B2, 9*128 -> 128"),
    (27378, 2304, 256, "stage3 im2col: 117^2*B2, 9*256 -> 256"),
    (8192, 8192, 8192, "square peak control"),
]


def timeit(name, fn, *a, iters=10, flops=0):
    o = fn(*a)
    _ = float(o.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    _ = float(o.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:56s} {dt*1e3:8.3f} ms  {flops/dt/1e12:7.1f} TFLOPs",
          flush=True)


def main():
    for m, k, n, note in SHAPES:
        # generate ON DEVICE: the axon tunnel moves ~3 MB/s host->device,
        # so transferring a (438048, 3456) bf16 operand would take ~15 min
        a = jax.jit(lambda: (jax.random.normal(
            jax.random.PRNGKey(0), (m, k), jnp.float32) * 0.1
        ).astype(jnp.bfloat16))()
        b = jax.jit(lambda: (jax.random.normal(
            jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.1
        ).astype(jnp.bfloat16))()

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        fl = 2 * m * k * n
        timeit(f"mm {m}x{k}x{n} ({note})", jax.jit(mm), a, b, flops=fl)


if __name__ == "__main__":
    main()
