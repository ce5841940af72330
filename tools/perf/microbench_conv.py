"""On-TPU benchmark: Pallas 3x3 conv kernel vs XLA conv at BEV-backbone
shapes.  Prints ms + effective TFLOPs per shape for fwd and fwd+bwd."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from com_tpu.ops.pallas.conv2d import conv3x3  # noqa: E402

SHAPES = [
    (2, 468, 468, 64, 64),     # backbone stage1 / head branches
    (2, 468, 468, 384, 64),    # head shared conv
    (2, 234, 234, 128, 128),   # stage2
    (2, 117, 117, 256, 256),   # stage3
]


def timeit(name, fn, *a, iters=10, flops=0):
    o = fn(*a)
    _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOPs",
          flush=True)


def conv3x3_shiftmm(x, k):
    """3x3 conv as 9 shifted (BHW, Cin)@(Cin, Cout) matmuls.

    Candidate for when XLA's native conv emitter underperforms: every tap is
    a plain MXU matmul over the flattened spatial axis, accumulated in f32.
    """
    b, h, w, cin = x.shape
    cout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + w, :]
            acc = acc + jax.lax.dot_general(
                xs.reshape(b * h * w, cin), k[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(b, h, w, cout)
    return acc.astype(x.dtype)


def conv3x3_rowmm(x, k):
    """3x3 conv as one (BHW, 3*3*Cin)@(3*3*Cin, Cout) matmul per row band.

    im2col across the 3-row window only (gathered via 3 row-shifted views
    concatenated on channels), so the patch tensor stays 3x the input, and
    the contraction dim is 9*Cin (wide MXU contraction).
    """
    b, h, w, cin = x.shape
    cout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = jnp.concatenate(
        [xp[:, dy : dy + h] for dy in range(3)], axis=-1
    )  # (B, H, W+2, 3*Cin)
    patches = jnp.concatenate(
        [rows[:, :, dx : dx + w] for dx in range(3)], axis=-1
    )  # (B, H, W, 9*Cin) with taps ordered (dx, dy, c)
    kk = k.transpose(1, 0, 2, 3).reshape(9 * cin, cout)
    y = jax.lax.dot_general(
        patches.reshape(b * h * w, 9 * cin), kk,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(b, h, w, cout).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    for b, h, w, cin, cout in SHAPES:
        x = jnp.asarray((rng.randn(b, h, w, cin) * 0.3).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.05).astype(np.float32)
                        ).astype(jnp.bfloat16)
        fl = 2 * b * h * w * 9 * cin * cout

        def chain2_pallas(x, k):
            y = conv3x3(x, k, "tpu")
            if cin == cout:
                y = conv3x3(y, k, "tpu")
            return y

        def chain2_xla(x, k):
            y = conv3x3(x, k, "cpu")  # lax.conv path
            if cin == cout:
                y = conv3x3(y, k, "cpu")
            return y

        n = 2 if cin == cout else 1
        tag = f"{h}x{w} {cin}->{cout}"
        timeit(f"pallas fwd x{n} {tag}", jax.jit(chain2_pallas), x, k,
               flops=n * fl)
        timeit(f"xla    fwd x{n} {tag}", jax.jit(chain2_xla), x, k,
               flops=n * fl)

        def chain2_shiftmm(x, k):
            y = conv3x3_shiftmm(x, k)
            if cin == cout:
                y = conv3x3_shiftmm(y, k)
            return y

        def chain2_rowmm(x, k):
            y = conv3x3_rowmm(x, k)
            if cin == cout:
                y = conv3x3_rowmm(y, k)
            return y

        timeit(f"shftmm fwd x{n} {tag}", jax.jit(chain2_shiftmm), x, k,
               flops=n * fl)
        timeit(f"rowmm  fwd x{n} {tag}", jax.jit(chain2_rowmm), x, k,
               flops=n * fl)

        # grad wrt k with x as an ARGUMENT (argnums=1): closing over x would
        # bake a hundreds-of-MB constant into the jaxpr, which the axon
        # remote-compile tunnel rejects (HTTP 413 body-length limit)
        gp = jax.jit(jax.grad(
            lambda x, k: (chain2_pallas(x, k).astype(jnp.float32) ** 2).mean(),
            argnums=1))
        gx = jax.jit(jax.grad(
            lambda x, k: (chain2_xla(x, k).astype(jnp.float32) ** 2).mean(),
            argnums=1))
        gs = jax.jit(jax.grad(
            lambda x, k: (chain2_shiftmm(x, k).astype(jnp.float32) ** 2).mean(),
            argnums=1))
        gr = jax.jit(jax.grad(
            lambda x, k: (chain2_rowmm(x, k).astype(jnp.float32) ** 2).mean(),
            argnums=1))
        timeit(f"pallas fwd+bwd {tag}", gp, x, k, flops=3 * n * fl)
        timeit(f"xla    fwd+bwd {tag}", gx, x, k, flops=3 * n * fl)
        timeit(f"shftmm fwd+bwd {tag}", gs, x, k, flops=3 * n * fl)
        timeit(f"rowmm  fwd+bwd {tag}", gr, x, k, flops=3 * n * fl)

        # parity of the matmul formulations vs the XLA conv oracle
        rr = jax.jit(lambda x, k: conv3x3(x, k, "cpu"))(x, k)
        for nm, f2 in (("shftmm", conv3x3_shiftmm), ("rowmm", conv3x3_rowmm)):
            aa = jax.jit(f2)(x, k)
            err = float(jax.jit(
                lambda a, r: jnp.abs(a.astype(jnp.float32) -
                                     r.astype(jnp.float32)).max())(aa, rr))
            print(f"  parity err {nm} {tag}: {err:.3e}", flush=True)

        # parity on device
        a = jax.jit(lambda x, k: conv3x3(x, k, "tpu"))(x, k)
        r = jax.jit(lambda x, k: conv3x3(x, k, "cpu"))(x, k)
        err = float(jax.jit(
            lambda a, r: jnp.abs(a.astype(jnp.float32) -
                                 r.astype(jnp.float32)).max())(a, r))
        print(f"  parity err {tag}: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
