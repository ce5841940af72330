"""Dedup-proof TPU timing: chain N dependent iterations inside ONE executable.

Open-loop timing (call fn(x) in a Python loop, block at the end) reads
nonsense under the axon remote-execution path: repeated execute requests
with identical buffers can be served from a cache, which measured a
468x468x64 conv at "1067 TFLOP/s" on a chip whose bf16 peak is ~197
(2026-08-19).  The fix is structural, not a bigger ITERS: build a jitted
fori_loop whose body perturbs one input by a scalar folded out of the
previous output, so iteration i+1 cannot start (or be deduped) before
iteration i's result exists, then time the single executable end to end.

    from tools.perf.tpu_timeit import chain_time, sanity_matmul
    dt = chain_time(lambda x, w: conv(x, w), (x, w), iters=50)

The perturbation (x * (1 + 0*mean(out))) adds one reduce + one broadcast
per step — noise against ms-scale kernels; calibrate with sanity_matmul()
whose speed-of-light is known (v5e bf16 ~197 TFLOP/s peak, big GEMMs land
60-80%).

Completion is forced by fetching a scalar reduced from the loop output to
the HOST (float(...)): on this runtime block_until_ready returns at enqueue
time (measured 2026-08-19 — a chained fori_loop still "ran" at 28 PFLOP/s
under block_until_ready; only a host fetch waits for execution).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def chain_time(fn, args, iters: int = 50, warmup: int = 2):
    """Median-of-3 per-iteration seconds for ``fn(*args)`` with a forced
    sequential dependency between iterations, measured inside one jitted
    fori_loop executable.  The first positional arg is the one perturbed;
    it must be a float array."""

    def body(_, carry):
        x0, rest = carry[0], carry[1:]
        out = fn(x0, *rest)
        leaves = jax.tree_util.tree_leaves(out)
        eps = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
        # fold a data-dependent, numerically-negligible scalar back in
        x0 = x0 * (1 + 1e-30 * eps).astype(x0.dtype)
        return (x0,) + tuple(rest)

    @jax.jit
    def run(*a):
        fin = jax.lax.fori_loop(0, iters, body, tuple(a))
        # one scalar to fetch: forces the host wait (block_until_ready is
        # a no-op enqueue-ack on this runtime)
        return jnp.mean(fin[0].astype(jnp.float32))

    def run_sync(*a):
        return float(run(*a))  # host fetch == real completion barrier

    run_sync(*args)  # compile + warm
    for _ in range(warmup - 1):
        run_sync(*args)
    # refresh the perturbed operand's BUFFER between reps (x*1.0 -> new
    # device allocation, identical values): the runtime caches whole
    # execute requests keyed on executable+input buffers, so rep 2+ with
    # the same buffers can be served without running anything.
    refresh = jax.jit(lambda v: v * jnp.ones((), v.dtype))
    a0, rest = args[0], tuple(args[1:])
    ts = []
    for _ in range(3):
        a0 = refresh(a0)
        float(jnp.mean(a0.astype(jnp.float32)))  # complete refresh pre-clock
        t0 = time.perf_counter()
        run_sync(a0, *rest)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def sanity_matmul(n: int = 4096, iters: int = 20):
    """Times an n^3 bf16 GEMM through the same harness and returns
    (ms, tflops) — compare against the chip's known peak to validate the
    harness before trusting any other number from it."""
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, n), jnp.bfloat16)
    b = jax.random.normal(k, (n, n), jnp.bfloat16)
    dt = chain_time(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16),
        (a, b), iters=iters)
    flops = 2 * n ** 3
    return dt * 1e3, flops / dt / 1e12


if __name__ == "__main__":
    ms, tf = sanity_matmul()
    print(f"sanity 4096^3 bf16 GEMM: {ms:.3f} ms  {tf:.1f} TFLOP/s "
          f"(v5e peak ~197)")
