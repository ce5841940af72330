"""Drive the Pallas stamp kernel on the real TPU at bench scale.

Parity vs the XLA scatter reference path + chain-timed ms/call for both,
at Waymo pillar scale (B=2, N=500 objects, C=3, 468x468 canvas, R=16).

Usage (ambient axon env, serialize with other tunnel users):
    PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/perf/drive_stamp.py
"""
from __future__ import annotations

import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools", "perf"))

import numpy as np
import jax
import jax.numpy as jnp

from com_tpu.ops import gaussian as G
from com_tpu.ops.pallas import stamp as S
from tpu_timeit import chain_time

B, N, C, H, W, RMAX = 2, 500, 3, 468, 468, 16


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    centers = jnp.asarray(np.stack(
        [rng.randint(0, W, (B, N)), rng.randint(0, H, (B, N))], -1), jnp.int32)
    radii = jnp.asarray(rng.randint(0, RMAX + 2, (B, N)), jnp.int32)
    cls = jnp.asarray(rng.randint(0, C, (B, N)), jnp.int32)
    vals = jnp.asarray(rng.uniform(0.5, 1.5, (B, N)).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, N) > 0.2)

    pallas_gauss = jax.jit(lambda c, r, k, v: S.stamp_windows(
        c, r, k, jnp.zeros_like(r, jnp.float32), v, C, H, W, "gauss",
        fill=0.0, max_radius=RMAX))
    xla_gauss = jax.jit(lambda c, r, k, v: jax.vmap(
        lambda ci, ri, ki, vi: G.draw_gaussians(ci, ri, ki, vi, C, H, W, RMAX)
    )(c, r, k, v))

    got = np.asarray(pallas_gauss(centers, radii, cls, valid))
    want = np.asarray(xla_gauss(centers, radii, cls, valid))
    err = np.abs(got - want).max()
    print(f"gauss parity max-abs-err on TPU: {err:.2e}", flush=True)
    assert err < 5e-6, err

    pallas_lw = jax.jit(lambda c, r, k, vv, v: S.stamp_windows(
        c, r, k, vv, v, C, H, W, "last_wins", fill=1.0, max_radius=RMAX))
    base = jnp.ones((C, H, W), jnp.float32)
    xla_lw = jax.jit(lambda c, r, k, vv, v: jax.vmap(
        lambda ci, ri, ki, vvi, vi: G.stamp_squares_last_wins(
            base, ci, ri, ki, vvi, vi, RMAX)
    )(c, r, k, vv, v))
    got = np.asarray(pallas_lw(centers, radii, cls, vals, valid))
    want = np.asarray(xla_lw(centers, radii, cls, vals, valid))
    err = np.abs(got - want).max()
    print(f"last_wins parity max-abs-err on TPU: {err:.2e}", flush=True)
    assert err < 1e-6, err

    it = int(os.environ.get("STAMP_ITERS", 30))
    dt = chain_time(lambda r: pallas_gauss(centers, r, cls, valid),
                    (radii,), iters=it)
    print(f"pallas gauss       {dt*1e3:8.2f} ms", flush=True)
    dt = chain_time(lambda r: xla_gauss(centers, r, cls, valid),
                    (radii,), iters=it)
    print(f"xla    gauss       {dt*1e3:8.2f} ms", flush=True)
    dt = chain_time(lambda r: pallas_lw(centers, r, cls, vals, valid),
                    (radii,), iters=it)
    print(f"pallas last_wins   {dt*1e3:8.2f} ms", flush=True)
    dt = chain_time(lambda r: xla_lw(centers, r, cls, vals, valid),
                    (radii,), iters=it)
    print(f"xla    last_wins   {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
