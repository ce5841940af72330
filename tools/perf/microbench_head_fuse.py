"""Measure SeparateHead branch-conv fusion at bench scale (468x468, b2).

The CenterHead runs 5 independent branch stacks on the SAME shared-conv
output x (468x468x64): hidden Conv3x3(64->64)+BN+relu per branch, then a
tiny final conv.  Five narrow-N convs sit on the v5e MXU's N=64 cliff; ONE
Conv3x3(64->320) computes the identical math (output slices see disjoint
kernel slices; BN is per-channel) at N=320 = full lanes.

Times, fwd and fwd+bwd (param grads, the train-step shape):
  sep5   five Conv3x3(64->64) + per-branch final conv(64->co)
  fused  one Conv3x3(64->320), split, per-branch final conv
  fusedM one Conv3x3(64->320) + ONE masked final conv(320->11)
         (block-diagonal weight mask keeps branch independence)

Decides whether models/dense_heads/center_head.py grows a fused compute
path (param tree unchanged via concat-at-call, or importer-level fusion).
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
import numpy as np

ITERS = int(os.environ.get("HF_ITERS", 20))
B, H, W, C = 2, 468, 468, 64
OUTS = [2, 1, 3, 2, 3]  # center, center_z, dim, rot, hm
NB = len(OUTS)


def conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv3b(x, w, b):
    return conv3(x, w) + b


def make_params(key):
    ks = jax.random.split(key, 4 * NB)
    hid = [jax.random.normal(ks[i], (3, 3, C, C), jnp.bfloat16) * 0.05
           for i in range(NB)]
    fin_w = [jax.random.normal(ks[NB + i], (3, 3, C, OUTS[i]),
                               jnp.bfloat16) * 0.05 for i in range(NB)]
    fin_b = [jnp.zeros((OUTS[i],), jnp.bfloat16) for i in range(NB)]
    return hid, fin_w, fin_b


def sep5(params, x):
    hid, fin_w, fin_b = params
    outs = []
    for i in range(NB):
        h = jax.nn.relu(conv3(x, hid[i]))
        outs.append(conv3b(h, fin_w[i], fin_b[i]))
    return outs


def fused(params, x):
    hid, fin_w, fin_b = params
    wcat = jnp.concatenate(hid, axis=-1)  # (3,3,64,320)
    h = jax.nn.relu(conv3(x, wcat))
    outs = []
    for i in range(NB):
        hs = h[..., i * C : (i + 1) * C]
        outs.append(conv3b(hs, fin_w[i], fin_b[i]))
    return outs


def fused_masked(params, x):
    hid, fin_w, fin_b = params
    wcat = jnp.concatenate(hid, axis=-1)
    h = jax.nn.relu(conv3(x, wcat))
    total = sum(OUTS)
    wfin = jnp.zeros((3, 3, NB * C, total), jnp.bfloat16)
    off = 0
    for i in range(NB):
        wfin = jax.lax.dynamic_update_slice(
            wfin, fin_w[i], (0, 0, i * C, off))
        off += OUTS[i]
    bfin = jnp.concatenate(fin_b)
    out = conv3b(h, wfin, bfin)
    outs, off = [], 0
    for i in range(NB):
        outs.append(out[..., off : off + OUTS[i]])
        off += OUTS[i]
    return outs


def loss_of(fn):
    def f(params, x):
        outs = fn(params, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
    return f


def timeit(name, fn, params, x):
    # chain_time (dependent iterations in one executable + host-fetch
    # barrier): open-loop timing lies under the axon runtime — see
    # tools/perf/tpu_timeit.py.  x goes first (the perturbed operand).
    from tools.perf.tpu_timeit import chain_time

    dt = chain_time(lambda xx, pp: fn(pp, xx), (x, params), iters=ITERS)
    print(f"{name:22s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    x = jax.random.normal(jax.random.PRNGKey(9), (B, H, W, C),
                          jnp.bfloat16) * 0.3
    params = make_params(jax.random.PRNGKey(1))

    # numeric identity check
    a = jax.jit(sep5)(params, x)
    bf = jax.jit(fused)(params, x)
    bm = jax.jit(fused_masked)(params, x)
    for i in range(NB):
        np.testing.assert_allclose(np.asarray(a[i], np.float32),
                                   np.asarray(bf[i], np.float32),
                                   atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(a[i], np.float32),
                                   np.asarray(bm[i], np.float32),
                                   atol=1e-2, rtol=1e-2)
    print("identity OK")

    for name, fn in [("sep5", sep5), ("fused", fused),
                     ("fused_masked", fused_masked)]:
        timeit(f"{name} fwd", fn, params, x)
        timeit(f"{name} fwd+bwd", jax.grad(loss_of(fn)), params, x)


if __name__ == "__main__":
    main()
