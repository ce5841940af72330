"""A/B the optimizer update: per-leaf optax chain vs optax.flatten fusion.

The step breakdown attributes ~5.7 ms to clip+adam+apply at flagship scale
(~200 param leaves).  XLA emits one fused elementwise kernel per leaf, so
small leaves (biases, BN scales) are launch/latency-bound.  optax.flatten
concatenates every leaf into ONE vector before the transform — clip, adam
moments and the schedule then run as single wide kernels.

Usage (TPU):  PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/perf/microbench_optim.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools", "perf"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_timeit import chain_time

ITERS = int(os.environ.get("OPT_ITERS", 30))


def main():
    import __graft_entry__ as ge
    from com_tpu.train.optim import build_optimizer

    cfg, meta, net, batch = ge._build(batch_size=2, num_points=163840,
                                      num_max_objs=500)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    params = variables["params"]
    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"# {len(leaves)} leaves, {n_params/1e6:.2f} M params", flush=True)

    tx, _ = build_optimizer(params, cfg.OPTIMIZATION,
                            total_steps=30000, steps_per_epoch=1000)
    txf = optax.flatten(tx)

    for name, t in (("per-leaf", tx), ("flatten", txf)):
        opt_state = jax.jit(t.init)(params)
        flat, treedef = jax.tree_util.tree_flatten(params)

        def run(first, *rest):
            p = jax.tree_util.tree_unflatten(treedef, (first,) + rest)
            updates, _ = t.update(p, opt_state, p)
            new = jax.tree.map(lambda a, u: a + u, p, updates)
            return jax.tree_util.tree_leaves(new)[0]

        dt = chain_time(run, tuple(flat), iters=ITERS)
        print(f"{name:10s} update+apply  {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
