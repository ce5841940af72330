"""A/B the FULL train step: dot9 wgrad (default) vs XLA's native transpose
emitter (COM_TPU_WGRAD=xla).

The device trace (profile_step.py) attributed ~22 ms/step to `copy` ops
feeding dot9's nine shifted input views; the isolated microbench
(microbench_wgrad_xla.py) says dot9 wins 1.3-1.6x per-op.  Only the full
program decides.  The knob is read at trace time, so one process can build
and time both variants against the same donated state.

Usage (TPU): PYTHONPATH=/root/repo python -u tools/perf/ab_wgrad_step.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

BATCH, NUM_POINTS, ITERS, REPEATS = 2, 163840, 20, 3


def build():
    import __graft_entry__ as ge
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step

    cfg, meta, net, batch = ge._build(batch_size=BATCH,
                                      num_points=NUM_POINTS,
                                      num_max_objs=500)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=30000, steps_per_epoch=1000)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    grid = meta.grid_size
    step_fn = make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta,
                              tx, (grid[1], grid[0]))
    return step_fn, state, jax.device_put(batch)


def time_variant(step_fn, state, batch, label):
    # fresh closure per variant — jax.jit caches on function identity, so
    # jitting the same step_fn object twice would silently reuse variant A's
    # executable and never re-read the env knob
    step = jax.jit(lambda s, b, e: step_fn(s, b, e), donate_argnums=(0,))
    for _ in range(3):
        state, metrics = step(state, batch, 0)
    float(metrics["loss"])
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, batch, 0)
        float(metrics["loss"])
        rates.append(BATCH * ITERS / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    print(f"{label:24s} {med:7.3f} scenes/s  "
          f"({1000*BATCH/med:.1f} ms/step)  spread "
          f"[{rates[0]:.3f}, {rates[-1]:.3f}]", flush=True)
    return state, med


def main():
    step_fn, state, batch = build()
    os.environ.pop("COM_TPU_WGRAD", None)
    state, dot9 = time_variant(step_fn, state, batch, "wgrad=dot9 (default)")
    os.environ["COM_TPU_WGRAD"] = "xla"
    state, xla = time_variant(step_fn, state, batch, "wgrad=xla")
    os.environ.pop("COM_TPU_WGRAD", None)
    print(f"ratio xla/dot9 = {xla/dot9:.3f}")


if __name__ == "__main__":
    main()
