"""Capture a device-op profile of the real flagship train step.

Writes a jax.profiler trace of a few steps to output/perf/profile/ and, if
the xplane comes back through the axon tunnel, prints the top device ops by
self-time so step-time attribution comes from the REAL fused program, not
surrogate per-stage jits.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/perf/profile_step.py
"""
from __future__ import annotations

import glob
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

LOGDIR = os.path.join(REPO, "output", "perf", "profile")


def main():
    import __graft_entry__ as ge
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step, conf_shape_for

    cfg, meta, net, batch = ge._build(batch_size=2, num_points=163840,
                                      num_max_objs=500)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=30000, steps_per_epoch=1000)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    grid = meta.grid_size
    step_fn = make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta,
                              tx, (grid[1], grid[0]))
    step = jax.jit(step_fn, donate_argnums=(0,))
    batch = jax.device_put(batch)

    for _ in range(3):
        state, metrics = step(state, batch, 0)
    print("warm, loss =", float(metrics["loss"]), flush=True)

    os.makedirs(LOGDIR, exist_ok=True)
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            state, metrics = step(state, batch, 0)
        _ = float(metrics["loss"])
    print("trace captured", flush=True)

    planes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                       recursive=True)
    print("xplane files:", planes, flush=True)
    if planes:
        summarize(sorted(planes)[-1])


def summarize(path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception:
        from tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"--- plane: {plane.name}")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            tot_ps = sum(ev.duration_ps for ev in line.events)
            print(f"  line {line.name!r}: {len(line.events)} events, "
                  f"{tot_ps/1e9/3:.2f} ms/step summed")
        # Per-op detail from the busiest non-module line ("XLA Ops"-style):
        # group by HLO opcode category so async copies don't double count.
        for line in plane.lines:
            if "module" in line.name.lower() or "step" in line.name.lower():
                continue
            if not line.events:
                continue
            cats, names = {}, {}
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                op = name.split(" = ", 1)[0].lstrip("%")
                cat = op.split(".", 1)[0]
                cats[cat] = cats.get(cat, 0) + ev.duration_ps
                names[name] = names.get(name, 0) + ev.duration_ps
            tot = sum(cats.values())
            if tot == 0:
                continue
            print(f"  === line {line.name!r} by category (ms/step over 3 steps)")
            for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
                print(f"    {ps/1e9/3:10.3f} ms  {100*ps/tot:5.1f}%  {cat}")
            print(f"  === top individual ops")
            for name, ps in sorted(names.items(), key=lambda kv: -kv[1])[:25]:
                print(f"    {ps/1e9/3:10.3f} ms  {100*ps/tot:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
