"""A/B the FULL train step: Pallas conv3x3 route (default) vs XLA's conv
emitter for everything (COM_TPU_CONV=xla).

The 2026-08-18 A/B was a tie (11.64 vs 11.63 scenes/s), but the program has
changed since (window-stamp kernel, host presort, xla-native wgrad default);
the 2026-08-20 trace attributes ~21.7 ms/step of `copy` + ~17 ms of
pad/maximum/bitcast fusions to the Pallas kernels' blocked-layout
conversions, so the question is live again.  The knob is trace-time, so one
process times both against the same donated state.

Usage (TPU): PYTHONPATH=/root/repo python -u tools/perf/ab_conv_step.py
"""
from __future__ import annotations

import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
for p in (REPO, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

from ab_wgrad_step import build, time_variant  # noqa: E402


def main():
    step_fn, state, batch = build()
    os.environ.pop("COM_TPU_CONV", None)
    state, pallas = time_variant(step_fn, state, batch, "conv=pallas (default)")
    os.environ["COM_TPU_CONV"] = "xla"
    state, xla = time_variant(step_fn, state, batch, "conv=xla")
    os.environ.pop("COM_TPU_CONV", None)
    print(f"ratio xla/pallas = {xla/pallas:.3f}")


if __name__ == "__main__":
    main()
