"""Tool-window guard for TPU benches.

The agent Bash tool SIGTERMs at its timeout, and a SIGTERM with device
work in flight wedges the axon tunnel (CLAUDE.md). The dominant
variance is the one-time backend init handshake (measured 23-500 s in
degraded windows while steady dispatch stayed at 0.03 s), so a bench
can't know at launch whether it fits. This guard lets it find out AT
PHASE BOUNDARIES — points where a readback barrier has just drained all
device work — and exit CLEANLY instead of running into the tool's
SIGTERM.

Usage: set VRT_WINDOW_S (seconds of wall budget from process start,
e.g. 560 for a 600 s tool call) and call ``checkpoint("phase", need_s)``
after each barrier with an estimate of the REMAINING work. Without the
env var the guard is inert (driver runs stay untouched).

The clock starts at first import — import this before jax so the
backend init is inside the budget.
"""

import json
import os
import sys
import time

_T0 = time.time()


def left() -> float:
    """Seconds remaining in the window (inf when VRT_WINDOW_S unset)."""
    budget = float(os.environ.get("VRT_WINDOW_S", "inf"))
    return budget - (time.time() - _T0)


def checkpoint(phase: str, need_s: float, barrier=None, **extra) -> None:
    """Exit 3 with a one-line JSON verdict if ``need_s`` doesn't fit.

    Call at a drained point (right after a float()/int() readback
    barrier), or pass ``barrier`` — a callable that drains in-flight
    device work, invoked only when the guard is armed: exiting with
    work in flight is exactly the wedge this guard exists to avoid.
    """
    if left() == float("inf"):
        return
    if barrier is not None:
        barrier()
    remaining = left()
    if remaining < need_s:
        print(json.dumps({
            "aborted_at": phase,
            "window_left_s": round(remaining, 1),
            "estimated_need_s": need_s,
            "elapsed_s": round(time.time() - _T0, 1),
            **extra,
        }), flush=True)
        sys.exit(3)
