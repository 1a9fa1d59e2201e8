"""TPU perf-regression gate: fail fast if the hot path got slower.

Run BEFORE committing any engine/ops change (this is the check that would
have caught the reverted lo-slot kernels: a 39% regression at 10k landed
because commits were made without a TPU measurement).  Exits nonzero and
prints a FAIL line if any scale exceeds its pinned budget.

Budgets are the round-5 measured bests plus ~5% relay-timing margin
(CLAUDE.md pins relay variance at ~1%; anything past 5% is a real
regression, find it before committing):

    1k  (megakernel path)  13.3 us/step measured -> budget 14.0
    10k (big-table path)   90.7 us/step measured -> budget 94.5

Usage: python scripts/perfcheck.py [--quick]
  --quick: 10k only (one compile, ~1 min after warmup).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

BUDGETS_US = {1_000: 14.0, 10_000: 94.5}


def measure(n: int, steps: int = 60_000, calls: int = 2) -> float:
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu.engine import make_run_chunk
    from particlerobotsimulations_tpu.engine_table import gate_seg

    params = SimParams(
        n_cells=n, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0,
    )
    sim = Simulation(params)
    run = make_run_chunk(params)
    seg = gate_seg(params.validate())
    aligned = seg > 0 and steps % seg == 0
    # settle the adaptive cadence before timing (same protocol as bench.py):
    # chunk 1 probes the HEX relaxation transient (withholds K=8), chunk 2
    # measures steady state, chunk 3 compiles + runs the certified K=8
    # program — one warmup would leave the K=8 compile INSIDE a timed call
    # and the gate would silently measure the K=4 path instead of what
    # production runs
    warmups = 3 if params.validate().adaptive_rebuild() else 1
    state = sim.state
    for _ in range(warmups):
        state = run(state, steps, aligned)
    # relay gotcha: block_until_ready does not block — sync via device_get
    np.asarray(jax.device_get(state.step))
    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        state = run(state, steps, aligned)
        np.asarray(jax.device_get(state.step))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(
        np.asarray(jax.device_get(state.pos))[: params.n_cells]
    ).all()
    return best / steps * 1e6


def main() -> int:
    scales = [10_000] if "--quick" in sys.argv else sorted(BUDGETS_US)
    ok = True
    for n in scales:
        us = measure(n)
        budget = BUDGETS_US[n]
        line = {
            "n_bots": n,
            "us_per_step": round(us, 2),
            "budget_us": budget,
            "status": "PASS" if us <= budget else "FAIL",
        }
        ok &= us <= budget
        print(json.dumps(line))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
