"""Measure the sweep execution-strategy crossover on real TPU.

Times ``run_sweep`` itself (the shipped path, including per-seed host
placement and centroid recording) for both strategies at each size, so the
numbers ARE the policy `choose_sweep_strategy` encodes.

Usage: python scripts/sweepbench.py [sizes_csv] [n_seeds] [steps] [strategies_csv]
       python scripts/sweepbench.py 300,1000,4000 8 6000
       python scripts/sweepbench.py 300 32 30000 batched,packed
"""

from __future__ import annotations

import sys
import time

import numpy as np

SIZES = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "300,1000,4000").split(",")]
SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 30000
STRATS = tuple(
    (sys.argv[4] if len(sys.argv) > 4 else "sequential,batched").split(",")
)


def main():
    from particlerobotsimulations_tpu import Config, SimParams
    from particlerobotsimulations_tpu.parallel.sweep import run_sweep

    for n in SIZES:
        params = SimParams(
            n_cells=n, n_dead=0, seed=7, config=Config.HEX,
            light_x=-20.0, light_y=0.0,
        )
        seeds = list(range(SEEDS))
        row = {}
        for strat in STRATS:
            # record cadence = the scenario dump interval, exactly like a
            # real `cli sweep` run; warmup compiles, the second call is
            # timed (it still pays per-seed host placement — honest: every
            # sweep invocation does)
            run_sweep(params, seeds, STEPS, strategy=strat)
            t0 = time.perf_counter()
            _, cents = run_sweep(params, seeds, STEPS, strategy=strat)
            dt = time.perf_counter() - t0
            assert np.isfinite(cents).all()
            row[strat] = n * STEPS * SEEDS / dt / 1e6
            print(
                f"n={n} {strat}: {dt:.2f} s -> {row[strat]:.1f} M "
                f"particle-steps/s aggregate", flush=True,
            )
        win = max(row, key=row.get)
        print(f"n={n} winner: {win} ({row[win]:.1f} vs "
              f"{min(row.values()):.1f} M)", flush=True)


if __name__ == "__main__":
    main()
