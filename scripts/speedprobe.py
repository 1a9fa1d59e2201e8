"""Adaptive-cadence probe measurement: what neighbor_rel_speed_bound reports
on real runs, per chunk, against the K=8 certificate.

Usage: python scripts/speedprobe.py [n_bots] [chunks] [steps_per_chunk] [key=value ...]

Runs the ADAPTIVE runner (engine_table.make_adaptive_run_chunk) for a few
chunks and prints each chunk's measured closing-speed bound, the certified
cadence it picked, and wall time — the measurement basis for the
slot_rebuild_steps = -1 auto default.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 6000
OVERRIDES = dict(a.split("=", 1) for a in sys.argv[4:])


def main():
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu.engine_table import (
        certified_closing_bound,
        make_adaptive_run_chunk,
    )

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0, world_half=0.0,
    )
    if OVERRIDES:
        from _overrides import parse_overrides

        params = parse_overrides(params, OVERRIDES)
    sim = Simulation(params)
    params = sim.params
    state = sim.state
    b8 = certified_closing_bound(params.validate(), 8)
    print(f"n={N} chunks={CHUNKS}x{STEPS} bound8={b8:.3f} u/s")

    runner = make_adaptive_run_chunk(params)
    for i in range(CHUNKS):
        t0 = time.perf_counter()
        state = runner(state, STEPS, True)
        np.asarray(jax.device_get(state.step))
        dt = time.perf_counter() - t0
        pm = runner.last_probe
        print(
            f"chunk {i}: acted-on probe="
            + (f"{pm:.3f} u/s" if pm is not None else "(none yet)")
            + f" -> k={runner.live['k']}"
            f"  ({dt * 1e3:.0f} ms incl. compile, "
            f"{dt / STEPS * 1e6:.2f} us/step)"
        )
    pos = np.asarray(jax.device_get(state.pos))[: params.n_cells]
    assert np.isfinite(pos).all()
    print("final state finite; centroid", pos.mean(0))


if __name__ == "__main__":
    main()
