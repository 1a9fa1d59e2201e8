"""Dev throughput probe: ms/step at a given bot count on the real TPU.

Usage: python scripts/devbench.py [n_bots] [steps_per_call] [n_calls] [world_half] [key=value ...]

Trailing ``key=value`` arguments override any ``SimParams`` field (ints,
floats and enum names are coerced from the field's current type), e.g.
``slot_rebuild_steps=8 overflow_slots=0 grid_dim=512`` — the large-N
tail probe runs exactly these variants.

``world_half`` defaults to 0 = AUTO-FIT from the placement extent, so
any bot count runs hands-free (the 1M HEX blob spans +-89.4 units and
auto-fits to a 114-unit half-world; the reference-parity 64 would clamp
the outer bots at the walls and the measured "physics" would be a
pileup ring, not a swarm).  Pass an explicit value to pin the box.

Measures the single-scene table-resident loop exactly like bench.py but
with configurable chunk length, and prints per-call wall times so the
relay dispatch latency (~24 ms fixed, CLAUDE.md) is visible and can be
amortized with longer chunks.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
CALLS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
WORLD_HALF = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0  # 0 = auto-fit
OVERRIDES = dict(a.split("=", 1) for a in sys.argv[5:])


def _sync(state):
    return np.asarray(jax.device_get(state.step))


def main():
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu.engine import make_run_chunk
    from particlerobotsimulations_tpu.engine_table import gate_seg

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0, world_half=WORLD_HALF,
    )
    if OVERRIDES:
        from _overrides import parse_overrides

        params = parse_overrides(params, OVERRIDES)
    sim = Simulation(params)
    params = sim.params  # world_half auto-fit resolved (Simulation errors
    # on an explicit undersized box, so no fit assert is needed here)
    if params.world_half != WORLD_HALF:
        print(f"world_half auto-fit: {params.world_half:g}")
    run = make_run_chunk(params)
    seg = gate_seg(params.validate())
    aligned = seg > 0 and STEPS % seg == 0
    print(f"gate segment: {seg} steps, aligned fast path: {aligned}")

    t0 = time.perf_counter()
    state = run(sim.state, STEPS, aligned)
    _sync(state)
    print(f"warmup+compile: {time.perf_counter() - t0:.1f} s")
    if aligned and params.validate().adaptive_rebuild():
        # settle the speed-certified cadence (transient probe -> steady
        # probe -> certified-K compile) so the timed calls measure the
        # steady state; see bench.py
        for _ in range(2):
            state = run(state, STEPS, aligned)
            _sync(state)
        print(f"adaptive cadence settled: k={run.live['k']} "
              f"(probe {run.last_probe:.2f} u/s)")

    best = float("inf")
    for i in range(CALLS):
        t0 = time.perf_counter()
        state = run(state, STEPS, aligned)
        _sync(state)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(
            f"call {i}: {dt * 1e3:.1f} ms -> {dt / STEPS * 1e6:.2f} us/step"
            f"  ({N * STEPS / dt / 1e6:.1f}M particle-steps/s)"
        )
    pos = np.asarray(jax.device_get(state.pos))[: params.n_cells]
    assert np.isfinite(pos).all()
    print(
        f"best: {best / STEPS * 1e6:.2f} us/step = "
        f"{N * STEPS / best / 1e6:.1f}M particle-steps/s"
    )


if __name__ == "__main__":
    main()
