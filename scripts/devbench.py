"""Dev throughput probe: ms/step at a given bot count on the real TPU.

Usage: python scripts/devbench.py [n_bots] [steps_per_call] [n_calls] [world_half] [key=value ...]

Trailing ``key=value`` arguments override any ``SimParams`` field (ints,
floats and enum names are coerced from the field's current type), e.g.
``slot_rebuild_steps=8 overflow_slots=0 grid_dim=512`` — the large-N
tail probe runs exactly these variants.

``world_half`` must be raised past the default 64 once the HEX blob
outgrows the world box (>~500k bots: the 1M blob spans +-89.4 units —
leaving the default silently clamps the outer bots at the walls and the
measured "physics" is a pileup ring, not a swarm).

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
WORLD_HALF = float(sys.argv[4]) if len(sys.argv) > 4 else 64.0
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
    pos0 = np.asarray(jax.device_get(sim.state.pos))[: params.n_cells]
    span = float(np.abs(pos0).max())
    assert span < params.world_half, (
        f"HEX blob spans +-{span:.1f} > world_half={params.world_half:g}: "
        "the boundary clamp would pile bots at the walls — pass a larger "
        "world_half (argv[4])"
    )
    run = make_run_chunk(params)
    seg = gate_seg(params.validate())
    aligned = seg > 0 and STEPS % seg == 0
    print(f"gate segment: {seg} steps, aligned fast path: {aligned}")

    t0 = time.perf_counter()
    state = run(sim.state, STEPS, aligned)
    _sync(state)
    print(f"warmup+compile: {time.perf_counter() - t0:.1f} s")

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
