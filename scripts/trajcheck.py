"""Trajectory dump for cross-process bitwise A/B of kernel env knobs.

Usage: python scripts/trajcheck.py <out.npz> [n_bots] [steps] [key=value ...]

Runs a HEX-blob phototaxis trajectory (jittered off the lattice's exact
tangencies) on the production chunk runner and saves the final pos/vel/rad
arrays.  Run twice with different PBOT_* env knobs and compare the files
bitwise — the adoption protocol for every instruction-diet lever
(CLAUDE.md; e.g. PBOT_PAIRMATH, PBOT_MAGMIN).
"""

from __future__ import annotations

import sys

import jax
import numpy as np

OUT = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
OVERRIDES = dict(a.split("=", 1) for a in sys.argv[4:])


def main():
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu.engine import make_run_chunk
    from particlerobotsimulations_tpu.engine_table import gate_seg

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0,
    )
    if OVERRIDES:
        from _overrides import parse_overrides

        params = parse_overrides(params, OVERRIDES)
    sim = Simulation(params)
    params = sim.params  # auto-fit resolution
    state = sim.state
    noise = 1e-4 * jax.random.normal(jax.random.key(99), state.pos.shape)
    state = state._replace(pos=state.pos + noise)

    run = make_run_chunk(params)
    seg = gate_seg(params.validate())
    aligned = seg > 0 and STEPS % seg == 0
    state = run(state, STEPS, aligned) if seg else run(state, STEPS)
    pos = np.asarray(jax.device_get(state.pos))
    vel = np.asarray(jax.device_get(state.vel))
    rad = np.asarray(jax.device_get(state.rad))
    assert np.isfinite(pos[: params.n_cells]).all()
    np.savez(OUT, pos=pos, vel=vel, rad=rad)
    print(f"saved {OUT}: {N} bots x {STEPS} steps, centroid "
          f"{pos[: params.n_cells].mean(0)}")


if __name__ == "__main__":
    main()
