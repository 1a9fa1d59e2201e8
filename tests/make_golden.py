"""Generate golden centroid-trajectory fixtures (CPU, deterministic).

Usage: python tests/make_golden.py   (from the repo root)

Each shipped scenario is shrunk (fewer bots / shorter horizon) so the
regression suite stays fast while still exercising every feature: obstacles,
dead cells, payload transport, the wall gap.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# name -> (cfg path, param overrides, sim seconds to run)
SCENARIOS = {
    "example": (f"{REPO}/examples/example.cfg", dict(n_cells=64), 240.0),
    "dead_cells": (f"{REPO}/examples/example_dead_cells.cfg", dict(n_cells=60), 240.0),
    "obstacle": (f"{REPO}/examples/example_obstacle.cfg", dict(n_cells=64), 240.0),
    "gap": (f"{REPO}/examples/example_gap.cfg", dict(n_cells=64), 240.0),
    "transport": (
        f"{REPO}/examples/example_object_transport.cfg",
        dict(n_cells=61),
        240.0,
    ),
}

RECORD_EVERY_STEPS = 1000  # 10 sim-seconds


def run_scenario(name):
    import numpy as np

    from particlerobotsimulations_tpu import Simulation, load_cfg

    cfg, overrides, sim_seconds = SCENARIOS[name]
    params = load_cfg(cfg).replace(max_time=sim_seconds, **overrides)
    sim = Simulation(params)
    n_steps = params.n_steps()
    cents = [sim.centroid()]
    done = 0
    while done < n_steps:
        chunk = min(RECORD_EVERY_STEPS, n_steps - done)
        sim.step_chunk(chunk)
        done += chunk
        cents.append(sim.centroid())
    return np.stack(cents)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in sorted(SCENARIOS):
        cents = run_scenario(name)
        np.savez(os.path.join(GOLDEN_DIR, f"{name}.npz"), centroids=cents)
        print(f"{name}: {cents.shape[0]} records, final centroid {cents[-1]}")


if __name__ == "__main__":
    main()
