"""Learned actuation vs the hand-designed light law (VERDICT r2 #5).

Optimizes per-bot phase offsets by backprop through the full contact
dynamics (models/optimize.py) at 1k bots and compares the resulting
phototaxis displacement against the reference's hand-designed law
phase = (min_d - dist) / (2 min_radius) * rise_period
(/root/reference/particlebot_kernel_impl.cuh:286) over the SAME horizon,
from the SAME initial state, with noise off.

Optimization uses a SHORT horizon (gradients through the stiff contact
dynamics explode exponentially — see models.optimize._grad_guard — so
long-horizon BPTT is noise); the learned phases are then EVALUATED on the
long horizon against the hand law.

Usage: python scripts/learn_phases.py [n_bots] [eval_steps] [iters] [opt_steps]
Writes the loss history to artifacts/learn_phases.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 250
OPT_STEPS = int(sys.argv[4]) if len(sys.argv) > 4 else 400


def main():
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu.engine import make_run_chunk
    from particlerobotsimulations_tpu.models.optimize import (
        make_phase_rollout,
        optimize_phases,
    )
    from particlerobotsimulations_tpu.ops.phase import light_distance
    from particlerobotsimulations_tpu.state import active_mask

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0, phase_std=0.0,
    ).validate()
    sim = Simulation(params)
    state0 = sim.state
    n_pad = state0.pos.shape[0]
    mask = np.asarray(active_mask(params, n_pad))

    def centroid_x(state):
        pos = np.asarray(jax.device_get(state.pos))
        return float(pos[mask, 0].mean())

    x0 = centroid_x(state0)

    # --- baseline 1: hand-designed light-wave law (the reference law) ----
    t0 = time.perf_counter()
    hand = make_run_chunk(params)(jax.tree.map(jnp.copy, state0), STEPS)
    dx_hand = centroid_x(hand) - x0
    print(f"hand law:      dx = {dx_hand:+.5f} over {STEPS} steps "
          f"({time.perf_counter() - t0:.0f} s)")

    # --- baseline 2: the hand phases FROZEN (no re-updates) --------------
    # the optimizer's search space is a fixed phase vector; this is the
    # like-for-like baseline it must beat
    dists = np.asarray(light_distance(params, state0.pos))
    min_d = dists[mask].min()
    hand_phase = jnp.asarray(
        np.where(
            mask, (min_d - dists) / (2.0 * params.min_radius)
            * params.rise_period, 0.0
        ),
        jnp.float32,
    )
    rollout = jax.jit(make_phase_rollout(params, STEPS))
    dx_frozen = float(rollout(hand_phase, state0)) - x0
    print(f"frozen hand:   dx = {dx_frozen:+.5f}")

    # --- learned: warm-start Adam from the hand phases -------------------
    # short-horizon optimization (see module docstring), long-horizon eval
    t0 = time.perf_counter()
    ph, hist = optimize_phases(
        params, state0, n_steps=OPT_STEPS, iters=ITERS, lr=0.05,
        minimize=True, phase0=hand_phase,
    )
    dt = time.perf_counter() - t0
    dx_learn = float(rollout(jnp.asarray(ph), state0)) - x0
    print(f"learned:       dx = {dx_learn:+.5f} on the {STEPS}-step eval "
          f"({ITERS} Adam iters on a {OPT_STEPS}-step horizon, "
          f"{dt:.0f} s, {dt / max(ITERS, 1):.1f} s/iter)")
    print(f"short-horizon objective: {hist[0]:+.5f} -> {hist[-1]:+.5f} "
          f"(min {min(hist):+.5f})")
    print(f"improvement vs frozen hand: {dx_frozen - dx_learn:+.5f} "
          f"({(dx_learn / dx_frozen - 1) * 100 if dx_frozen else 0:+.1f}% "
          f"more -x displacement)" if dx_learn < dx_frozen else
          f"no improvement vs frozen hand ({dx_learn:+.5f} vs {dx_frozen:+.5f})")

    os.makedirs("artifacts", exist_ok=True)
    out_path = f"artifacts/learn_phases_{N}.json"
    with open(out_path, "w") as f:
        json.dump(
            {
                "n_bots": N, "eval_steps": STEPS, "iters": ITERS,
                "opt_steps": OPT_STEPS,
                "x0": x0, "dx_hand_law": dx_hand,
                "dx_frozen_hand_phases": dx_frozen,
                "dx_learned": float(dx_learn),
                "objective_history_centroid_x": [float(v) for v in hist],
            },
            f, indent=1,
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
