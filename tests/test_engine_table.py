"""Table-resident PALLAS loop (engine_table) vs the per-bot step loop.

With phase_std=0 and no dead injection the two paths compute identical
physics (the only differences are float reassociation order from the table
layout), so trajectories must agree to float32 tolerance over short runs.
RNG-bearing paths (phase noise, dead choice) differ by stream shape —
distribution-level checks only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import Config, ForceBackend, SimParams, Simulation
from particlerobotsimulations_tpu.engine import _slot_carry_fns, make_step
from particlerobotsimulations_tpu.engine_table import (
    make_run_chunk_table,
    make_run_chunk_table_batched,
)


def params_(**kw):
    base = dict(
        n_cells=300, n_dead=0, seed=3, config=Config.HEX,
        force_backend=ForceBackend.PALLAS, phase_std=0.0,
        light_x=-5.0, light_y=0.0,
    )
    base.update(kw)
    return SimParams(**base)


def run_per_bot(p, state, n):
    step = make_step(p)
    assign, refresh = _slot_carry_fns(p)
    slot = assign(state)
    for _ in range(n):
        slot = refresh(state, slot)
        state = step(state, slot=slot)
    return state


def test_table_loop_matches_per_bot_step():
    p = params_()
    sim = Simulation(p)
    ref = run_per_bot(p, sim.state, 10)
    out = make_run_chunk_table(p)(sim.state, 10)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rad), np.asarray(ref.rad), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.phase), np.asarray(ref.phase), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.centroid_ring), np.asarray(ref.centroid_ring), atol=1e-6
    )
    assert int(out.step) == 10


def test_table_loop_crosses_phase_gate():
    # run across a phase-update boundary (short interval) with obstacles so
    # the shadow raycast path is inside the gated cond
    p = params_(
        phase_update_interval=0.05,
        circle_obstacles=((-2.0, 0.0, 0.5),),
        light_shadow=1,
    )
    sim = Simulation(p)
    ref = run_per_bot(p, sim.state, 8)
    out = make_run_chunk_table(p)(sim.state, 8)
    np.testing.assert_allclose(
        np.asarray(out.phase), np.asarray(ref.phase), atol=1e-4
    )


def test_table_loop_dead_injection():
    p = params_(n_cells=64, n_dead=9, time_to_dead=0.05)
    out = make_run_chunk_table(p)(Simulation(p).state, 10)
    dead = np.asarray(out.dead)[:64]
    assert dead.sum() == 9
    out2 = make_run_chunk_table(p)(out, 10)  # no re-injection
    assert np.asarray(out2.dead)[:64].sum() == 9


def test_table_loop_batched_matches_unbatched():
    p = params_(n_cells=64)
    from particlerobotsimulations_tpu.parallel.sweep import make_batch_state

    batch = make_batch_state(p, seeds=[0, 1, 2])
    out_b = make_run_chunk_table_batched(p)(batch, 12)
    run1 = make_run_chunk_table(p)
    for i in range(3):
        solo = Simulation(p.replace(seed=i))
        out1 = run1(solo.state, 12)
        np.testing.assert_allclose(
            np.asarray(out_b.pos[i]), np.asarray(out1.pos), atol=1e-6
        )


def test_table_loop_payload_scenario():
    # object-transport style: payload bot + radius factor
    p = params_(n_cells=41, n_dead=-1, rad_factor=4.0, config=Config.RANDOM)
    sim = Simulation(p)
    ref = run_per_bot(p, sim.state, 8)
    out = make_run_chunk_table(p)(sim.state, 8)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel), atol=1e-4)
