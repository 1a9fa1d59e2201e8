"""Physics invariants.

Momentum: every pair interaction (spring, dashpot, shear, magnet) is
equal-and-opposite, so with friction and walls disabled the swarm's total
momentum is conserved by the collide pass — a strong structural check on all
force backends (the reference has no such test; its only guard is eyeballing
videos).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import Config, ForceBackend, SimParams, Simulation


def frictionless(n=64, backend=ForceBackend.DENSE):
    return SimParams(
        n_cells=n, n_dead=0, seed=11, config=Config.HEX,
        friction=0.0, gravity=0.0,           # no stick-slip sink
        boundary_damping=-1.0,
        force_backend=backend,
        phase_std=0.0,
    )


@pytest.mark.parametrize("backend", [ForceBackend.DENSE, ForceBackend.STENCIL])
def test_momentum_conserved_by_pair_forces(backend):
    p = frictionless(backend=backend)
    sim = Simulation(p)
    # give the swarm initial net momentum and internal motion
    n = p.n_cells
    rng = np.random.default_rng(0)
    vel = rng.normal(0, 0.05, (n, 2)).astype(np.float32) + np.array(
        [0.02, -0.01], np.float32
    )
    sim.state = sim.state._replace(vel=sim.state.vel.at[:n].set(vel))
    p0 = vel.sum(axis=0)

    sim.step_chunk(300)  # 3 sim-seconds, radii actuate, contacts happen
    _, vel1, _ = sim.host_view()
    pos1, _, _ = sim.host_view()
    assert np.abs(pos1).max() < p.world_half - 1  # no wall contact
    p1 = vel1.sum(axis=0, dtype=np.float64)
    np.testing.assert_allclose(p1, p0, atol=5e-4)


def test_shadow_modes_run_at_engine_level():
    # wall between light and swarm: mode 1 (modulate last) and mode 2
    # (never modulate) both run and produce different dynamics
    base = SimParams(
        n_cells=24, n_dead=0, seed=6, config=Config.HEX,
        light_x=-5.0, light_y=0.0,
        rect_obstacles=((-2.0, -1.8, -10.0, 10.0),),
        phase_std=0.0,
    )
    # fully shadowed swarm, phase = -(Nx-1)*rise_period = -8: the actuation
    # window t+phase in [0, 2*rise) opens at t in [8, 12) — "modulate last"
    rads = {}
    for mode in (1, 2):
        sim = Simulation(base.replace(light_shadow=mode))
        sim.step_chunk(900)  # t = 9, inside the late window
        pos, vel, rad = sim.host_view()
        assert np.isfinite(pos).all()
        rads[mode] = rad
    # mode 2 freezes every shadowed bot at min_radius (phase sentinel 1e10)
    assert np.allclose(rads[2], base.min_radius, atol=1e-6)
    # mode 1 modulates late: by t=9 the shadowed bots are expanding
    assert rads[1].max() > base.min_radius + 1e-4


def test_random_config_fuzz_stays_healthy():
    # config-space fuzz: random-but-plausible parameter draws must run a
    # short horizon without NaNs, containment violations, or overflow on
    # both the portable and the production backend families.  Guards the
    # parameter plumbing (cfg keys -> SimParams -> ops) against
    # combination regressions; seeds are fixed so failures reproduce.
    rng = np.random.default_rng(123)
    for trial in range(4):
        n = int(rng.integers(24, 400))
        p = SimParams(
            n_cells=n,
            n_dead=int(rng.integers(0, max(1, n // 8))),
            time_to_dead=float(rng.uniform(0.02, 0.2)),
            seed=int(rng.integers(0, 1 << 16)),
            # HEX and RANDOM are the physically-valid generators; GRID
            # faithfully replicates the reference's y-zeroing quirk
            # (particlebot.cpp:413-436) and degenerates to an overlapping
            # line that explodes at any n — in the reference too
            config=Config.HEX if trial % 2 else Config.RANDOM,
            force_backend=(
                ForceBackend.PALLAS if trial % 2 else ForceBackend.DENSE
            ),
            rise_period=float(rng.uniform(1.0, 6.0)),
            phase_std=float(rng.uniform(0.0, 1.0)),
            attraction=float(rng.uniform(0.5, 3.0)),
            friction=float(rng.uniform(0.0, 0.4)),
            light_x=float(rng.uniform(-20.0, -2.0)),
            light_y=float(rng.uniform(-5.0, 5.0)),
            circle_obstacles=(
                ((-3.0, 1.0, float(rng.uniform(0.3, 1.0))),)
                if trial % 2
                else ()
            ),
            phase_update_interval=float(rng.uniform(0.1, 2.0)),
        )
        sim = Simulation(p)
        sim.step_chunk(40)
        h = sim.health()
        assert h["finite"], f"trial {trial}: non-finite state ({p})"
        assert h["cell_overflow"] == 0, f"trial {trial}: overflow ({p})"
        pos = np.asarray(sim.host_view()[0])
        assert np.abs(pos).max() <= p.world_half + 1e-3, f"trial {trial}: escaped box"


def test_cell_occupancy_at_reference_density():
    """The cutoff-sized grid cell (~3 bot diameters; cutoff = 2.2x the
    reference cell, main.cpp:932-935) holds FAR more than half the table
    capacity at reference density — measured max 13-14 of 16 with a
    majority of occupied cells above 8 once the wave compresses the blob.

    Two design assumptions pinned here:
    * max occupancy <= cell_capacity — the table's force-visibility
      guarantee at default density (no silent pair loss to the parking
      strip / spill rows);
    * occupancy is NOT slot-sparse — any "only the first half of the
      slot rows matter" speculation (tried and reverted: the lo-slot
      kernels, 39% regression at 10k because the adopt-or-redo fallback
      fired on every group) is structurally wrong at this density.
    """
    from particlerobotsimulations_tpu.engine import make_run_chunk

    p = SimParams(
        n_cells=1000, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0, force_backend=ForceBackend.STENCIL,
    )
    sim = Simulation(p)
    state = make_run_chunk(p)(sim.state, 200, False)

    pv = p.validate()
    pos = np.asarray(jax.device_get(state.pos))[: p.n_cells]
    ij = np.floor(pos / pv.cutoff()).astype(np.int64)
    key = (ij[:, 0] - ij[:, 0].min()) * 100_000 + (ij[:, 1] - ij[:, 1].min())
    _, counts = np.unique(key, return_counts=True)

    assert counts.max() <= pv.cell_capacity, (
        f"cell over capacity: {counts.max()} > {pv.cell_capacity}"
    )
    over_half = (counts > pv.cell_capacity // 2).sum()
    assert over_half > len(counts) // 2, (
        f"density regression: only {over_half}/{len(counts)} occupied cells "
        f"above capacity/2 (measured 78/120 at step 200)"
    )
