"""Engine-level tests: step ordering, gating, determinism, scenario physics
(reference pipeline: particlebot.cpp:170-300)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import (
    Config,
    ForceBackend,
    SimParams,
    Simulation,
    load_cfg,
    make_step,
)
from particlerobotsimulations_tpu.state import active_mask


def small_params(**kw):
    base = dict(n_cells=32, n_dead=0, seed=11, max_time=60.0)
    base.update(kw)
    return SimParams(**base)


def test_determinism():
    p = small_params()
    a = Simulation(p)
    b = Simulation(p)
    a.step_chunk(300)
    b.step_chunk(300)
    pa, va, ra = a.host_view()
    pb, vb, rb = b.host_view()
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(ra, rb)


def test_chunking_invariance():
    # 300 steps in one chunk == 3 chunks of 100
    p = small_params()
    a = Simulation(p)
    b = Simulation(p)
    a.step_chunk(300)
    for _ in range(3):
        b.step_chunk(100)
    np.testing.assert_array_equal(a.host_view()[0], b.host_view()[0])


def test_phototaxis():
    # the headline behavior: centroid moves toward the light
    p = small_params(n_cells=48, light_x=-5.0, light_y=0.0, seed=5)
    sim = Simulation(p)
    light = np.array([p.light_x, p.light_y])
    d0 = np.linalg.norm(sim.centroid() - light)
    sim.step_chunk(12000)  # 120 sim-seconds
    d1 = np.linalg.norm(sim.centroid() - light)
    assert d1 < d0 - 0.01, f"no phototaxis: {d0} -> {d1}"


def test_radii_stay_bounded():
    p = small_params()
    sim = Simulation(p)
    sim.step_chunk(2000)
    _, _, rad = sim.host_view()
    assert rad.min() >= p.min_radius - 1e-6
    assert rad.max() <= p.max_radius + 1e-6


def test_no_blowup():
    p = small_params()
    sim = Simulation(p)
    sim.step_chunk(3000)
    pos, vel, _ = sim.host_view()
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    assert np.abs(vel).max() < 5.0  # sane speeds
    # no deep interpenetration (spring should keep overlaps < ~20% radius)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 2 * p.min_radius * 0.7


def test_dead_injection():
    p = small_params(n_cells=40, n_dead=7, time_to_dead=0.5, seed=2)
    sim = Simulation(p)
    sim.step_chunk(40)  # t=0.4 < 0.5
    dead = np.asarray(jax.device_get(sim.state.dead))[: p.n_cells]
    assert dead.sum() == 0
    sim.step_chunk(20)  # crosses 0.5
    dead = np.asarray(jax.device_get(sim.state.dead))[: p.n_cells]
    assert dead.sum() == 7
    sim.step_chunk(100)  # no re-injection
    dead = np.asarray(jax.device_get(sim.state.dead))[: p.n_cells]
    assert dead.sum() == 7


def test_dead_bots_hold_radius():
    p = small_params(n_cells=16, n_dead=16, time_to_dead=0.0, phase_std=0.0)
    sim = Simulation(p)
    sim.step_chunk(500)
    _, _, rad = sim.host_view()
    np.testing.assert_allclose(rad, p.min_radius, atol=1e-6)


def test_centroid_ring():
    p = small_params(centroid_int=1.0, centroid_steps=100)
    sim = Simulation(p)
    sim.step_chunk(250)  # 2.5 s -> slots 0, 1, 2 written
    ring = np.asarray(jax.device_get(sim.state.centroid_ring))
    assert np.all(ring[:3, 0] > -1000)  # written
    assert np.all(ring[3:, 0] == -5000.0)  # untouched sentinel
    # slot 0 is the t=0 centroid
    p0, _, _ = Simulation(p).host_view()
    np.testing.assert_allclose(ring[0], p0.mean(axis=0), atol=1e-4)


def test_one_step_lag_feedback():
    # abs_force carries from collide at step k into radius update at k+1:
    # two overlapping bots at t=0 -> step 0 collide records contact force;
    # step 1 radius update must see it
    p = small_params(n_cells=2, phase_std=0.0)
    step = make_step(p)
    from particlerobotsimulations_tpu.state import make_state

    pos = np.array([[0.0, 0.0], [0.14, 0.0]], np.float32)  # overlapping
    state = make_state(p, pos)
    assert float(state.abs_force_r[0]) == 0.0
    s1 = jax.jit(step)(state)
    assert float(s1.abs_force_r[0]) > 0.0  # collide wrote it
    # padding stays inert
    assert np.all(np.asarray(s1.vel[2:]) == 0)


def test_payload_dragged():
    p = load_cfg("examples/example_object_transport.cfg").replace(
        n_cells=60, max_time=60.0
    )
    sim = Simulation(p)
    pos0, _, _ = sim.host_view()
    sim.step_chunk(6000)
    pos1, _, rad = sim.host_view()
    assert rad[-1] == pytest.approx(p.min_radius * p.rad_factor, abs=1e-6)
    # the swarm should have moved toward the light (payload side)
    assert pos1[:-1, 0].mean() < pos0[:-1, 0].mean()


def test_backends_agree_one_step():
    p = small_params(n_cells=64, seed=9)
    sim = Simulation(p)
    sim.step_chunk(200)  # contact-rich state
    state = sim.state
    sd = jax.jit(make_step(p.replace(force_backend=ForceBackend.DENSE)))(state)
    sg = jax.jit(make_step(p.replace(force_backend=ForceBackend.CELLGRID)))(state)
    np.testing.assert_allclose(np.asarray(sd.pos), np.asarray(sg.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd.vel), np.asarray(sg.vel), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd.rad), np.asarray(sg.rad), atol=1e-6)


def test_boundary_containment():
    # bots can never leave the world box
    p = small_params()
    sim = Simulation(p)
    sim.step_chunk(2000)
    pos, _, _ = sim.host_view()
    assert np.abs(pos).max() <= p.world_half


def test_init_world_box_explicit_undersized_refused():
    # placement wider than an EXPLICIT world box: the integrator clamps
    # exactly like the reference, so it is legal physics — but always a
    # mis-sized scenario (the measured result is a wall-pileup ring), so
    # init refuses with a pointer at the auto-fit sentinel
    p = small_params(config=Config.HEX, world_half=0.4)  # 32-bot HEX spans 0.465
    with pytest.raises(ValueError, match="world_half"):
        Simulation(p)
    # a fitting swarm passes
    Simulation(small_params(config=Config.HEX))


def test_world_half_autofit():
    # world_half 0 = auto-fit: the box derives from the placement extent
    # (never below the reference-parity 64), so oversized swarms run
    # without a hand-set value
    p = small_params(config=Config.HEX, world_half=0.0)
    sim = Simulation(p)
    assert sim.params.world_half == 64.0  # small blob -> parity default
    pos, _, _ = sim.host_view()
    assert np.abs(pos).max() < sim.params.world_half

    # a wide LINE placement pushes the auto box past 64
    p_wide = small_params(
        # 1024-bot LINE spans ~79 units > the 64 default
        n_cells=1024, config=Config.LINE, world_half=0.0,
        force_backend=ForceBackend.DENSE,
    )
    sim_wide = Simulation(p_wide)
    assert sim_wide.params.world_half > 64.0
    pos, _, _ = sim_wide.host_view()
    assert np.abs(pos).max() < sim_wide.params.world_half
    # headroom: at least 25% of the span
    assert sim_wide.params.world_half >= 1.25 * np.abs(pos).max()

    # the sentinel must be resolved before any step function compiles —
    # tracing a step built from raw world_half=0 params raises
    from particlerobotsimulations_tpu.engine import make_step

    p_raw = small_params(world_half=0.0)
    step = make_step(p_raw)
    with pytest.raises(ValueError, match="auto-fit"):
        step(sim.state)


def test_init_undersized_grid_refused():
    # a user-forced grid_dim smaller than the swarm span would alias the
    # wrapped neighbor table and silently corrupt the pair set on the
    # PALLAS table loop — init must refuse
    p = small_params(
        n_cells=4096,
        config=Config.HEX,
        force_backend=ForceBackend.PALLAS,
        grid_dim=16,
    )
    with pytest.raises(ValueError, match="alias"):
        Simulation(p)
