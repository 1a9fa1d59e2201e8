"""Radius-controller tests (reference: particlebot_kernel_impl.cuh:124-181)."""

import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams
from particlerobotsimulations_tpu.ops.actuation import MAX_SPEED, update_radius

P = SimParams(n_dead=0)
DT = 0.01


def run(rad, phase, fa=0.0, fr=0.0, time=0.0, dead=False, params=P, mask=True):
    out = update_radius(
        params,
        jnp.asarray([rad], jnp.float32),
        jnp.asarray([phase], jnp.float32),
        jnp.asarray([fa], jnp.float32),
        jnp.asarray([fr], jnp.float32),
        jnp.asarray([dead]),
        jnp.asarray([mask]),
        jnp.float32(time),
        DT,
    )
    return float(out[0])


def expected_unloaded_expand(rad, dr1, params=P):
    torque = dr1 * params.constraint * rad / MAX_SPEED / params.max_radius / DT
    torque = min(torque, params.constraint)
    return MAX_SPEED * params.max_radius / params.constraint * (torque / rad) * DT


def test_hold_at_target():
    assert run(P.min_radius, 0.0, time=0.0) == pytest.approx(P.min_radius)


def test_unloaded_expansion_rate():
    # mid-rise: target ahead of rad, no load -> expands by the no-load rate
    t = 1.0
    target = P.min_radius + (P.max_radius - P.min_radius) / P.rise_period * t
    rad = P.min_radius
    dr = expected_unloaded_expand(rad, target - rad)
    assert run(rad, 0.0, time=t) == pytest.approx(rad + dr, rel=1e-4)


def test_blocked_expansion():
    # huge contact load -> no expansion
    t = 1.0
    assert run(P.min_radius, 0.0, fr=1e6, time=t) == pytest.approx(P.min_radius)


def test_partial_load_reduces_expansion():
    t = 1.0
    free = run(P.min_radius, 0.0, fr=0.0, time=t)
    half_load = P.constraint / P.min_radius * 0.5
    loaded = run(P.min_radius, 0.0, fr=half_load, time=t)
    assert P.min_radius < loaded < free


def test_unconstrained_contraction_tracks_target():
    # t in (rise, 2*rise): contracting; unconstrained -> rad jumps to target
    t = 3.0
    target = P.max_radius + (P.min_radius - P.max_radius) / P.rise_period * (
        t - P.rise_period
    )
    assert run(P.max_radius, 0.0, time=t) == pytest.approx(target, rel=1e-5)


def test_constrained_contraction():
    p = P.replace(constrained_contraction=1)
    t = 3.9  # target near min_radius
    # attraction load resists: with huge abs_force_a no contraction
    out = update_radius(
        p,
        jnp.asarray([p.max_radius], jnp.float32),
        jnp.zeros(1, jnp.float32),
        jnp.asarray([1e9], jnp.float32),
        jnp.zeros(1, jnp.float32),
        jnp.zeros(1, bool),
        jnp.ones(1, bool),
        jnp.float32(t),
        DT,
    )
    assert float(out[0]) == pytest.approx(p.max_radius)
    # no load: contraction happens but rate-capped at max_radius*dt
    out = update_radius(
        p,
        jnp.asarray([p.max_radius], jnp.float32),
        jnp.zeros(1, jnp.float32),
        jnp.zeros(1, jnp.float32),
        jnp.zeros(1, jnp.float32),
        jnp.zeros(1, bool),
        jnp.ones(1, bool),
        jnp.float32(t),
        DT,
    )
    assert float(out[0]) == pytest.approx(p.max_radius - p.max_radius * DT, rel=1e-4)


def test_outside_window_holds():
    # t1 in [2*rise, (Nx+1)*rise) -> no actuation regardless of rad
    assert run(0.1, 0.0, time=5.0) == pytest.approx(0.1)


def test_wave_wraps():
    period = P.wave_period()  # 12 s
    t = period + 1.0  # same as t=1
    assert run(P.min_radius, 0.0, time=t) == pytest.approx(
        run(P.min_radius, 0.0, time=1.0)
    )


def test_negative_local_time():
    # phase shifts can make t+phase negative; +100*period unwrap
    assert run(P.min_radius, -P.wave_period() + 1.0, time=0.0) == pytest.approx(
        run(P.min_radius, 0.0, time=1.0)
    )


def test_deeply_negative_local_time_clamps_to_min():
    # phase < -100*period stays negative after the single +100*period unwrap
    # (reference's conditional fmod, particlebot_kernel_impl.cuh:137-141):
    # the triangle target sits far below min_radius -> contract + clamp
    phase = -150.0 * P.wave_period()
    assert run(0.15, phase, time=0.0) == pytest.approx(P.min_radius)


def test_dead_and_frozen_skip():
    assert run(0.09, 0.0, time=1.0, dead=True) == pytest.approx(0.09)
    assert run(0.09, 2.0e7, time=1.0) == pytest.approx(0.09)  # shadow sentinel


def test_clamped_to_bounds():
    out = run(P.max_radius, 0.0, time=P.rise_period * 0.999)
    assert out <= P.max_radius + 1e-7
