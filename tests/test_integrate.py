"""Integrator + boundary tests (reference: particlebot_kernel_impl.cuh:53-103)."""

import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams
from particlerobotsimulations_tpu.ops.integrate import integrate

P = SimParams(n_dead=0)


def test_euler_step():
    pos = jnp.asarray([[1.0, 2.0]], jnp.float32)
    vel = jnp.asarray([[3.0, -4.0]], jnp.float32)
    rad = jnp.asarray([0.1], jnp.float32)
    new_pos, new_vel = integrate(P, pos, vel, rad, 0.01)
    np.testing.assert_allclose(np.asarray(new_pos)[0], [1.03, 1.96], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_vel), np.asarray(vel))


def test_boundary_clamp_and_flip():
    pos = jnp.asarray([[63.95, 0.0]], jnp.float32)
    vel = jnp.asarray([[10.0, 0.0]], jnp.float32)
    rad = jnp.asarray([0.1], jnp.float32)
    new_pos, new_vel = integrate(P, pos, vel, rad, 0.01)
    assert float(new_pos[0, 0]) == pytest.approx(64.0 - 0.1)
    assert float(new_vel[0, 0]) == pytest.approx(-10.0)  # boundary_damping = -1
    assert float(new_vel[0, 1]) == 0.0


def test_boundary_damping_value():
    p = P.replace(boundary_damping=-0.5)
    pos = jnp.asarray([[0.0, -63.99]], jnp.float32)
    vel = jnp.asarray([[0.0, -5.0]], jnp.float32)
    rad = jnp.asarray([0.1], jnp.float32)
    _, new_vel = integrate(p, pos, vel, rad, 0.01)
    assert float(new_vel[0, 1]) == pytest.approx(2.5)
