"""Unit tests for the pair/obstacle/friction force ops against hand-computed
values (constants from /root/reference/particlebot_kernel_impl.cuh:540-831).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams
from particlerobotsimulations_tpu.ops.forces import (
    MAGNET_INT1,
    MAGNET_INT2,
    MAGNET_MIN_ATTR,
    dense_collide,
    friction_velocity_update,
    obstacle_forces,
    pair_forces,
)

P = SimParams(n_dead=0)


def single_pair(pos_a, pos_b, vel_a=(0, 0), vel_b=(0, 0), rad_a=0.0775, rad_b=0.0775, params=P):
    diff = jnp.asarray([np.subtract(pos_b, pos_a)], jnp.float32)
    rel = jnp.asarray([np.subtract(vel_b, vel_a)], jnp.float32)
    out = pair_forces(
        params,
        diff,
        rel,
        jnp.float32(rad_a) * jnp.ones(1),
        jnp.float32(rad_b) * jnp.ones(1),
        jnp.float32(params.attraction) * jnp.ones(1),
        jnp.ones(1, bool),
    )
    return (
        np.asarray(out.force[0]),
        float(out.mag_contact[0]),
        float(out.mag_attract[0]),
    )


class TestPairForces:
    def test_spring_repulsion(self):
        # overlap 0.055 at dist 0.1: spring only (rel vel zero)
        f, mc, ma = single_pair((0, 0), (0.1, 0))
        assert f == pytest.approx([-1000.0 * 0.055, 0.0], rel=1e-5)
        assert mc == pytest.approx(55.0, rel=1e-5)
        assert ma == 0.0

    def test_dashpot_and_shear(self):
        # head-on approach: damping along normal; perpendicular: shear
        f, _, _ = single_pair((0, 0), (0.1, 0), vel_b=(-1.0, 0))
        # spring -55 + damping 10*(-1) = -65
        assert f == pytest.approx([-65.0, 0.0], rel=1e-5)
        f, _, _ = single_pair((0, 0), (0.1, 0), vel_b=(0, 2.0))
        # tangential vel (0,2): damping 10*2 + shear 40*2 = 100 in y
        assert f == pytest.approx([-55.0, 100.0], rel=1e-4)

    def test_magnet_close_constant(self):
        d = 0.155 + 0.0005  # gap < int1
        f, mc, ma = single_pair((0, 0), (d, 0))
        assert f == pytest.approx([MAGNET_MIN_ATTR, 0.0], rel=1e-5)
        assert ma == pytest.approx(MAGNET_MIN_ATTR, rel=1e-5)
        assert mc == 0.0

    def test_magnet_ramp(self):
        gap = 0.0014
        d = 0.155 + gap
        f, _, _ = single_pair((0, 0), (d, 0))
        top = P.attraction / MAGNET_INT2**2
        expected = MAGNET_MIN_ATTR + (top - MAGNET_MIN_ATTR) / (
            MAGNET_INT2 - MAGNET_INT1
        ) * (gap - MAGNET_INT1)
        assert f[0] == pytest.approx(expected, rel=1e-4)

    def test_magnet_inverse_square(self):
        gap = 0.1
        d = 0.155 + gap
        f, _, _ = single_pair((0, 0), (d, 0))
        assert f[0] == pytest.approx(P.attraction / gap**2, rel=1e-4)

    def test_cutoff(self):
        d = P.cutoff() + 0.01 + 0.155
        f, mc, ma = single_pair((0, 0), (d, 0))
        assert np.all(f == 0) and mc == 0 and ma == 0

    def test_invalid_pair_zero(self):
        out = pair_forces(
            P,
            jnp.zeros((1, 2)),
            jnp.zeros((1, 2)),
            jnp.ones(1) * 0.1,
            jnp.ones(1) * 0.1,
            jnp.ones(1) * P.attraction,
            jnp.zeros(1, bool),
        )
        assert np.all(np.asarray(out.force) == 0)
        assert np.isfinite(np.asarray(out.force)).all()


class TestObstacles:
    def test_circle_pushes_out(self):
        p = P.replace(circle_obstacles=((1.0, 0.0, 0.5),))
        pos = jnp.asarray([[0.45, 0.0]], jnp.float32)  # left of circle, overlapping
        vel = jnp.zeros((1, 2), jnp.float32)
        rad = jnp.asarray([0.1], jnp.float32)
        f, mr = obstacle_forces(p, pos, vel, rad)
        # dist 0.55, overlap = 0.1+0.5-0.55 = 0.05 -> 2*1000*0.05 = 100 in -x
        assert np.asarray(f)[0] == pytest.approx([-100.0, 0.0], rel=1e-4)
        assert float(mr[0]) == pytest.approx(100.0, rel=1e-4)

    def test_circle_miss(self):
        p = P.replace(circle_obstacles=((1.0, 0.0, 0.5),))
        pos = jnp.asarray([[0.3, 0.0]], jnp.float32)
        f, mr = obstacle_forces(p, pos, jnp.zeros((1, 2)), jnp.asarray([0.1]))
        assert np.all(np.asarray(f) == 0)

    def test_rect_left_side(self):
        p = P.replace(rect_obstacles=((0.0, 1.0, -1.0, 1.0),))
        pos = jnp.asarray([[-0.05, 0.0]], jnp.float32)  # overlapping left face
        f, mr = obstacle_forces(p, pos, jnp.zeros((1, 2)), jnp.asarray([0.1]))
        # overlap = px - x1 + rad = 0.05 -> -2k*0.05*(1,0) = -100 x
        assert np.asarray(f)[0] == pytest.approx([-100.0, 0.0], rel=1e-4)

    def test_rect_right_side(self):
        p = P.replace(rect_obstacles=((0.0, 1.0, -1.0, 1.0),))
        pos = jnp.asarray([[1.05, 0.0]], jnp.float32)
        f, _ = obstacle_forces(p, pos, jnp.zeros((1, 2)), jnp.asarray([0.1]))
        assert np.asarray(f)[0] == pytest.approx([100.0, 0.0], rel=1e-4)

    def test_rect_top_bottom(self):
        p = P.replace(rect_obstacles=((-1.0, 1.0, 0.0, 0.5),))
        f, _ = obstacle_forces(
            p, jnp.asarray([[0.0, -0.05]], jnp.float32), jnp.zeros((1, 2)), jnp.asarray([0.1])
        )
        assert np.asarray(f)[0] == pytest.approx([0.0, -100.0], rel=1e-4)
        f, _ = obstacle_forces(
            p, jnp.asarray([[0.0, 0.55]], jnp.float32), jnp.zeros((1, 2)), jnp.asarray([0.1])
        )
        assert np.asarray(f)[0] == pytest.approx([0.0, 100.0], rel=1e-4)

    def test_rect_corner(self):
        p = P.replace(rect_obstacles=((0.0, 1.0, 0.0, 1.0),))
        # near corner (0,0) from outside, diagonal
        d = 0.05
        pos = jnp.asarray([[-d, -d]], jnp.float32)
        f, _ = obstacle_forces(p, pos, jnp.zeros((1, 2)), jnp.asarray([0.1]))
        fa = np.asarray(f)[0]
        dist = np.hypot(d, d)
        overlap = 0.1 - dist
        mag = 2 * 1000 * overlap
        assert fa[0] == pytest.approx(-mag / np.sqrt(2), rel=1e-3)
        assert fa[1] == pytest.approx(-mag / np.sqrt(2), rel=1e-3)

    def test_rect_no_hit(self):
        p = P.replace(rect_obstacles=((0.0, 1.0, 0.0, 1.0),))
        f, _ = obstacle_forces(
            p, jnp.asarray([[-0.5, -0.5]], jnp.float32), jnp.zeros((1, 2)), jnp.asarray([0.1])
        )
        assert np.all(np.asarray(f) == 0)


class TestFriction:
    def test_static_hold(self):
        # at rest, |F| below 2*mu*g threshold -> velocity stays zero
        vel = jnp.zeros((1, 2), jnp.float32)
        force = jnp.asarray([[1.0, 0.0]], jnp.float32)
        payload = jnp.zeros(1, bool)
        out = friction_velocity_update(P, vel, force, payload, 0.01)
        assert np.all(np.asarray(out) == 0)

    def test_breakaway(self):
        thresh = 2 * P.friction * P.gravity  # ~4.44
        vel = jnp.zeros((1, 2), jnp.float32)
        force = jnp.asarray([[thresh + 1.0, 0.0]], jnp.float32)
        out = friction_velocity_update(P, vel, force, jnp.zeros(1, bool), 0.01)
        expected = (thresh + 1.0) * 0.01 - P.friction * P.gravity * 0.01
        assert np.asarray(out)[0, 0] == pytest.approx(expected, rel=1e-4)

    def test_kinetic_stop(self):
        # velocity below mu*g*dt is zeroed
        kin = P.friction * P.gravity * 0.01
        vel = jnp.asarray([[kin * 0.5, 0.0]], jnp.float32)
        out = friction_velocity_update(
            P, vel, jnp.zeros((1, 2), jnp.float32), jnp.zeros(1, bool), 0.01
        )
        assert np.all(np.asarray(out) == 0)

    def test_moving_bot_keeps_force(self):
        # a moving bot is not subject to static hold even for small forces
        vel = jnp.asarray([[0.1, 0.0]], jnp.float32)
        force = jnp.asarray([[1.0, 0.0]], jnp.float32)
        out = friction_velocity_update(P, vel, force, jnp.zeros(1, bool), 0.01)
        kin = P.friction * P.gravity * 0.01
        assert np.asarray(out)[0, 0] == pytest.approx(0.1 + 0.01 - kin, rel=1e-4)

    def test_payload_scaling(self):
        p = P.replace(n_dead=-1, mass_factor=4.0, friction_factor=0.5)
        vel = jnp.zeros((1, 2), jnp.float32)
        force = jnp.asarray([[100.0, 0.0]], jnp.float32)
        payload = jnp.ones(1, bool)
        out = friction_velocity_update(p, vel, force, payload, 0.01)
        kin = p.friction * 0.5 * p.gravity * 4.0 * 0.01
        assert np.asarray(out)[0, 0] == pytest.approx(100.0 / 4.0 * 0.01 - kin, rel=1e-4)


class TestDenseCollide:
    def test_newton_pairs_symmetric(self):
        # two overlapping bots push apart with equal magnitude
        pos = jnp.asarray([[0.0, 0.0], [0.1, 0.0]], jnp.float32)
        vel = jnp.zeros((2, 2), jnp.float32)
        rad = jnp.full((2,), 0.0775, jnp.float32)
        mask = jnp.ones(2, bool)
        payload = jnp.zeros(2, bool)
        nv, fa, fr = dense_collide(P, pos, vel, rad, mask, payload, 0.01)
        nv = np.asarray(nv)
        assert nv[0, 0] == pytest.approx(-nv[1, 0], rel=1e-5)
        assert nv[0, 0] < 0  # pushed apart past static friction (55 > 4.44)

    def test_padding_inert(self):
        pos = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [0.05, 0.0]], jnp.float32)
        mask = jnp.asarray([True, True, False])
        nv, fa, fr = dense_collide(
            P,
            pos,
            jnp.zeros((3, 2), jnp.float32),
            jnp.full((3,), 0.0775, jnp.float32),
            mask,
            jnp.zeros(3, bool),
            0.01,
        )
        # the masked bot at 0.05 (between the two) must not contribute or move
        assert np.all(np.asarray(nv)[2] == 0)
        two_body, _, _ = dense_collide(
            P,
            pos[:2],
            jnp.zeros((2, 2), jnp.float32),
            jnp.full((2,), 0.0775, jnp.float32),
            jnp.ones(2, bool),
            jnp.zeros(2, bool),
            0.01,
        )
        np.testing.assert_allclose(np.asarray(nv)[:2], np.asarray(two_body), rtol=1e-6)

    def test_payload_attraction_factor_zero(self):
        # payload with attraction_factor=0 in the inverse-square regime feels
        # no magnet force (but the constant close-range term still applies —
        # reference behavior)
        p = P.replace(n_dead=-1, attraction_factor=0.0, n_cells=2)
        pos = jnp.asarray([[0.0, 0.0], [0.5, 0.0]], jnp.float32)
        payload = jnp.asarray([False, True])
        nv, fa, fr = dense_collide(
            p,
            pos,
            jnp.zeros((2, 2), jnp.float32),
            jnp.full((2,), 0.0775, jnp.float32),
            jnp.ones(2, bool),
            payload,
            0.01,
        )
        # grad-safe norm floors |0-force| at 1e-15 — physically zero
        assert float(fa[0]) < 1e-12 and float(fa[1]) < 1e-12
