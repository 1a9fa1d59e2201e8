"""Phase-controller + shadow-raycast tests
(reference: particlebot_kernel_impl.cuh:184-290)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams
from particlerobotsimulations_tpu.ops.phase import (
    PHASE_NEVER,
    in_shadow,
    segment_hits_circle,
    segment_hits_segment,
    update_phase,
)

P = SimParams(n_dead=0, phase_std=0.0)


def test_phase_law():
    # nearest bot leads with phase 0; others negative by distance
    p = P.replace(light_x=0.0, light_y=0.0)
    pos = jnp.asarray([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]], jnp.float32)
    phase = update_phase(p, pos, jnp.zeros(3), jnp.ones(3, bool), jax.random.key(0))
    spacing = 2 * p.min_radius
    np.testing.assert_allclose(
        np.asarray(phase),
        [0.0, -1.0 / spacing * p.rise_period, -2.0 / spacing * p.rise_period],
        rtol=1e-5,
    )


def test_min_over_active_only():
    p = P.replace(light_x=0.0, light_y=0.0)
    pos = jnp.asarray([[1.0, 0.0], [0.1, 0.0]], jnp.float32)
    mask = jnp.asarray([True, False])  # padding bot closer to light must not lead
    phase = update_phase(p, pos, jnp.zeros(2), mask, jax.random.key(0))
    assert float(phase[0]) == pytest.approx(0.0)


def test_noise_statistics():
    p = P.replace(light_x=0.0, light_y=0.0, phase_std=0.5)
    pos = jnp.ones((4096, 2), jnp.float32)
    phase = update_phase(p, pos, jnp.zeros(4096), jnp.ones(4096, bool), jax.random.key(1))
    arr = np.asarray(phase)
    assert arr.mean() == pytest.approx(0.0, abs=0.05)
    assert arr.std() == pytest.approx(0.5, abs=0.05)


class TestRaycast:
    def test_segment_segment(self):
        hit = segment_hits_segment(0.0, 0.0, 2.0, 0.0, 1.0, -1.0, 1.0, 1.0)
        assert bool(hit)
        miss = segment_hits_segment(0.0, 0.0, 2.0, 0.0, 3.0, -1.0, 3.0, 1.0)
        assert not bool(miss)
        parallel = segment_hits_segment(0.0, 0.0, 2.0, 0.0, 0.0, 1.0, 2.0, 1.0)
        assert not bool(parallel)
        # endpoint touch is exclusive (reference uses strict inequalities)
        touch = segment_hits_segment(0.0, 0.0, 1.0, 0.0, 1.0, -1.0, 1.0, 1.0)
        assert not bool(touch)

    def test_segment_circle(self):
        assert bool(segment_hits_circle(-2.0, 0.0, 2.0, 0.0, 0.0, 0.0, 0.5))
        assert not bool(segment_hits_circle(-2.0, 0.0, 2.0, 0.0, 0.0, 1.0, 0.5))
        # circle beyond the far endpoint: no hit in (0, 1)
        assert not bool(segment_hits_circle(-2.0, 0.0, 2.0, 0.0, 5.0, 0.0, 0.5))

    def test_in_shadow_circle(self):
        p = P.replace(light_x=-5.0, light_y=0.0, circle_obstacles=((0.0, 0.0, 1.0),))
        pos = jnp.asarray([[5.0, 0.0], [5.0, 5.0], [-2.0, 0.0]], jnp.float32)
        s = np.asarray(in_shadow(p, pos))
        assert s.tolist() == [True, False, False]

    def test_in_shadow_rect(self):
        p = P.replace(light_x=-5.0, light_y=0.0, rect_obstacles=((-1.0, -0.5, -2.0, 2.0),))
        pos = jnp.asarray([[5.0, 0.0], [5.0, 10.0], [-3.0, 0.0]], jnp.float32)
        s = np.asarray(in_shadow(p, pos))
        assert s.tolist() == [True, False, False]


def test_shadow_modes():
    base = P.replace(
        light_x=-5.0, light_y=0.0, circle_obstacles=((0.0, 0.0, 1.0),), phase_std=0.0
    )
    pos = jnp.asarray([[5.0, 0.0], [-2.0, 0.0]], jnp.float32)
    mask = jnp.ones(2, bool)
    p1 = base.replace(light_shadow=1)
    out1 = update_phase(p1, pos, jnp.zeros(2), mask, jax.random.key(0))
    assert float(out1[0]) == pytest.approx(-(p1.nx - 1) * p1.rise_period)
    p2 = base.replace(light_shadow=2)
    out2 = update_phase(p2, pos, jnp.zeros(2), mask, jax.random.key(0))
    assert float(out2[0]) == pytest.approx(PHASE_NEVER)
    # lit bot unaffected by mode
    assert float(out1[1]) == pytest.approx(float(out2[1]))
