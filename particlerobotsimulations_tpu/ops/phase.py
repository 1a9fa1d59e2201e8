"""Light-distance phase controller + shadow raycaster.

Re-derivation of ``updatePhase`` / ``checkIntersection``
(/root/reference/particlebot_kernel_impl.cuh:184-290).  The reference copies
positions to the host to compute the min distance to the light
(particlebot.cpp:212-232) — a deliberate CPU detour we do on-device with a
masked ``min`` reduction instead; no host sync in the step loop.

Phase law: the bot nearest the light leads the wave,
``phase = (min_d - dist) / (2 * min_radius) * rise_period``
(particlebot_kernel_impl.cuh:286, spacing set at particlebot.cpp:229).
Shadowed bots (segment from light to bot intersects an obstacle) get
``-(Nx-1)*rise_period`` in mode 1 (modulate last) or the 1e10 "never
modulate" sentinel in mode 2 (particlebot_kernel_impl.cuh:276-284).
Gaussian noise of std ``phase_std`` is then added to every bot's phase
(add_normal_noise_kernel, particlebot_kernel_impl.cuh:43-51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimParams

PHASE_NEVER = 9999999999.0
_EPS = 1.0e-12


def _cross2(ax, ay, bx, by):
    return ax * by - ay * bx


def segment_hits_segment(ax, ay, bx, by, cx, cy, dx, dy):
    """True where open segment AB strictly crosses open segment CD.

    Standard 2-D parametric solve; equivalent to the axis-aligned special
    cases in checkIntersectionLine (particlebot_kernel_impl.cuh:184-209),
    including the exclusive (0, 1) bounds and treating parallel segments as
    non-intersecting.
    """
    r_x, r_y = bx - ax, by - ay
    s_x, s_y = dx - cx, dy - cy
    denom = _cross2(r_x, r_y, s_x, s_y)
    safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    qp_x, qp_y = cx - ax, cy - ay
    t = _cross2(qp_x, qp_y, s_x, s_y) / safe
    u = _cross2(qp_x, qp_y, r_x, r_y) / safe
    hit = (jnp.abs(denom) >= _EPS) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    return hit


def segment_hits_circle(ax, ay, bx, by, cx, cy, cr):
    """True where open segment AB crosses the circle boundary param in (0,1).

    Same quadratic as checkIntersectionCircle
    (particlebot_kernel_impl.cuh:211-236): P(t) = A + t (B - A),
    |P(t) - C|^2 = r^2.
    """
    dx, dy = bx - ax, by - ay
    fx, fy = ax - cx, ay - cy
    a = dx * dx + dy * dy
    b = 2.0 * (fx * dx + fy * dy)
    c = fx * fx + fy * fy - cr * cr
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.maximum(a, _EPS)
    r1 = (-b + sq) / (2.0 * safe_a)
    r2 = (-b - sq) / (2.0 * safe_a)
    inside = lambda t: (t > 0) & (t < 1)
    return (disc >= 0) & (inside(r1) | inside(r2))


def in_shadow(params: SimParams, pos: jax.Array) -> jax.Array:
    """(n,) bool: light->bot segment blocked by any obstacle.

    Mirrors checkIntersection (particlebot_kernel_impl.cuh:238-262): circle
    obstacles plus the four edges of each rectangular wall.  Obstacle lists
    are static tuples — the loop unrolls at trace time.
    """
    f32 = jnp.float32
    lx, ly = f32(params.light_x), f32(params.light_y)
    px, py = pos[..., 0], pos[..., 1]
    shadowed = jnp.zeros(px.shape, bool)
    for cx, cy, cr in params.circle_obstacles:
        shadowed |= segment_hits_circle(lx, ly, px, py, f32(cx), f32(cy), f32(cr))
    for x1, x2, y1, y2 in params.rect_obstacles:
        x1, x2, y1, y2 = f32(x1), f32(x2), f32(y1), f32(y2)
        for (sx, sy, ex, ey) in (
            (x1, y1, x1, y2),  # left
            (x1, y2, x2, y2),  # top
            (x2, y2, x2, y1),  # right
            (x2, y1, x1, y1),  # bottom
        ):
            shadowed |= segment_hits_segment(lx, ly, px, py, sx, sy, ex, ey)
    return shadowed


def light_distance(params: SimParams, pos: jax.Array) -> jax.Array:
    light = jnp.array([params.light_x, params.light_y], dtype=jnp.float32)
    d = pos - light
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def update_phase(
    params: SimParams,
    pos: jax.Array,     # (n, 2)
    phase: jax.Array,   # (n,)
    mask: jax.Array,    # (n,) bool
    key: jax.Array,     # PRNG key for the gaussian phase noise
    min_d: jax.Array | None = None,  # precomputed global min distance
) -> jax.Array:
    """``min_d`` lets sharded callers pass a cross-device ``pmin`` of the
    light distance (this function's own reduction only sees local rows)."""
    f32 = jnp.float32
    dist = light_distance(params, pos)
    if min_d is None:
        min_d = jnp.min(jnp.where(mask, dist, jnp.inf))
    spacing = 2.0 * f32(params.min_radius)
    base = (min_d - dist) / spacing * f32(params.rise_period)

    if params.light_shadow:
        shadowed = in_shadow(params, pos)
        if params.light_shadow == 1:
            blocked_val = f32(-(params.nx - 1) * params.rise_period)
        else:
            blocked_val = f32(PHASE_NEVER)
        base = jnp.where(shadowed, blocked_val, base)

    if params.phase_std:
        noise = f32(params.phase_std) * jax.random.normal(
            key, phase.shape, dtype=jnp.float32
        )
        base = base + noise

    return jnp.where(mask, base, phase)
