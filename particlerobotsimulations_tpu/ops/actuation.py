"""Force-limited radius controller (hot loop #2).

Re-derivation of ``updateRad_light_wave``
(/root/reference/particlebot_kernel_impl.cuh:124-181): each bot tracks a
triangle-wave radius target on its local clock ``t + phase`` wrapped modulo
``(Nx+1) * rise_period``; it only actuates during the first two
``rise_period`` windows (expand, then contract) and holds ``min_radius``
otherwise.  Expansion is torque-limited against the repulsive force magnitude
accumulated by the previous step's collide pass; contraction is optionally
limited against the attraction magnitude (``constrained_contraction``).

Dead bots and bots with ``phase > 1e7`` (the light_shadow==2 sentinel) never
actuate (particlebot_kernel_impl.cuh:133-134).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimParams

# Reference hard-codes the actuator's no-load speed (particlebot_kernel_impl.cuh:155).
MAX_SPEED = 0.1
PHASE_FROZEN = 1.0e7


def update_radius(
    params: SimParams,
    rad: jax.Array,          # (n,)
    phase: jax.Array,        # (n,)
    abs_force_a: jax.Array,  # (n,) previous-step attraction magnitudes
    abs_force_r: jax.Array,  # (n,) previous-step repulsion magnitudes
    dead: jax.Array,         # (n,) bool
    mask: jax.Array,         # (n,) bool
    time: jax.Array,         # () float32 sim time
    dt: float,
) -> jax.Array:
    f32 = jnp.float32
    period = f32(params.wave_period())
    rise = f32(params.rise_period)
    min_r = f32(params.min_radius)
    max_r = f32(params.max_radius)

    # local clock: the reference (particlebot_kernel_impl.cuh:137-141) adds
    # 100*period once if negative and only applies fmod when t1 >= period —
    # a t1 still negative after that (phase < -100*period) stays negative,
    # where the triangle target sits far below min_radius and the bot clamps
    # to min_radius.  Reproduce the conditional wrap exactly.
    t1 = time + phase
    t1 = jnp.where(t1 < 0, t1 + 100.0 * period, t1)
    t1 = jnp.where(t1 >= period, t1 - period * jnp.floor(t1 / period), t1)
    in_window = t1 < 2.0 * rise

    target = jnp.where(
        t1 <= rise,
        min_r + (max_r - min_r) / rise * t1,
        max_r + (min_r - max_r) / rise * (t1 - rise),
    )
    dr1 = target - rad

    safe_rad = jnp.maximum(rad, f32(1.0e-9))
    torque = dr1 * f32(params.constraint) * rad / f32(MAX_SPEED) / max_r / f32(dt)
    torque = jnp.minimum(torque, f32(params.constraint))

    # expansion: only the torque surplus over the contact load moves the shell
    # (particlebot_kernel_impl.cuh:160-165)
    expand = jnp.where(
        torque / safe_rad > abs_force_r,
        f32(MAX_SPEED) * max_r / f32(params.constraint)
        * (torque / safe_rad - abs_force_r)
        * f32(dt),
        0.0,
    )

    if params.constrained_contraction:
        cc = f32(params.constraint_contraction)
        contract = jnp.where(
            -cc * dr1 > abs_force_a * rad,
            (cc * dr1 + abs_force_a * rad) / cc,
            0.0,
        )
        contract = jnp.maximum(contract, -max_r * f32(dt))
    else:
        contract = dr1

    dr = jnp.where(dr1 > 0, expand, contract)
    new_rad = jnp.clip(rad + dr, min_r, max_r)

    frozen = dead | (phase > f32(PHASE_FROZEN)) | ~in_window | ~mask
    return jnp.where(frozen, rad, new_rad)
