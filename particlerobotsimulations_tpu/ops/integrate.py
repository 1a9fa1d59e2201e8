"""Position integrator + world-boundary response.

Re-derivation of ``integrate_functor``
(/root/reference/particlebot_kernel_impl.cuh:53-103).  The reference runs a
split symplectic-Euler: collide updates velocity at step k, this op moves the
position at step k+1 (velocity already includes forces) and clamps to the
±world_half box, flipping the velocity component by ``boundary_damping``
(default -1, elastic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimParams


def integrate(
    params: SimParams,
    pos: jax.Array,   # (n, 2)
    vel: jax.Array,   # (n, 2)
    rad: jax.Array,   # (n,)
    dt: float,
):
    f32 = jnp.float32
    half = f32(params.world_half)
    bd = f32(params.boundary_damping)

    new_pos = pos + vel * f32(dt)
    hi = (half - rad)[..., None]
    lo = (-half + rad)[..., None]
    out = (new_pos > hi) | (new_pos < lo)
    new_pos = jnp.clip(new_pos, lo, hi)
    new_vel = jnp.where(out, vel * bd, vel)
    return new_pos, new_vel
