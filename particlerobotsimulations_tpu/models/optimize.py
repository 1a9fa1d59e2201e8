"""Differentiable simulation: gradient-based actuation optimization.

A capability the CUDA reference fundamentally lacks: because every physics
op here is a pure jittable function, the whole ``lax.scan`` step loop is
differentiable end-to-end.  This module optimizes the per-bot actuation
*phase offsets* directly — replacing the hand-designed light-distance phase
law (particlebot_kernel_impl.cuh:286) with phases learned by backprop
through the contact dynamics.

The stick-slip friction and piecewise magnet law are almost-everywhere
differentiable (piecewise-smooth ``where`` branches); gradients are exact
within each regime.  Memory for long horizons is handled with
``jax.checkpoint`` on the step function (rematerialization instead of
storing every intermediate).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimParams
from ..engine import make_step
from ..state import SimState, active_mask


def make_phase_rollout(
    params: SimParams, n_steps: int
) -> Callable[[jax.Array, SimState], jax.Array]:
    """Returns ``rollout(phase0, state0) -> final centroid x`` (jittable,
    differentiable in ``phase0``).

    The phase controller is frozen (no light-law updates, no noise) so the
    optimized offsets are the only actuation schedule.
    """
    from ..config import Control

    # Every backend is differentiable: DENSE/CELLGRID/STENCIL natively, the
    # PALLAS kernel via its custom VJP (Mosaic forward, XLA-stencil
    # backward — ops/pallas_stencil.make_diff_pallas_collide), so gradient
    # studies scale to 10k+ bots on the production backend.
    frozen = params.replace(
        control=Control.FIXED_PHASE,
        phase_std=0.0,
    )
    step = jax.checkpoint(make_step(frozen, differentiable=True))
    n = params.n_cells

    def rollout(phase0: jax.Array, state0: SimState) -> jax.Array:
        state = state0._replace(phase=phase0)

        def body(s, _):
            return step(s), None

        final, _ = jax.lax.scan(body, state, None, length=n_steps)
        mask = active_mask(params, final.pos.shape[0])
        centroid_x = jnp.sum(
            jnp.where(mask, final.pos[:, 0], 0.0)
        ) / jnp.float32(n)
        return centroid_x

    return rollout


def optimize_phases(
    params: SimParams,
    state0: SimState,
    n_steps: int = 400,
    iters: int = 20,
    lr: float = 0.5,
    minimize: bool = True,
    phase0: jax.Array | None = None,
):
    """Gradient-descend per-bot phase offsets to drive the swarm centroid
    (minimize=True pushes it toward -x, i.e. the usual light direction).

    Returns (optimized phases, per-iteration objective history).
    Uses optax Adam when available, plain SGD otherwise.
    """
    rollout = make_phase_rollout(params, n_steps)
    sign = 1.0 if minimize else -1.0

    def loss(ph):
        return sign * rollout(ph, state0)

    value_and_grad = jax.jit(jax.value_and_grad(loss))

    n_pad = state0.pos.shape[0]
    if phase0 is None:
        # start from a small random spread so the wave has something to shape
        phase0 = 0.1 * jax.random.normal(jax.random.key(0), (n_pad,))
    ph = jnp.asarray(phase0, jnp.float32)

    try:
        import optax

        opt = optax.adam(lr)
        opt_state = opt.init(ph)

        def apply(ph, opt_state, g):
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(ph, updates), opt_state

    except ImportError:  # pragma: no cover
        opt_state = None

        def apply(ph, opt_state, g):
            return ph - lr * g, opt_state

    history = []
    for _ in range(iters):
        v, g = value_and_grad(ph)
        history.append(float(v))
        ph, opt_state = apply(ph, opt_state, g)
    history.append(float(jax.jit(loss)(ph)))
    return np.asarray(ph), np.asarray(history)
