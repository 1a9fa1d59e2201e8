"""Radius -> RGBA color mapping for rendering.

Re-derivation of ``updateCol_k``
(/root/reference/particlebot_kernel_impl.cuh:400-443): green falls with the
square of remaining expansion headroom, blue rises with the square root of
expansion, dead bots render black; optional shadow dimming halves HSL
lightness (display_shadow).  Colors feed only the renderer — unlike the
reference, the engine does not compute them inside the physics step (they
have no feedback into the dynamics), so this op runs only when a frame is
actually drawn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimParams
from .phase import in_shadow


def _rgb_to_hsl(r, g, b):
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    l = (mx + mn) / 2.0
    d = mx - mn
    achroma = d == 0
    safe_d = jnp.where(achroma, 1.0, d)
    s = jnp.where(
        achroma,
        0.0,
        jnp.where(l > 0.5, d / jnp.maximum(2.0 - mx - mn, 1e-12), d / jnp.maximum(mx + mn, 1e-12)),
    )
    h_r = (g - b) / safe_d + jnp.where(g < b, 6.0, 0.0)
    h_g = (b - r) / safe_d + 2.0
    h_b = (r - g) / safe_d + 4.0
    h = jnp.where(mx == r, h_r, jnp.where(mx == g, h_g, h_b)) / 6.0
    h = jnp.where(achroma, 0.0, h)
    return h, s, l


def _hue_to_rgb(p, q, t):
    t = jnp.where(t < 0, t + 1.0, t)
    t = jnp.where(t > 1, t - 1.0, t)
    return jnp.where(
        t < 1.0 / 6.0,
        p + (q - p) * 6.0 * t,
        jnp.where(
            t < 0.5,
            q,
            jnp.where(t < 2.0 / 3.0, p + (q - p) * (2.0 / 3.0 - t) * 6.0, p),
        ),
    )


def _hsl_to_rgb(h, s, l):
    q = jnp.where(l < 0.5, l * (1.0 + s), l + s - l * s)
    p = 2.0 * l - q
    r = _hue_to_rgb(p, q, h + 1.0 / 3.0)
    g = _hue_to_rgb(p, q, h)
    b = _hue_to_rgb(p, q, h - 1.0 / 3.0)
    achroma = s == 0
    return (
        jnp.where(achroma, l, r),
        jnp.where(achroma, l, g),
        jnp.where(achroma, l, b),
    )


def bot_colors(
    params: SimParams,
    rad: jax.Array,    # (n,)
    pos: jax.Array,    # (n, 2)
    dead: jax.Array,   # (n,) bool
) -> jax.Array:
    """(n, 4) float32 RGBA in [0, 1]."""
    f32 = jnp.float32
    span = f32(params.max_radius - params.min_radius)
    span = jnp.maximum(span, f32(1e-9))
    r = jnp.full_like(rad, 30.0 / 255.0)
    g = (20.0 + 180.0 * (f32(params.max_radius) - rad) ** 2 / span**2) / 255.0
    b = (
        30.0
        + 180.0
        * jnp.sqrt(jnp.maximum(rad - f32(params.min_radius), 0.0))
        / jnp.sqrt(span)
    ) / 255.0

    if params.display_shadow and (params.rect_obstacles or params.circle_obstacles):
        shadowed = in_shadow(params, pos)
        h, s, l = _rgb_to_hsl(r, g, b)
        r2, g2, b2 = _hsl_to_rgb(h, s, l / 2.0)
        r = jnp.where(shadowed, r2, r)
        g = jnp.where(shadowed, g2, g)
        b = jnp.where(shadowed, b2, b)

    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.where(dead[..., None], 0.0, rgb)
    alpha = jnp.ones_like(rad)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
