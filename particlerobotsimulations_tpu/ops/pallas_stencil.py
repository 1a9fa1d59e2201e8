"""Pallas TPU kernel for the neighbor-force stencil — the speed-of-light path.

The XLA stencil backend (ops/stencil.py) is algorithmically right but XLA
materializes the (G, G, C, C) pair intermediates to HBM (~1.8 GB/step at 10k
bots, measured 2.2 ms).  This kernel keeps the cell table VMEM-resident and
fuses the whole force accumulation, bringing the collide pass toward the VPU
flop floor.

Layout: fields are scattered into tables of shape **(C, G*G)** — capacity
slots along sublanes, cells (row-major, wrapped) along lanes.  The 3x3-cell x
C-slot interaction then decomposes into pure register-level data movement:

* cell offset dy (grid rows)  -> lane roll by ``dy * G`` (row-major flat wrap
  along y is exact);
* cell offset dx (grid cols)  -> pre-rolled OUTSIDE the kernel (a flat lane
  roll by ±1 would wrap row ends onto the next row, breaking the seam), so
  the kernel input carries three x-shifted copies of each field;
* slot pairing k (which of the C candidate slots) -> incremental sublane roll
  by one per iteration.

Per (dx, dy, k) pass the kernel does one fused elementwise force evaluation
over the whole (C, G*G) table — full (8, 128) lane tiling, no gathers, no
dynamic slices.  3*3*C - 1 passes total (the center k=0 pass is the self
pair and is skipped statically).  Cells two apart sneak into no window here
(unlike the lane-window variant) — coverage is exactly the 3x3 cells, matching
ops/stencil.py.

Pair physics constants match collideSpheres
(/root/reference/particlebot_kernel_impl.cuh:540-594) exactly; see
ops/forces.py for the annotated scalar form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimParams
from .forces import (
    MAGNET_INT1,
    MAGNET_INT2,
    MAGNET_MIN_ATTR,
    attraction_scale,
    friction_velocity_update,
    obstacle_forces,
)
from .grid import cell_ids

# field order in the stacked kernel input
FIELDS = ("px", "py", "vx", "vy", "rad", "val", "afac")
N_FIELDS = len(FIELDS)


def assign_slots_slotmajor(params: SimParams, pos, mask):
    """(n_pad,) flat slot per bot in the (C, G*G) slot-major layout:
    ``slot = rank * G*G + cell_id`` (rank = index within the cell).
    Out-of-range value G*G*C marks dropped bots (padding / overflow)."""
    g, cap = params.resolved_grid_dim(), params.cell_capacity
    n = pos.shape[0]
    cid = cell_ids(params, pos, mask)

    order = jnp.argsort(cid)
    scid = cid[order]
    arange = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), scid[1:] != scid[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, arange, 0))
    rank = arange - run_start

    in_range = scid < g * g
    keep = in_range & (rank < cap)
    slot_sorted = jnp.where(keep, rank * (g * g) + scid, g * g * cap)
    slot = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    overflow = jnp.sum((in_range & (rank >= cap)).astype(jnp.int32))
    return slot, overflow


def _pair_pass(params: SimParams, t, c, exclude_self: bool):
    """One fused elementwise pass over (C, G*G): forces on targets t from the
    aligned candidates c.  Identical math to ops/forces.py::pair_forces but
    rsqrt-first (float32 agrees to ~1 ulp).  Returns (fx, fy, mag_a, mag_c).
    """
    f32 = jnp.float32
    eps = f32(1.0e-12)
    dx = c["px"] - t["px"]
    dy = c["py"] - t["py"]
    d2 = jnp.maximum(dx * dx + dy * dy, eps * eps)
    inv_dist = jax.lax.rsqrt(d2)
    dist = d2 * inv_dist
    nx = dx * inv_dist
    ny = dy * inv_dist

    cd = t["rad"] + c["rad"]
    valid = t["val"] * c["val"]
    is_overlap = dist < cd
    overlap = jnp.where(is_overlap, valid, 0.0)
    attract = jnp.where(
        jnp.logical_and(~is_overlap, dist < f32(params.cutoff())), valid, 0.0
    )

    rvx = c["vx"] - t["vx"]
    rvy = c["vy"] - t["vy"]
    vn = rvx * nx + rvy * ny
    tx = rvx - vn * nx
    ty = rvy - vn * ny

    spring = f32(params.spring)
    damping = f32(params.damping)
    shear = f32(params.shear)
    fcx = -spring * (cd - dist) * nx + damping * rvx + shear * tx
    fcy = -spring * (cd - dist) * ny + damping * rvy + shear * ty

    gap = dist - cd
    attr = f32(params.attraction) * t["afac"] * c["afac"]
    i1, i2, mina = f32(MAGNET_INT1), f32(MAGNET_INT2), f32(MAGNET_MIN_ATTR)
    ramp = mina + (attr * f32(1.0 / (MAGNET_INT2 * MAGNET_INT2)) - mina) * f32(
        1.0 / (MAGNET_INT2 - MAGNET_INT1)
    ) * (gap - i1)
    inv2 = attr / (jnp.maximum(gap, eps) ** 2)
    mag = jnp.where(gap < i1, mina, jnp.where(gap < i2, ramp, inv2))
    fax = mag * nx
    fay = mag * ny

    fx = overlap * fcx + attract * fax
    fy = overlap * fcy + attract * fay
    mc = overlap * jnp.sqrt(fcx * fcx + fcy * fcy)
    ma = attract * mag  # mag >= 0 and n is unit, so |mag * n| == mag
    return fx, fy, ma, mc


def _make_kernel(params: SimParams):
    g, cap = params.resolved_grid_dim(), params.cell_capacity
    gg = g * g

    def kernel(stk, fx, fy, fa, fr):
        # stk: (3, N_FIELDS, C, G*G) — x-pre-rolled copies (dx = -1, 0, +1).
        def unstack(block):
            return {k: block[j] for j, k in enumerate(FIELDS)}

        t = unstack(stk[1])

        zeros = jnp.zeros((cap, gg), jnp.float32)
        acc = (zeros, zeros, zeros, zeros)

        for dx in range(3):
            base = stk[dx, :, :, :]  # (N_FIELDS, C, G*G)
            for dy in range(3):
                # y offset: row-major flat lane roll by dy*G is the exact
                # wrapped y shift.
                shift = ((dy - 1) * g) % gg
                cand = pltpu.roll(base, shift, axis=2) if shift else base

                is_center = dx == 1 and dy == 1

                def body(k, carry, is_center=is_center):
                    acc, c_blk = carry
                    c = unstack(c_blk)
                    dfx, dfy, dfa, dfr = _pair_pass(params, t, c, False)
                    if is_center:
                        # k == 0 pairs every slot with itself — drop it.
                        keep = jnp.where(k == 0, 0.0, 1.0).astype(jnp.float32)
                        dfx, dfy, dfa, dfr = (
                            dfx * keep, dfy * keep, dfa * keep, dfr * keep,
                        )
                    ax, ay, aa, ar = acc
                    # next slot pairing: sublane roll by one (static)
                    c_next = pltpu.roll(c_blk, cap - 1, axis=1)
                    return ((ax + dfx, ay + dfy, aa + dfa, ar + dfr), c_next)

                (acc, _) = jax.lax.fori_loop(0, cap, body, (acc, cand))

        fx[:, :] = acc[0]
        fy[:, :] = acc[1]
        fa[:, :] = acc[2]
        fr[:, :] = acc[3]

    return kernel


@functools.partial(jax.jit, static_argnums=0)
def _stencil_forces_pallas(params: SimParams, tables):
    """tables: dict of (C, G*G) f32 arrays -> (fx, fy, fa, fr) (C, G*G)."""
    g, cap = params.resolved_grid_dim(), params.cell_capacity
    gg = g * g

    # x-pre-roll: proper 2-D column wrap (reshape to (C, G, G), roll last)
    blocks = []
    for dx in (-1, 0, 1):
        fields = []
        for k in FIELDS:
            x = tables[k].reshape(cap, g, g)
            if dx:
                x = jnp.roll(x, -dx, axis=2)
            fields.append(x.reshape(cap, gg))
        blocks.append(jnp.stack(fields))
    stk = jnp.stack(blocks)  # (3, N_FIELDS, C, G*G)

    kernel = _make_kernel(params)
    out_shape = [jax.ShapeDtypeStruct((cap, gg), jnp.float32)] * 4
    fx, fy, fa, fr = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=out_shape,
        # Mosaic needs a real TPU; everywhere else run the interpreter so the
        # backend stays testable on CPU.
        interpret=jax.default_backend() == "cpu",
    )(stk)
    return fx, fy, fa, fr


def pallas_stencil_collide(
    params: SimParams,
    pos: jax.Array,
    vel: jax.Array,
    rad: jax.Array,
    mask: jax.Array,
    payload: jax.Array,
    dt: float,
):
    """Drop-in collide pass: scatter to table, Pallas stencil, gather back."""
    g, cap = params.resolved_grid_dim(), params.cell_capacity
    total = g * g * cap
    slot, _overflow = assign_slots_slotmajor(params, pos, mask)

    def scat(v):
        return (
            jnp.zeros((total,), jnp.float32).at[slot].set(v, mode="drop")
            .reshape(cap, g * g)
        )

    afac = attraction_scale(params, payload)
    tables = {
        "px": scat(pos[:, 0]),
        "py": scat(pos[:, 1]),
        "vx": scat(vel[:, 0]),
        "vy": scat(vel[:, 1]),
        "rad": scat(rad),
        "val": scat(mask.astype(jnp.float32)),
        "afac": scat(afac),
    }
    fx, fy, fa, fr = _stencil_forces_pallas(params, tables)

    safe_slot = jnp.minimum(slot, total - 1)
    got = mask & (slot < total)
    force = jnp.stack(
        [
            jnp.where(got, fx.reshape(total)[safe_slot], 0.0),
            jnp.where(got, fy.reshape(total)[safe_slot], 0.0),
        ],
        axis=-1,
    )
    abs_a = jnp.where(got, fa.reshape(total)[safe_slot], 0.0)
    abs_r = jnp.where(got, fr.reshape(total)[safe_slot], 0.0)

    f_obs, m_obs = obstacle_forces(params, pos, vel, rad)
    force = force + f_obs
    abs_r = abs_r + m_obs

    new_vel = friction_velocity_update(params, vel, force, payload, dt)
    new_vel = jnp.where(mask[..., None], new_vel, 0.0)
    return new_vel, abs_a, abs_r
