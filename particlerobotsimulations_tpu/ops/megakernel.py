"""Small-table megakernel: a whole k-step rebuild block in ONE Pallas call.

At 10k+ bots the table-resident step is compute-bound (the pair kernel is
~2/3 of the step), but at reference-default scales (501-2000 bots,
/root/reference/main.cpp:872,883) the step is dominated by the fixed cost of
dispatching ~30 tiny XLA ops per step — the pair math at 1k bots is ~18M
f32 ops (~9 us of VPU) inside a 19.3 us step.  This module removes that
floor for tables small enough to live entirely in VMEM: one `pallas_call`
runs a full ``slot_rebuild_steps``-step block — radius controller,
integrate + boundary, the incremental slot rebuild (rank-and-place, same
formulation as ops/table_rebuild.py), the 5-block Newton pair stencil
(same formulation as ops/pallas_stencil.py, with the preshift/realign as
in-kernel lane rolls), obstacle forces and stick-slip friction — with the
field planes held in registers/VMEM throughout.

Scope and semantics:

* Only UNGATED blocks (no dead injection / centroid / phase steps) run in
  the megakernel — the segment-gated chunk loop (engine_table.gate_seg)
  already guarantees interval gates can only fire on the first step of a
  segment, which stays on the regular path.  Ungated steps consume no RNG
  and never touch the centroid ring, so the megakernel carry is just
  (table planes, parking-strip planes, origin, step).
* The in-kernel rebuild reports the same ``ok`` preconditions as
  ops/table_rebuild.incremental_rebuild (>1-cell move, cell overflow,
  occupied wrapped edge columns).  On failure the caller discards the
  whole block and re-runs it through the regular step path (whose exact
  argsort fallback re-anchors the grid) — rebuild failures are rare
  (edge-guard drift, compression overflow), so the redo cost is noise.
* Eligibility (``mega_eligible``): PALLAS backend, no overflow spill
  sublanes, and a table of at most 2**14 rows (G in {16, 32} at the
  default capacity 16) so state + pair temporaries fit VMEM.

Physics is the same op order as engine_table.make_table_step (reference
/root/reference/particlebot.cpp:170-300): radius, integrate, [rebuild],
collide, friction.  Mosaic's fusion choices may differ from XLA's by 1 ulp
on identical float32 expressions, so cross-path comparisons are tolerance
-based, like every other kernel pair in this package (the golden fixtures
pin the DENSE backend only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimParams
from .actuation import update_radius
from .forces import (
    friction_velocity_update_xy,
    obstacle_forces_xy,
)
from .pallas_stencil import OFFSETS, _kernel_fields, _pair_block
from .table_rebuild import OFFSETS9, _FAR

# row budget: G=32 at capacity 16.  State planes (13 x 16 x 1024 f32
# = 832 KB) + 5 pre-rolled candidate blocks + (C, C, G*G) pair
# temporaries stay well under the ~16 MB VMEM budget.
MAX_ROWS = 1 << 14

def mega_eligible(params: SimParams) -> bool:
    """Whether the table-resident chunk loop may use the megakernel."""
    from ..config import ForceBackend

    # EXPERIMENTAL, opt-in via PBOT_MEGA=1 (read per call so tests can
    # toggle it around make_run_chunk_table).  First TPU measurement at 1k
    # bots: 55.5 us/step vs 19.2 regular — the fused form is currently
    # LOSING to the XLA-glued path (suspected scoped-VMEM pressure from
    # the unrolled k-step body and in-kernel roll cost); kept off by
    # default until it wins.
    if os.environ.get("PBOT_MEGA", "0") != "1":
        return False
    p = params
    if p.resolved_backend() != ForceBackend.PALLAS:
        return False
    g = p.resolved_grid_dim()
    if g * g * p.storage_capacity() > MAX_ROWS:
        return False
    if p.resolved_overflow_slots() != 0:
        return False
    if not (1 <= max(1, p.slot_rebuild_steps) <= 8):
        return False
    return True


def _roll(x: jax.Array, shift: int, interpret: bool) -> jax.Array:
    """Static non-negative lane roll (last axis) inside the kernel."""
    n = x.shape[-1]
    s = shift % n
    if s == 0:
        return x
    if interpret:
        return jnp.roll(x, s, axis=-1)
    return pltpu.roll(x, s, axis=x.ndim - 1)


def _make_kernel(params: SimParams, n_pad: int, interpret: bool):
    """Kernel body over full-table VMEM blocks.

    refs: scalars (1, 128) f32 [origin_x, origin_y, step], tbl
    (N_TF, C, gg), strip (N_TF, S, 128) -> tbl', strip', ok (1, 128) f32,
    with rebuild scratch (n_move, C, gg) + (1, gg)."""
    from ..engine_table import MOVE_FIELDS, TABLE_FIELDS

    p = params
    g, cap = p.resolved_grid_dim(), p.cell_capacity
    gg = g * g
    k_steps = max(1, p.slot_rebuild_steps)
    dt = p.timestep
    f32 = jnp.float32
    i32 = jnp.int32
    # NOTE: keep build-time values as python floats — jnp.float32() makes a
    # jax Array here, which the kernel would capture as an illegal constant
    h = float(p.cutoff())
    kfields = _kernel_fields(p)
    idx = {k: j for j, k in enumerate(TABLE_FIELDS)}
    n_move = len(MOVE_FIELDS)
    has_obstacles = bool(p.circle_obstacles or p.rect_obstacles)

    def integrate_xy(d):
        hi = f32(p.world_half) - d["rad"]
        lo = -f32(p.world_half) + d["rad"]
        bd = f32(p.boundary_damping)
        for c, v in (("px", "vx"), ("py", "vy")):
            new_p = d[c] + d[v] * f32(dt)
            out = (new_p > hi) | (new_p < lo)
            d[c] = jnp.clip(new_p, lo, hi)
            d[v] = jnp.where(out, d[v] * bd, d[v])
        return d

    def pre(d, time):
        d["rad"] = update_radius(
            p, d["rad"], d["phase"], d["aa"], d["ar"],
            d["dead"] > 0.5, d["val"] > 0.5, time, f32(dt),
        )
        return integrate_xy(d)

    def pair_forces_tbl(f):
        """5-block Newton stencil on (C, gg) planes; preshift/realign as
        in-kernel flat lane rolls (edge-guarded: the table loop's anchoring
        invariant keeps wrapped edge columns empty, ops/pallas_stencil.py).
        """

        def derive(d):
            if "val" not in kfields:
                d["val"] = (d["rad"] > 0).astype(f32)
            if "afac" not in kfields:
                d["afac"] = d["val"]
            return d

        t = derive({k: f[k][:, None, :] for k in kfields})
        acc = [jnp.zeros((cap, gg), f32) for _ in range(4)]
        for b, (dx, dy) in enumerate(OFFSETS):
            sft = (-(dy * g + dx)) % gg
            c = derive(
                {k: _roll(f[k], sft, interpret)[None, :, :] for k in kfields}
            )
            dfx, dfy, dfa, dfr = _pair_block(p, t, c, b == 0, cap)
            acc[0] = acc[0] + jnp.sum(dfx, axis=1)
            acc[1] = acc[1] + jnp.sum(dfy, axis=1)
            acc[2] = acc[2] + jnp.sum(dfa, axis=1)
            acc[3] = acc[3] + jnp.sum(dfr, axis=1)
            if b == 0:
                # in-cell Newton reaction: already aligned to this lane
                acc[0] = acc[0] - jnp.sum(dfx, axis=0)
                acc[1] = acc[1] - jnp.sum(dfy, axis=0)
                acc[2] = acc[2] + jnp.sum(dfa, axis=0)
                acc[3] = acc[3] + jnp.sum(dfr, axis=0)
            else:
                # reactions belong at cell (y+dy, x+dx): inverse roll
                back = (dy * g + dx) % gg
                acc[0] = acc[0] - _roll(jnp.sum(dfx, axis=0), back, interpret)
                acc[1] = acc[1] - _roll(jnp.sum(dfy, axis=0), back, interpret)
                acc[2] = acc[2] + _roll(jnp.sum(dfa, axis=0), back, interpret)
                acc[3] = acc[3] + _roll(jnp.sum(dfr, axis=0), back, interpret)
        return acc

    def post(d, s):
        fx, fy, fa, fr = pair_forces_tbl(d)
        d["aa"], d["ar"] = fa, fr
        s["aa"] = jnp.zeros_like(s["aa"])
        s["ar"] = jnp.zeros_like(s["ar"])
        if has_obstacles:
            for e in (d, s):
                ofx, ofy, om = obstacle_forces_xy(
                    p, e["px"], e["py"], e["vx"], e["vy"], e["rad"]
                )
                e["ar"] = e["ar"] + om
                if e is d:
                    fx, fy = fx + ofx, fy + ofy
                else:
                    sfx, sfy = ofx, ofy
        else:
            sfx = jnp.zeros_like(s["px"])
            sfy = sfx
        for e, ex, ey in ((d, fx, fy), (s, sfx, sfy)):
            nvx, nvy = friction_velocity_update_xy(
                p, e["vx"], e["vy"], ex, ey, e["pay"] > 0.5, f32(dt)
            )
            val = e["val"] > 0.5
            e["vx"] = jnp.where(val, nvx, 0.0)
            e["vy"] = jnp.where(val, nvy, 0.0)
        return d, s

    def rebuild(d, ox, oy, reb_acc, reb_cnt):
        """In-kernel incremental rank-and-place rebuild; returns
        (new fields, ok).  Same preconditions and offset order as
        ops/table_rebuild.incremental_rebuild — bit-identical placement
        when ok (skipped mover offsets match nothing)."""
        val = d["val"] > 0.5
        ixt = jnp.floor((d["px"] - ox) / f32(h)).astype(i32) % g
        iyt = jnp.floor((d["py"] - oy) / f32(h)).astype(i32) % g
        lane = jax.lax.broadcasted_iota(i32, (cap, gg), 1)
        ixc = lane % g
        iyc = lane // g

        def wrapc(x):
            return ((x + g // 2) % g) - g // 2

        dx = wrapc(ixt - ixc)
        dy = wrapc(iyt - iyc)
        moved_far = jnp.any(val & ((jnp.abs(dx) > 1) | (jnp.abs(dy) > 1)))
        edge = jnp.any(
            val & ((ixc == 0) | (ixc == g - 1) | (ixt == 0) | (ixt == g - 1))
        )
        dxf = jnp.where(val, dx.astype(f32), f32(_FAR))
        dyf = jnp.where(val, dy.astype(f32), f32(_FAR))

        row = jax.lax.broadcasted_iota(i32, (cap, cap), 0)
        col = jax.lax.broadcasted_iota(i32, (cap, cap), 1)
        tri = (col < row).astype(f32)  # strictly lower
        c2 = jax.lax.broadcasted_iota(i32, (1, cap, 1), 1).astype(f32)

        reb_acc[...] = jnp.zeros_like(reb_acc)
        reb_cnt[...] = jnp.zeros_like(reb_cnt)

        def block(bx, by):
            sft = (-(by * g + bx)) % gg
            m = jnp.logical_and(
                _roll(dxf, sft, interpret) == f32(-bx),
                _roll(dyf, sft, interpret) == f32(-by),
            ).astype(f32)
            pre_rank = jax.lax.dot_general(
                tri, m,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            rank = pre_rank + reb_cnt[...]
            place = (rank[:, None, :] == c2).astype(f32) * m[:, None, :]
            for j, kf in enumerate(MOVE_FIELDS):
                cand = _roll(d[kf], sft, interpret)
                reb_acc[j, :, :] += jnp.sum(
                    place * cand[:, None, :], axis=0
                )
            reb_cnt[...] += jnp.sum(m, axis=0, keepdims=True)

        block(0, 0)
        for bx, by in OFFSETS9[1:]:
            movers = jnp.sum(
                (val & (dx == -bx) & (dy == -by)).astype(i32)
            )

            @pl.when(movers > 0)
            def _(bx=bx, by=by):
                block(bx, by)

        overflow = jnp.any(reb_cnt[...] > f32(cap))
        ok = ~(moved_far | overflow | edge)

        nd = dict(d)
        for j, kf in enumerate(MOVE_FIELDS):
            nd[kf] = reb_acc[j, :, :]
        return nd, ok

    def derived_rows(e):
        """Re-derive the bid-dependent static planes after a rebuild
        (engine_table._derived_rows — which the regular path applies to
        the WHOLE flat array, parking strip included)."""
        nval = e["val"] > 0.5
        if p.has_payload:
            is_pay = nval & (e["bid"].astype(i32) == p.n_cells - 1)
            e["pay"] = is_pay.astype(f32)
            e["afac"] = jnp.where(
                is_pay, f32(p.attraction_factor), f32(1.0)
            ) * nval.astype(f32)
        else:
            e["pay"] = jnp.zeros_like(e["bid"])
            e["afac"] = nval.astype(f32)
        return e

    def kernel(sc_ref, tbl_ref, strip_ref, tbl_out, strip_out, ok_out,
               reb_acc, reb_cnt):
        d = {kf: tbl_ref[j] for j, kf in enumerate(TABLE_FIELDS)}
        s = {kf: strip_ref[j] for j, kf in enumerate(TABLE_FIELDS)}
        ox, oy = sc_ref[0, 0], sc_ref[0, 1]
        step0 = sc_ref[0, 2]
        ok = jnp.bool_(True)
        for j in range(k_steps):
            time = (step0 + f32(j)) * f32(dt)
            d = pre(d, time)
            s = pre(s, time)
            if j == k_steps - 1:
                d, ok = rebuild(d, ox, oy, reb_acc, reb_cnt)
                d = derived_rows(d)
                s = derived_rows(s)
            d, s = post(d, s)
        for j, kf in enumerate(TABLE_FIELDS):
            tbl_out[j] = d[kf]
            strip_out[j] = s[kf]
        ok_out[...] = jnp.full((1, 128), 0.0, f32) + ok.astype(f32)

    return kernel


def make_mega_block(params: SimParams, n_pad: int):
    """Returns ``block(tbl, strip, origin, step) -> (tbl', strip', ok)``.

    tbl: (N_TF, C, G*G) f32 table planes; strip: (N_TF, n_pad//128, 128)
    parking-strip planes; origin: (2,) f32; step: () int32 (entry step of
    the block).  ``ok`` is a f32 scalar — 0.0 means the in-kernel rebuild's
    preconditions failed and the caller must discard the outputs and redo
    the block on the regular path."""
    from ..engine_table import TABLE_FIELDS

    p = params.validate()
    g, cap = p.resolved_grid_dim(), p.cell_capacity
    gg = g * g
    n_tf = len(TABLE_FIELDS)
    n_move = 9
    s_sub = n_pad // 128
    interpret = jax.default_backend() == "cpu"
    kernel = _make_kernel(p, n_pad, interpret)

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tf, cap, gg), jnp.float32),
            jax.ShapeDtypeStruct((n_tf, s_sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_move, cap, gg), jnp.float32),
            pltpu.VMEM((1, gg), jnp.float32),
        ],
        interpret=interpret,
    )

    def block(tbl, strip, origin, step):
        sc = jnp.concatenate(
            [
                origin.astype(jnp.float32),
                step.astype(jnp.float32)[None],
                jnp.zeros((125,), jnp.float32),
            ]
        ).reshape(1, 128)
        tbl2, strip2, okp = call(sc, tbl, strip)
        return tbl2, strip2, okp[0, 0]

    return block
