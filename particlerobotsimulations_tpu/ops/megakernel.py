"""Small-table megakernel: the ungated span between two slot rebuilds in
ONE Pallas call.

At 10k+ bots the table-resident step is compute-bound (the pair kernel is
~2/3 of the step), but at reference-default scales (501-2000 bots,
/root/reference/main.cpp:872,883) the step is dominated by the fixed cost
of dispatching ~30 tiny XLA ops per step — the pair math at 1k bots is
~18M f32 ops (~9 us of VPU) inside a 19.3 us step.  This module removes
that floor for tables small enough to live entirely in VMEM: one
``pallas_call`` runs the whole ungated span between two rebuilds — radius
controller, integrate + boundary, the 5-block Newton pair stencil (same
formulation as ops/pallas_stencil.py, with the preshift/realign as
in-kernel lane rolls), obstacle forces and stick-slip friction — with the
field planes held in VMEM throughout.

Phase-shifted span decomposition: the canonical k-step rebuild block is
``pre(b), post(b), ..., pre(b+k-1), REBUILD, post(b+k-1)`` (reference op
order /root/reference/particlebot.cpp:170-300 — the rebuild sits between
integrate and collide).  Rather than performing the rebuild in-kernel
(a 9-offset rank-and-place inside the kernel measured ~45 us/rebuild of
pure Mosaic scheduling loss — any kernel containing the nine blocks ran
every step ~5x slower regardless of gating, rolls, or MXU use), the span
is cut AROUND the rebuild::

    span(b) = post(b-1), pre(b), post(b), ..., post(b+k-2), pre(b+k-1)

so the caller (engine_table.make_run_chunk_table) chains
``span -> _smart_rebuild -> span -> _smart_rebuild -> ...`` and the slot
rebuild between spans is the regular path's own compaction kernel
(ops/table_rebuild.py) with its exact-argsort fallback — bit-identical
rebuild semantics, no redo machinery.  Every span carries its head
``post(b-1)`` unconditionally: the caller's gated entry block ends after
``pre + rebuild`` (its final post belongs to an ungated step, so handing
it to the first span is semantics-preserving), which keeps the kernel
loop body a bare ``[post; pre]`` pair — a ``pl.when``-predicated head
post was measured at 44 us/step (4x): Mosaic predication of a large
region poisons the schedule of every iteration, the same disease as the
in-kernel rebuild.

Scope and semantics:

* Only UNGATED steps (no dead injection / centroid / phase steps) run in
  the megakernel — the segment-gated chunk loop (engine_table.gate_seg)
  already guarantees interval gates can only fire on the first step of a
  segment, which stays on the regular path.  Ungated steps consume no RNG
  and never touch the centroid ring, so the span carry is just
  (table planes, parking-strip planes, step).
* Eligibility (``mega_eligible``): PALLAS backend, no overflow spill
  sublanes, and a table of at most 2**12 rows (G=16 at the default
  capacity 16, bots up to ~1.2k) so state + pair temporaries fit VMEM
  without starving the Mosaic scheduler (G=32 compiles with a raised
  scoped-VMEM limit but runs ~2x slower than the regular path).

Mosaic's fusion choices may differ from XLA's by 1 ulp on identical
float32 expressions, so cross-path comparisons are tolerance-based, like
every other kernel pair in this package (the golden fixtures pin the
DENSE backend only).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimParams
from .forces import (
    friction_velocity_update_xy,
    obstacle_forces_xy,
)
from .integrate import radius_integrate_planes
from .pallas_stencil import OFFSETS, _derive_fields, _kernel_fields, _pair_block

# row budget: G=16 at capacity 16 — the ONLY table size where the fused
# span wins.  G=32 (gg=1024 lanes) needs ~31 MB of scoped VMEM for the
# pair-block temporaries (over Mosaic's 16 MB default); raising the limit
# compiles but serializes the schedule: measured 55-56 us/step at 2k/4k
# vs 28/47 on the regular path.  G=16 state + temporaries fit comfortably
# (13 x 16 x 256 planes = 208 KB each way, ~256 KB per pair temporary).
MAX_ROWS = 1 << 12


def mega_eligible(params: SimParams) -> bool:
    """Whether the table-resident chunk loop may use the megakernel."""
    from ..config import ForceBackend

    # default ON for eligible (G=16) tables; opt out via PBOT_MEGA=0
    # (read per call so tests can toggle it around make_run_chunk_table)
    if os.environ.get("PBOT_MEGA", "1") == "0":
        return False
    p = params
    if p.resolved_backend() != ForceBackend.PALLAS:
        return False
    g = p.resolved_grid_dim()
    if g * g * p.storage_capacity() > MAX_ROWS:
        return False
    # the parking strip (all n_pad bot rows, N_TF planes) also lives in
    # scoped VMEM for the whole span — a small user-forced grid with a large
    # bot count must fall back to the regular path, not OOM in Mosaic
    from ..config import padded_n

    if padded_n(p) > MAX_ROWS:
        return False
    if p.resolved_overflow_slots() != 0:
        return False
    if max(1, p.resolved_slot_rebuild_steps()) > 8:
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


def _make_kernel(params: SimParams, interpret: bool):
    """Kernel body over full-table VMEM blocks.

    refs: scalars (1, 128) f32 [step0, 0...], tbl (N_TF, C, gg),
    strip (N_TF, S, 128) -> tbl', strip'."""
    from ..engine_table import TABLE_FIELDS

    p = params
    g, cap = p.resolved_grid_dim(), p.cell_capacity
    gg = g * g
    k_steps = max(1, p.resolved_slot_rebuild_steps())
    dt = p.timestep
    f32 = jnp.float32
    # NOTE: keep build-time values as python floats — jnp.float32() makes a
    # jax Array here, which the kernel would capture as an illegal constant
    kfields = _kernel_fields(p)
    has_obstacles = bool(p.circle_obstacles or p.rect_obstacles)

    def pre(d, time):
        # radius controller + integrate/boundary: the exact plane-form
        # shared with engine_table.step_pre (ops/integrate.py)
        return radius_integrate_planes(p, d, time)

    def pair_forces_tbl(f):
        """5-block Newton stencil on (C, gg) planes; preshift/realign as
        in-kernel flat lane rolls (edge-guarded: the table loop's anchoring
        invariant keeps wrapped edge columns empty, ops/pallas_stencil.py).
        """

        def derive(d):
            return _derive_fields(kfields, d)

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

    def kernel(sc_ref, tbl_ref, strip_ref, tbl_out, strip_out):
        # state lives in the OUTPUT refs (used as in-place scratch) and the
        # loop is a fori_loop with ONE bare (post, pre) pair compiled in
        # the body — a python-unrolled k-step body was 4x the Mosaic
        # program and scheduled ~3x slower (scoped-VMEM pressure), and ANY
        # predication of a large region (pl.when on the head post or on an
        # in-kernel rebuild) poisons the schedule of every iteration
        # (measured 4-5x).  Iteration j runs post(step0 + j - 1) then
        # pre(step0 + j): over j = 0..k-1 that is exactly the span
        # post(b-1) full(b..b+k-2) pre(b+k-1).
        step0 = sc_ref[0, 0]
        tbl_out[...] = tbl_ref[...]
        strip_out[...] = strip_ref[...]

        def read(ref):
            return {kf: ref[j] for j, kf in enumerate(TABLE_FIELDS)}

        def write(ref, e):
            for j, kf in enumerate(TABLE_FIELDS):
                ref[j] = e[kf]

        def body(j, carry):
            d, s = post(read(tbl_out), read(strip_out))
            write(tbl_out, d)
            write(strip_out, s)

            time = (step0 + j.astype(f32)) * f32(dt)
            d = pre(read(tbl_out), time)
            s = pre(read(strip_out), time)
            write(tbl_out, d)
            write(strip_out, s)
            return carry

        jax.lax.fori_loop(0, k_steps, body, 0)

    return kernel


def make_mega_span(params: SimParams, n_pad: int):
    """Returns ``span(tbl, strip, step) -> (tbl', strip')``.

    tbl: (N_TF, C, G*G) f32 table planes; strip: (N_TF, n_pad//128, 128)
    parking-strip planes; step: () int32 — the first step of the k-step
    rebuild block this span belongs to.  The input state must be
    MID-STEP ``step - 1`` (after integrate + rebuild): the span opens
    with the carried-over ``post(step - 1)`` of the previous block, runs
    k-1 full steps, and ends mid-step ``step + k - 1`` after integrate —
    the caller must run the slot rebuild (engine_table._smart_rebuild)
    and then either the next span or, at the segment end, the regular
    path's ``step_post``."""
    from ..engine_table import TABLE_FIELDS

    p = params.validate()
    g = p.resolved_grid_dim()
    cap = p.cell_capacity
    gg = g * g
    n_tf = len(TABLE_FIELDS)
    s_sub = n_pad // 128
    interpret = jax.default_backend() == "cpu"
    kernel = _make_kernel(p, interpret)

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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tf, cap, gg), jnp.float32),
            jax.ShapeDtypeStruct((n_tf, s_sub, 128), jnp.float32),
        ],
        interpret=interpret,
    )

    def span(tbl, strip, step):
        sc = jnp.concatenate(
            [
                step.astype(jnp.float32)[None],
                jnp.zeros((127,), jnp.float32),
            ]
        ).reshape(1, 128)
        return call(sc, tbl, strip)

    return span
