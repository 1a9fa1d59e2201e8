"""Incremental slot rebuild — a structured compaction kernel, no sorting.

The full slot rebuild (engine_table._rebuild) routes all state through bot
order: one wide row gather, an argsort-based reassignment, one wide row
scatter.  Random-index gathers/scatters and sorts are latency monsters on
TPU (measured ~620 us per rebuild at 10k bots — more than the whole physics
step), yet between rebuilds every bot moves at most ONE cell (the same
speed bound that makes slot reuse safe at all; see
config.slot_rebuild_steps).  So the rebuild is really a local stencil
operation:

* each occupied row's true cell differs from its current lane by
  dx, dy in {-1, 0, 1};
* for every target lane, candidate rows live in the 9 neighbor lanes, i.e.
  at LINEAR lane offsets {dy*G + dx} — compile-time constants;
* per target lane, matched candidates are compacted into slots 0..k-1 by
  rank-and-place: rank = running count over (offset, sublane) order via a
  strictly-lower-triangular matmul (MXU) per offset; placement is a one-hot
  (C, C, L) broadcast contraction (VPU) — the same shape family as the
  force kernel's pair blocks.

Unlike the force kernel's pre-rolled blocks, the neighbor offsets here are
taken as STATIC SLICES of one halo-extended plane stack: the kernel's
window is assembled from (2*n_halo + 1) adjacent 128-lane tiles of the same
array via staggered BlockSpec index maps, so the XLA glue does no rolls and
no 9x data duplication.  Linear lane arithmetic equals the true 2-D wrap
for the y axis exactly (lane = iy*G + ix); for the x axis it is wrong only
when a read crosses a row boundary, which can only matter if the wrapped
edge columns (ix = 0 or G-1) are occupied or receive movers.  The engine
keeps the blob away from those columns (origin margin, EDGE_MARGIN cells)
and this module's ``ok`` result falls back to the exact rebuild whenever
the guard fails — along with >1-cell moves, cell-capacity overflow, and
parked bots.

The anchor origin stays FIXED for a whole run chunk (it re-anchors at
every chunk entry and every fallback); swarm drift just wraps, like the
reference's power-of-2 hash wrap
(/root/reference/particlebot_kernel_impl.cuh:114-120).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimParams
from .grid import OFFSETS9  # movers can go any of 8 ways, plus stay

CHUNK = 128          # target-lane tile; G*G is always a multiple of 256
EDGE_MARGIN = 2      # empty wrapped-edge columns the engine maintains
_FAR = 99            # dx/dy sentinel for empty rows (never matches)


def _n_halo(g: int) -> int:
    """Halo tiles per side: cover lane offsets up to g+1."""
    return -(-(g + 1) // CHUNK)


def _make_compact_kernel(n_fields: int, cap: int, g: int):
    """Kernel over (2*n_halo+1) window tiles of (n_fields+2, C, CHUNK).

    Plane layout: [0..n_fields) data fields, then dx, dy (f32, _FAR for
    empty rows).  Outputs the compacted data planes and the per-lane
    incoming count.  Scalar-prefetch gates:

    * occ (per tile) — a window with no occupied rows outputs zeros;
    * offc (per tile x mover offset) — the 8 non-center offset blocks run
      ONLY when a row in the window actually moves by that offset.  Bots
      drift ~1e-3 cells between rebuilds, so ~20 movers exist per rebuild
      at 10k bots and the average tile evaluates ~1 mover block instead of
      8 — rank-and-place (tri-matmul + one-hot placement over all fields)
      is the rebuild's compute bulk.  Accumulators live in VMEM scratch so
      values need not cross the pl.when regions; skipped offsets match
      nothing, so the running rank base is unchanged — bit-identical to
      the ungated loop."""
    nh = _n_halo(g)
    base = nh * CHUNK  # window-local index of target lane t=0

    def kernel(occ_ref, offc_ref, *refs):
        (*win_refs, out_ref, cnt_ref, acc_scr, cnt_scr) = refs
        i = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

        @pl.when(occ_ref[i] > 0)
        def _():
            window = jnp.concatenate([r[...] for r in win_refs], axis=-1)
            f32 = jnp.float32
            row = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
            tri = (col < row).astype(f32)  # strictly lower
            c2 = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1).astype(f32)

            def block(ox, oy):
                """Rank-and-place rows moving by (ox, oy) into this tile,
                on top of the running scratch accumulators."""
                lo = base + oy * g + ox  # static window-local slice start
                cand = window[:, :, lo : lo + CHUNK]
                m = jnp.logical_and(
                    cand[n_fields] == f32(-ox), cand[n_fields + 1] == f32(-oy)
                ).astype(f32)
                # rank of each matched candidate = matched-before-it here
                # (strict-lower-tri matmul over sublanes) + running count
                pre = jax.lax.dot_general(
                    tri, m,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                rank = pre + cnt_scr[...]
                # one-hot place: P[c1, c2, l] = (rank == c2) & matched
                p = (rank[:, None, :] == c2).astype(f32) * m[:, None, :]
                for j in range(n_fields):
                    acc_scr[j, :, :] += jnp.sum(p * cand[j][:, None, :], axis=0)
                cnt_scr[...] += jnp.sum(m, axis=0, keepdims=True)

            # center offset (rows that stay in their cell): nearly all rows,
            # always evaluated — seeds the scratch accumulators
            acc_scr[...] = jnp.zeros_like(acc_scr)
            cnt_scr[...] = jnp.zeros_like(cnt_scr)
            block(0, 0)

            for o, (ox, oy) in enumerate(OFFSETS9[1:]):
                @pl.when(offc_ref[i, o] > 0)
                def _(ox=ox, oy=oy):
                    block(ox, oy)

            out_ref[...] = acc_scr[...]
            cnt_ref[0, :] = cnt_scr[0, :]

    return kernel


def compact_padded(
    params: SimParams,
    n_fields: int,
    val_idx: int,
    padded: jax.Array,   # (n_fields+2, C_storage, pad + out_lanes + pad)
    pad_lanes: int,      # halo width per side, multiple of CHUNK
    out_lanes: int,      # center width, multiple of CHUNK
):
    """Rank-and-place compaction for the CENTER region of an explicitly
    padded plane stack -> (compacted center planes, per-lane incoming
    count).  The global path (_compact) pads with the table's own wrap;
    the sharded path (parallel/spatial_table.py) pads with neighbor-shard
    halo rows exchanged over ICI — a row that migrates across a shard
    boundary is dropped by its owner and placed by the neighbor in this
    same pass (it sits in the neighbor's halo window)."""
    g, cap = params.resolved_grid_dim(), params.storage_capacity()
    nh = _n_halo(g)
    nfp = n_fields + 2
    assert pad_lanes % CHUNK == 0 and out_lanes % CHUNK == 0
    pad_tiles = pad_lanes // CHUNK
    assert pad_tiles >= nh

    kernel = _make_compact_kernel(n_fields, cap, g)
    n_tiles = 2 * nh + 1
    n_out_tiles = out_lanes // CHUNK
    total_tiles = padded.shape[-1] // CHUNK

    def window_count(per_row):
        """Per-center-tile count of flagged rows anywhere in the tile's
        halo window (windowed sum over padded tiles, no wrap — the pad
        carries the wrap/neighbor data)."""
        tile = jnp.sum(
            per_row.reshape(cap, total_tiles, CHUNK), axis=(0, 2)
        )
        win = jnp.zeros((n_out_tiles,), tile.dtype)
        for sft in range(-nh, nh + 1):
            win = win + jax.lax.dynamic_slice(
                tile, (pad_tiles + sft,), (n_out_tiles,)
            )
        return win.astype(jnp.int32)

    # conservative per-tile gates: occupancy anywhere in the window (if
    # zero, no row can land here) and, per mover offset, whether any row
    # in the window moves by exactly that offset (see kernel docstring)
    val_rows = padded[val_idx] > 0.5
    win_occ = window_count(val_rows)
    dxp, dyp = padded[n_fields], padded[n_fields + 1]
    off_cnt = jnp.stack(
        [
            window_count(val_rows & (dxp == -ox) & (dyp == -oy))
            for ox, oy in OFFSETS9[1:]
        ],
        axis=-1,
    )  # (n_out_tiles, 8)

    tile0 = pad_tiles - nh  # first window tile for center tile 0
    in_specs = [
        pl.BlockSpec(
            (nfp, cap, CHUNK),
            functools.partial(
                lambda k, i, occ, mov: (0, 0, i + k + tile0), k
            ),
            memory_space=pltpu.VMEM,
        )
        for k in range(n_tiles)
    ]
    out, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_out_tiles,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (n_fields, cap, CHUNK), lambda i, occ, mov: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, CHUNK), lambda i, occ, mov: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_fields, cap, CHUNK), jnp.float32),
                pltpu.VMEM((1, CHUNK), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_fields, cap, out_lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, out_lanes), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(win_occ, off_cnt, *([padded] * n_tiles))
    return out, cnt[0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _compact(params: SimParams, n_fields: int, val_idx: int, planes: jax.Array):
    """planes (n_fields+2, C_storage, G*G) -> (compacted planes,
    per-lane incoming count (G*G,)).  ``val_idx`` locates the occupancy
    plane for the skip gate.  C_storage includes the overflow spill
    sublanes: rows ranked past cell_capacity stay resident (invisible to
    the force kernel) instead of forcing the exact fallback."""
    g = params.resolved_grid_dim()
    gg = g * g
    halo = _n_halo(g) * CHUNK

    # wrap halos: lane arithmetic is exact for y (lane = iy*G + ix), and the
    # x edge columns are guarded empty by the caller
    padded = jnp.concatenate(
        [planes[:, :, gg - halo :], planes, planes[:, :, :halo]], axis=-1
    )
    return compact_padded(params, n_fields, val_idx, padded, halo, gg)


def _wrap_center(d: jax.Array, g: int) -> jax.Array:
    return ((d + g // 2) % g) - g // 2


def incremental_rebuild(
    params: SimParams,
    fields: dict,           # str -> (total_ext,) f32, engine_table layout
    field_names: tuple,     # ordered field names (engine_table.TABLE_FIELDS)
    origin: jax.Array,      # (2,) f32 — the chunk's fixed grid anchor
):
    """Returns (new_fields, ok).  ``ok`` False means the caller must run the
    exact full rebuild instead (>1-cell move, overflow, or occupied wrapped
    edge columns).  Parked bots do NOT veto the incremental path — they ride
    through untouched and only get reinstatement attempts at a genuine
    fallback or chunk entry (see the NOTE in incremental_rebuild_planes)."""
    g, cap = params.resolved_grid_dim(), params.storage_capacity()
    gg = g * g
    total = gg * cap
    nf = len(field_names)

    planes = jnp.stack(
        [fields[k][:total] for k in field_names]
    ).reshape(nf, cap, gg)
    new_planes, ok = incremental_rebuild_planes(
        params, planes, field_names, origin
    )
    new_fields = {
        k: jnp.concatenate(
            [new_planes[j].reshape(total), fields[k][total:]]
        )
        for j, k in enumerate(field_names)
    }
    return new_fields, ok


def rebuild_move_planes(
    params: SimParams,
    planes: jax.Array,      # (nf, C, L) f32 — stacked field planes
    field_names: tuple,     # names for planes' leading axis (px/py/val)
    origin: jax.Array,      # (2,) f32 — the chunk's fixed grid anchor
    lane_offset=0,          # global lane index of planes' first lane —
                            # nonzero for a shard's local lane block
):
    """(dxf, dyf, moved_far, edge): per-row wrapped cell displacements
    (``_FAR`` on empty rows) and the incremental-compaction preconditions.
    Shared by the single-chip :func:`incremental_rebuild_planes` and the
    sharded loop's per-shard rebuild (parallel/spatial_table.py) so the
    edge-guard margin, wrap convention, and moved-far bound can never
    diverge between topologies."""
    g = params.resolved_grid_dim()
    f32 = jnp.float32
    h = f32(params.cutoff())

    val = planes[field_names.index("val")] > 0.5
    px = planes[field_names.index("px")]
    py = planes[field_names.index("py")]

    # true wrapped cell vs current lane position
    ixt = jnp.floor((px - origin[0]) / h).astype(jnp.int32) % g
    iyt = jnp.floor((py - origin[1]) / h).astype(jnp.int32) % g
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, planes.shape[1:], 1)
        + lane_offset
    )
    ixc = lane % g
    dx = _wrap_center(ixt - ixc, g)
    dy = _wrap_center(iyt - lane // g, g)

    moved_far = jnp.any(val & ((jnp.abs(dx) > 1) | (jnp.abs(dy) > 1)))
    # x-edge guard: linear lane windows mis-wrap across rows, harmless only
    # while the wrapped edge columns (0 and G-1) neither hold nor receive
    # rows.  The engine anchors the blob EDGE_MARGIN (=2) cells in, so the
    # guard (margin 1) leaves a full cell of drift slack before the exact
    # fallback + re-anchor has to fire.
    edge = jnp.any(
        val
        & (
            (ixc == 0) | (ixc == g - 1) | (ixt == 0) | (ixt == g - 1)
        )
    )

    dxf = jnp.where(val, dx.astype(f32), f32(_FAR))
    dyf = jnp.where(val, dy.astype(f32), f32(_FAR))
    return dxf, dyf, moved_far, edge


def incremental_rebuild_planes(
    params: SimParams,
    planes: jax.Array,      # (nf, cap, gg) f32 — pre-stacked field planes
    field_names: tuple,     # names for planes' leading axis (must have
                            # px/py/val)
    origin: jax.Array,      # (2,) f32 — the chunk's fixed grid anchor
):
    """Plane-native core of :func:`incremental_rebuild`: returns
    ``(new_planes, ok)`` with the same shape as ``planes``.  The
    megakernel's between-span rebuild (``_incremental_packed`` inside
    engine_table.make_run_chunk_table) calls this directly on its stacked
    (N_TF, cap, gg) table slices to avoid a flat-layout round trip per
    span."""
    cap = params.storage_capacity()
    nf = len(field_names)

    dxf, dyf, moved_far, edge = rebuild_move_planes(
        params, planes, field_names, origin
    )
    stacked = jnp.concatenate([planes, dxf[None], dyf[None]], axis=0)

    new_planes, incoming = _compact(
        params, nf, field_names.index("val"), stacked
    )
    overflow = jnp.any(incoming > cap)

    # NOTE: parked bots (capacity overflow survivors in the strip beyond
    # ``total``) do NOT veto the incremental path.  When the actuation wave
    # compresses cells to capacity, a handful of bots park semi-permanently;
    # vetoing on them forced the expensive exact fallback on EVERY rebuild
    # (measured 7x rebuild cost at 250k bots).  Parked rows pass through
    # untouched here and get reinstatement attempts at every genuine
    # fallback and at every chunk entry — the same no-pair-force semantics
    # the capacity drop always had.
    ok = ~(moved_far | overflow | edge)
    return new_planes, ok
