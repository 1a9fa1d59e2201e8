"""Per-component floor decomposition of the table-resident step (VERDICT r3 #2/#5).

Measures each stage of the production PALLAS step as its own DCE-proof
scan loop (every output feeds back into the scan carry — partial feedback
lets XLA dead-code-eliminate and produces fantasy timings, the round-2
lesson in CLAUDE.md) and prints a component table:

  full        — the real run_chunk (the number the scaling table reports)
  post        — step_post: force kernel + obstacle + stick-slip tail
  kernel      — candidate preshift + the Pallas pair kernel alone
  preshift    — the 5-block flat-roll candidate preshift alone
  pre         — step_pre with all gates statically off (radius + integrate)
  rebuild     — the unconditional incremental compaction (runs 1/k steps)
  carry       — a trivial body on the same TableState carry (scan floor)

Components overlap (kernel ⊂ post) and fuse differently in isolation than
inside the full step, so they don't sum exactly — the table reports the
residual as "unattributed".

Usage: python scripts/floor_decomp.py [n_bots] [iters]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
WORLD_HALF = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0  # 0 = auto-fit
# trailing key=value SimParams overrides, same contract as devbench
# (e.g. grid_dim=112 decomposes the packed-sweep union geometry)
OVERRIDES = dict(a.split("=", 1) for a in sys.argv[4:])
# comma-separated stage subset (each stage is its own remote compile —
# a focused run saves ~minutes per skipped stage at large N)
STAGES = set(
    s for s in __import__("os").environ.get("PBOT_FD_STAGES", "").split(",")
    if s
)


def _want(stage: str) -> bool:
    return not STAGES or stage in STAGES


def _sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def _time_scan(fn, carry, iters, reps=3):
    """Best-of-reps seconds for ``iters`` iterations of ``fn`` (jitted scan)."""

    @functools.partial(jax.jit, static_argnums=1)
    def run(c, n):
        def body(c, _):
            return fn(c), None

        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    c = run(carry, iters)  # compile + warmup
    _sync(c)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(c, iters)
        _sync(c)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu.engine import make_run_chunk
    from particlerobotsimulations_tpu.engine_table import (
        KERNEL_FIELDS,
        MOVE_FIELDS,
        _geometry,
        _stencil_forces_pallas,
        enter_table,
        gate_seg,
        make_table_step_parts,
    )

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0, world_half=WORLD_HALF,
    )
    if OVERRIDES:
        from _overrides import parse_overrides

        params = parse_overrides(params, OVERRIDES)
    params = params.validate()
    sim = Simulation(params)
    params = sim.params  # world_half auto-fit resolution
    k = max(1, params.resolved_slot_rebuild_steps())
    g, cap = params.resolved_grid_dim(), params.cell_capacity
    force_total = g * g * cap
    ts0 = jax.jit(lambda s: enter_table(params, s))(sim.state)
    _sync(ts0)
    step_pre, step_post = make_table_step_parts(params)

    results = {}

    # full: the real chunk runner (same protocol as devbench)
    if _want("full"):
        run = make_run_chunk(params)
        seg = gate_seg(params)
        aligned = seg > 0 and ITERS % seg == 0
        state = run(sim.state, ITERS, aligned)
        _sync(state)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = run(state, ITERS, aligned)
            _sync(state)
            best = min(best, time.perf_counter() - t0)
        results["full"] = best

    # carry floor: trivial body on the same TableState pytree
    def carry_body(ts):
        f = dict(ts.fields)
        f["px"] = f["px"] + jnp.float32(1e-30)
        return ts._replace(fields=f, step=ts.step + 1)

    if _want("carry"):
        results["carry"] = _time_scan(carry_body, ts0, ITERS)

    # pre: radius controller + integrate/boundary (gates statically off)
    def pre_body(ts):
        return step_pre(ts, False, False, False)

    if _want("pre"):
        results["pre"] = _time_scan(pre_body, ts0, ITERS)

    # post: force kernel + obstacles + stick-slip
    if _want("post"):
        results["post"] = _time_scan(step_post, ts0, ITERS)

    # prepost: the full physics step body (pre + post composed, all gates
    # statically off, NO rebuild/fallback glue) — full minus prepost
    # localizes what the scan wrapper adds: rebuild cond glue, deferred
    # fallback machinery, segment-entry gates
    def prepost_body(ts):
        return step_post(step_pre(ts, False, False, False))

    if _want("prepost"):
        results["prepost"] = _time_scan(prepost_body, ts0, ITERS)

    # kernel: preshift + pallas pair kernel, outputs fed into vx/vy/aa/ar
    def kernel_body(ts):
        f = dict(ts.fields)
        tables = {
            kf: f[kf][:force_total].reshape(cap, g * g)
            for kf in KERNEL_FIELDS
        }
        fx, fy, fa, fr = _stencil_forces_pallas(params, tables, True)
        pad = _geometry(params)[1] - force_total
        z = jnp.zeros((pad,), jnp.float32)
        f["vx"] = f["vx"] + jnp.float32(1e-30) * jnp.concatenate(
            [fx.reshape(force_total), z]
        )
        f["vy"] = f["vy"] + jnp.float32(1e-30) * jnp.concatenate(
            [fy.reshape(force_total), z]
        )
        f["aa"] = jnp.concatenate([fa.reshape(force_total), z])
        f["ar"] = jnp.concatenate([fr.reshape(force_total), z])
        return ts._replace(fields=f, step=ts.step + 1)

    if _want("kernel"):
        results["kernel"] = _time_scan(kernel_body, ts0, ITERS)

    # preshift: the 5-block flat-roll candidate stack alone
    from particlerobotsimulations_tpu.ops.pallas_stencil import (
        OFFSETS,
        _preshift_flat,
    )

    def preshift_body(ts):
        f = dict(ts.fields)
        base = jnp.stack(
            [
                f[kf][:force_total].reshape(cap, g * g)
                for kf in KERNEL_FIELDS
            ]
        )
        blocks = [_preshift_flat(base, g, dx, dy, False) for dx, dy in OFFSETS]
        acc = functools.reduce(jnp.add, blocks)
        # DCE-proof: EVERY field plane of every block must reach the carry
        # (feeding only acc[0] lets XLA slice-push through the rolls and
        # dead-code-eliminate the other planes' preshift work)
        mix = acc.sum(axis=0)
        f["vx"] = f["vx"] + jnp.float32(1e-30) * jnp.concatenate(
            [mix.reshape(force_total),
             jnp.zeros((_geometry(params)[1] - force_total,), jnp.float32)]
        )
        return ts._replace(fields=f, step=ts.step + 1)

    if _want("preshift"):
        results["preshift"] = _time_scan(preshift_body, ts0, ITERS)

    # rebuild: unconditional incremental compaction (executes 1/k steps)
    from particlerobotsimulations_tpu.ops.table_rebuild import (
        incremental_rebuild,
    )

    # block: ONE deferred k-step block body exactly as the production seg
    # loop compiles it (k-1 plain steps unrolled + pre + unconditional
    # incremental rebuild incl. derived-row recompute + post, ok folded
    # into the carry) but with NO group scan / adopt-or-redo cond around
    # it.  block vs (k-1)/k*prepost + (pre+rebuild+post)/k separates
    # body-size scheduling cost from the group/cond machinery.
    from particlerobotsimulations_tpu.engine_table import _derived_rows

    def block_body(ts):
        for _ in range(k - 1):
            ts = step_post(step_pre(ts, False, False, False))
        ts = step_pre(ts, False, False, False)
        moved, ok = incremental_rebuild(params, ts.fields, MOVE_FIELDS,
                                        ts.origin)
        f = dict(ts.fields)
        f.update(moved)
        f = _derived_rows(params, f)
        f["px"] = f["px"] + jnp.float32(1e-30) * ok.astype(jnp.float32)
        return step_post(ts._replace(fields=f))

    if ITERS % k == 0 and _want("block"):
        results["block"] = _time_scan(block_body, ts0, ITERS // k)

    # block variants (mechanism isolation for the composition overhead):
    #   block_nr — k plain steps, NO rebuild: is plain-step composition free?
    #   block_nd — block without the derived-row recompute
    #   block_iso — rebuild runs (DCE-proof via 1e-30 fold of every moved
    #               plane) but post consumes the PRE-rebuild fields: is the
    #               rebuild->post data dependency the cost, or the rebuild's
    #               mere presence in the body?
    def block_nr_body(ts):
        for _ in range(k):
            ts = step_post(step_pre(ts, False, False, False))
        return ts

    if ITERS % k == 0 and _want("block_nr"):
        results["block_nr"] = _time_scan(block_nr_body, ts0, ITERS // k)

    def block_nd_body(ts):
        for _ in range(k - 1):
            ts = step_post(step_pre(ts, False, False, False))
        ts = step_pre(ts, False, False, False)
        moved, ok = incremental_rebuild(params, ts.fields, MOVE_FIELDS,
                                        ts.origin)
        f = dict(ts.fields)
        f.update(moved)
        f["px"] = f["px"] + jnp.float32(1e-30) * ok.astype(jnp.float32)
        return step_post(ts._replace(fields=f))

    if ITERS % k == 0 and _want("block_nd"):
        results["block_nd"] = _time_scan(block_nd_body, ts0, ITERS // k)

    def block_iso_body(ts):
        for _ in range(k - 1):
            ts = step_post(step_pre(ts, False, False, False))
        ts = step_pre(ts, False, False, False)
        moved, ok = incremental_rebuild(params, ts.fields, MOVE_FIELDS,
                                        ts.origin)
        f = dict(ts.fields)
        # full-plane sums: a single-element read would let XLA slice-push
        # through the window updates and DCE the rebuild's XLA-side parts
        fold = ok.astype(jnp.float32)
        for key in moved:
            fold = fold + jnp.float32(1e-30) * jnp.sum(moved[key])
        f["px"] = f["px"] + jnp.float32(1e-30) * fold
        return step_post(ts._replace(fields=f))

    if ITERS % k == 0 and _want("block_iso"):
        results["block_iso"] = _time_scan(block_iso_body, ts0, ITERS // k)

    # block_gl — the rebuild's XLA PRELUDE only (plane stack + move-plane
    # displacements + halo pad), no pallas compact, post reads old fields:
    # block_gl vs block_nr isolates whether the "presence" half of the
    # composition penalty is XLA data prep or the pallas call itself.
    from particlerobotsimulations_tpu.ops.table_rebuild import (
        CHUNK as _RB_CHUNK,
        _n_halo,
        rebuild_move_planes,
    )

    nf_mv = len(MOVE_FIELDS)
    gg = g * g
    cap_s = params.storage_capacity()
    total_s = gg * cap_s
    halo = _n_halo(g) * _RB_CHUNK

    def block_gl_body(ts):
        for _ in range(k - 1):
            ts = step_post(step_pre(ts, False, False, False))
        ts = step_pre(ts, False, False, False)
        planes = jnp.stack(
            [ts.fields[k2][:total_s] for k2 in MOVE_FIELDS]
        ).reshape(nf_mv, cap_s, gg)
        dxf, dyf, mf, eg = rebuild_move_planes(
            params, planes, MOVE_FIELDS, ts.origin
        )
        stacked = jnp.concatenate([planes, dxf[None], dyf[None]], axis=0)
        padded = jnp.concatenate(
            [stacked[:, :, gg - halo:], stacked, stacked[:, :, :halo]],
            axis=-1,
        )
        fold = (
            jnp.sum(padded) * jnp.float32(1e-30)
            + mf.astype(jnp.float32)
            + eg.astype(jnp.float32)
        )
        f = dict(ts.fields)
        f["px"] = f["px"] + jnp.float32(1e-30) * fold
        return step_post(ts._replace(fields=f))

    if ITERS % k == 0 and _want("block_gl"):
        results["block_gl"] = _time_scan(block_gl_body, ts0, ITERS // k)

    # block_px — full rebuild, but post consumes ONLY the moved px/py
    # (other planes folded as sums): does the consumption half of the
    # penalty scale with the number of adopted planes, or is any
    # dependency at all the whole cost?
    def block_px_body(ts):
        for _ in range(k - 1):
            ts = step_post(step_pre(ts, False, False, False))
        ts = step_pre(ts, False, False, False)
        moved, ok = incremental_rebuild(params, ts.fields, MOVE_FIELDS,
                                        ts.origin)
        f = dict(ts.fields)
        fold = ok.astype(jnp.float32)
        for key in moved:
            if key in ("px", "py"):
                f[key] = moved[key]
            else:
                fold = fold + jnp.float32(1e-30) * jnp.sum(moved[key])
        f["px"] = f["px"] + jnp.float32(1e-30) * fold
        return step_post(ts._replace(fields=f))

    if ITERS % k == 0 and _want("block_px"):
        results["block_px"] = _time_scan(block_px_body, ts0, ITERS // k)

    # block_s0 — pure presence: the pallas compact runs (kept alive via its
    # cnt output inside ok = moved_far|overflow|edge) but NO moved plane is
    # read at all — the cheapest-possible composition with the call present.
    def block_s0_body(ts):
        for _ in range(k - 1):
            ts = step_post(step_pre(ts, False, False, False))
        ts = step_pre(ts, False, False, False)
        moved, ok = incremental_rebuild(params, ts.fields, MOVE_FIELDS,
                                        ts.origin)
        f = dict(ts.fields)
        f["px"] = f["px"] + jnp.float32(1e-30) * ok.astype(jnp.float32)
        return step_post(ts._replace(fields=f))

    if ITERS % k == 0 and _want("block_s0"):
        results["block_s0"] = _time_scan(block_s0_body, ts0, ITERS // k)

    # block_pr / block_pr2 — PLANE-RESIDENT block prototypes: fields carried
    # as (cap, gg) planes with the parking strip separate, so the rebuild
    # adopts the pallas compact output without the per-field
    # concat-with-strip round trip (the suspected composition penalty —
    # block_px showed the full rebuild composes at +6.4 us/step when only
    # 2 planes are adopted).  Physics-equivalent to the flat block for the
    # ungated no-obstacle probe scenario (NOT wired to production).
    #   block_pr  — dict of planes; adoption = slices of the stacked output
    #   block_pr2 — MOVE planes carried as ONE stacked (9, cap, gg) array;
    #               adoption = swapping in the output array (zero copy)
    from particlerobotsimulations_tpu.engine_table import (
        TABLE_FIELDS,
        _payload_afac,
    )
    from particlerobotsimulations_tpu.ops.integrate import (
        radius_integrate_planes,
    )
    from particlerobotsimulations_tpu.ops.forces import (
        friction_velocity_update_xy,
    )
    from particlerobotsimulations_tpu.ops.table_rebuild import (
        incremental_rebuild_planes,
    )

    nf_mv = len(MOVE_FIELDS)
    cap_s = params.storage_capacity()
    gg = g * g
    total_s = gg * cap_s
    dt = params.timestep
    f32 = jnp.float32
    origin0 = ts0.origin

    def _mk_packed_carry():
        pl2 = {
            kf: ts0.fields[kf][:total_s].reshape(cap_s, gg)
            for kf in TABLE_FIELDS
        }
        st2 = {kf: ts0.fields[kf][total_s:] for kf in TABLE_FIELDS}
        return pl2, st2, ts0.step

    def _pre_pr(pl2, st2, step):
        time = step.astype(f32) * f32(dt)
        return (
            radius_integrate_planes(params, dict(pl2), time),
            radius_integrate_planes(params, dict(st2), time),
        )

    def _post_pr(pl2, st2):
        tables = {kf: pl2[kf][:cap] for kf in KERNEL_FIELDS}
        fx, fy, fa, fr = _stencil_forces_pallas(params, tables, True)
        if cap_s > cap:
            zrow = jnp.zeros((cap_s - cap, gg), f32)
            fx = jnp.concatenate([fx, zrow])
            fy = jnp.concatenate([fy, zrow])
            fa = jnp.concatenate([fa, zrow])
            fr = jnp.concatenate([fr, zrow])
        pl2["aa"], pl2["ar"] = fa, fr
        val_r = pl2["val"] > 0.5
        nvx, nvy = friction_velocity_update_xy(
            params, pl2["vx"], pl2["vy"], fx, fy, pl2["pay"] > 0.5, dt
        )
        pl2["vx"] = jnp.where(val_r, nvx, 0.0)
        pl2["vy"] = jnp.where(val_r, nvy, 0.0)
        zs = jnp.zeros_like(st2["aa"])
        st2["aa"], st2["ar"] = zs, zs
        svx, svy = friction_velocity_update_xy(
            params, st2["vx"], st2["vy"], zs, zs, st2["pay"] > 0.5, dt
        )
        sval = st2["val"] > 0.5
        st2["vx"] = jnp.where(sval, svx, 0.0)
        st2["vy"] = jnp.where(sval, svy, 0.0)
        return pl2, st2

    def block_pr_body(carry):
        pl2, st2, step = carry
        for _ in range(k - 1):
            pl2, st2 = _pre_pr(pl2, st2, step)
            pl2, st2 = _post_pr(pl2, st2)
            step = step + 1
        pl2, st2 = _pre_pr(pl2, st2, step)
        planes = jnp.stack([pl2[k2] for k2 in MOVE_FIELDS])
        new_planes, ok = incremental_rebuild_planes(
            params, planes, MOVE_FIELDS, origin0
        )
        for j, k2 in enumerate(MOVE_FIELDS):
            pl2[k2] = new_planes[j]
        pl2["pay"], pl2["afac"] = _payload_afac(
            params, pl2["val"] > 0.5, pl2["bid"]
        )
        pl2["px"] = pl2["px"] + f32(1e-30) * ok.astype(f32)
        pl2, st2 = _post_pr(pl2, st2)
        return pl2, st2, step + 1

    if ITERS % k == 0 and _want("block_pr"):
        results["block_pr"] = _time_scan(
            block_pr_body, _mk_packed_carry(), ITERS // k
        )

    # stacked-carry variant: MOVE planes live in one (9, cap, gg) array
    mv_idx = {k2: j for j, k2 in enumerate(MOVE_FIELDS)}

    def _mk_stacked_carry():
        pl2, st2, step = _mk_packed_carry()
        mv = jnp.stack([pl2[k2] for k2 in MOVE_FIELDS])
        ex = {k2: pl2[k2] for k2 in TABLE_FIELDS if k2 not in mv_idx}
        return mv, ex, st2, step

    def _unstack(mv, ex):
        pl2 = {k2: mv[mv_idx[k2]] for k2 in MOVE_FIELDS}
        pl2.update(ex)
        return pl2

    def _restack(pl2):
        mv = jnp.stack([pl2[k2] for k2 in MOVE_FIELDS])
        ex = {k2: pl2[k2] for k2 in TABLE_FIELDS if k2 not in mv_idx}
        return mv, ex

    def block_pr2_body(carry):
        mv, ex, st2, step = carry
        pl2 = _unstack(mv, ex)
        for _ in range(k - 1):
            pl2, st2 = _pre_pr(pl2, st2, step)
            pl2, st2 = _post_pr(pl2, st2)
            step = step + 1
        pl2, st2 = _pre_pr(pl2, st2, step)
        planes, ex2 = _restack(pl2)
        new_planes, ok = incremental_rebuild_planes(
            params, planes, MOVE_FIELDS, origin0
        )
        pl2 = _unstack(new_planes, ex2)
        pl2["pay"], pl2["afac"] = _payload_afac(
            params, pl2["val"] > 0.5, pl2["bid"]
        )
        pl2, st2 = _post_pr(pl2, st2)
        mv, ex = _restack(pl2)
        mv = mv.at[0].add(f32(1e-30) * ok.astype(f32))
        return mv, ex, st2, step + 1

    if ITERS % k == 0 and _want("block_pr2"):
        results["block_pr2"] = _time_scan(
            block_pr2_body, _mk_stacked_carry(), ITERS // k
        )

    def rebuild_body(ts):
        moved, ok = incremental_rebuild(params, ts.fields, MOVE_FIELDS,
                                        ts.origin)
        f = dict(ts.fields)
        f.update(moved)
        # fold ok into a carried field so the precondition math survives
        f["px"] = f["px"] + jnp.float32(1e-30) * ok.astype(jnp.float32)
        return ts._replace(fields=f, step=ts.step + 1)

    if _want("rebuild"):
        n_reb = max(ITERS // k, 1)
        results["rebuild"] = _time_scan(rebuild_body, ts0, n_reb) * k
        # scaled to per-physics-step iters (printed /k as amortized)

    us = {kk: v / ITERS * 1e6 for kk, v in results.items()}
    print(f"\nn={N} (grid {g}, cap {cap}, k={k}), {ITERS}-step scans, "
          f"best of 3, us/step:")
    for kk in ("full", "block", "block_nr", "block_nd", "block_iso",
               "block_gl", "block_px", "block_s0", "block_pr", "block_pr2",
               "prepost", "post", "kernel", "preshift", "pre", "carry"):
        if kk in us:
            print(f"  {kk:9s} {us[kk]:8.2f}")
    if "rebuild" in us:
        print(f"  rebuild   {us['rebuild']:8.2f} raw -> "
              f"{us['rebuild'] / k:.2f} amortized (1/{k} steps)")
    if all(kk in us for kk in ("post", "pre", "carry", "rebuild", "full")):
        attributed = (
            us["post"] + us["pre"] - us["carry"] + us["rebuild"] / k
        )
        print(f"  attributed (post + pre - carry + rebuild/k) = "
              f"{attributed:.2f}; full = {us['full']:.2f}; "
              f"unattributed = {us['full'] - attributed:.2f}")
    if "full" in us:
        print(f"  throughput: {N / us['full']:.1f}M particle-steps/s")


if __name__ == "__main__":
    main()
