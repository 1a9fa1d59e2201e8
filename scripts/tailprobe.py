"""Large-N tail probe: incremental-rebuild fallback rate INSIDE the scan.

The scaling tail (250k-1M run at 77-91M particle-steps/s vs 100-115M at
10k-100k) has several candidate causes; the first to rule in/out is the
exact-fallback rate: a rebuild-window precondition failure is per-BOT
probabilistic, so P(window falls back) ~ 1 - (1-p)^N grows with N, and
at 1M a failed window also poisons a whole GR=7-block deferred group
(engine_table._make_deferred_seg) into a 28-step redo with argsort
rebuilds over 3.7M table rows.

This script replays the production rebuild cadence (k-1 gateless steps,
pre, incremental rebuild, adopt-or-exact cond, post — exactly
engine_table._smart_rebuild's schedule) with an in-scan counter of
fallbacks and their precondition breakdown:

    ok = ~(moved_far | overflow | edge)      (ops/table_rebuild.py)

CLAUDE.md lesson: fallback rate must be measured INSIDE the scan — a
host-side probe between chunks misses every in-chunk firing.

Usage: python scripts/tailprobe.py [n_bots] [windows] [world_half] [warm_steps] [key=value ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WINDOWS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
WORLD_HALF = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0  # 0 = auto-fit
WARM = int(sys.argv[4]) if len(sys.argv) > 4 else 6000
OVERRIDES = dict(a.split("=", 1) for a in sys.argv[5:])


def _sync(x):
    return np.asarray(jax.device_get(x))


def main():
    from particlerobotsimulations_tpu import Config, SimParams, Simulation
    from particlerobotsimulations_tpu import engine_table as et
    from particlerobotsimulations_tpu.engine import make_run_chunk
    from particlerobotsimulations_tpu.ops.table_rebuild import (
        incremental_rebuild,
        rebuild_move_planes,
    )

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0, world_half=WORLD_HALF,
    )
    if OVERRIDES:
        from _overrides import parse_overrides

        params = parse_overrides(params, OVERRIDES)
    sim = Simulation(params)
    params = sim.params  # world_half auto-fit resolution
    vp = params.validate()
    k = max(1, vp.resolved_slot_rebuild_steps())
    g, cap = vp.resolved_grid_dim(), vp.storage_capacity()
    print(
        f"n={N} G={g} cap={cap} (spill {vp.resolved_overflow_slots()}) "
        f"k={k} windows={WINDOWS} warm={WARM}"
    )

    run = make_run_chunk(params)
    t0 = time.perf_counter()
    state = run(sim.state, WARM, False)
    _sync(state.step)
    print(f"warmup {WARM} steps (+compile): {time.perf_counter() - t0:.1f} s")

    step = et.make_table_step(vp)
    pre_f, post_f = et.make_table_step_parts(vp)
    gg, total = g * g, g * g * cap

    @functools.partial(jax.jit, static_argnums=(1,))
    def probe(state, n_windows: int):
        ts = et.enter_table(vp, state)

        def plain_u(t, _):
            return step(t, False, False, False, False), None

        def window(carry, _):
            t, cnt = carry
            if k > 1:
                t, _ = jax.lax.scan(plain_u, t, None, length=k - 1)
            t = pre_f(t, False, False, False)
            planes = jnp.stack(
                [t.fields[f][:total] for f in et.MOVE_FIELDS]
            ).reshape(len(et.MOVE_FIELDS), cap, gg)
            _, _, moved_far, edge = rebuild_move_planes(
                vp, planes, et.MOVE_FIELDS, t.origin
            )
            moved, ok = incremental_rebuild(
                vp, t.fields, et.MOVE_FIELDS, t.origin
            )
            overflow = (~ok) & ~(moved_far | edge)
            cnt = cnt + jnp.stack([~ok, moved_far, overflow, edge]).astype(
                jnp.int32
            )

            def adopt(u):
                f = dict(u.fields)
                f.update(moved)
                return u._replace(fields=et._derived_rows(vp, f))

            t = jax.lax.cond(
                ok, adopt, lambda u: et._rebuild(vp, u), t
            )
            return (post_f(t), cnt), None

        (ts, cnt), _ = jax.lax.scan(
            window, (ts, jnp.zeros(4, jnp.int32)), None, length=n_windows
        )
        return et.exit_table(vp, ts), cnt

    t0 = time.perf_counter()
    state, cnt = probe(state, WINDOWS)
    cnt = _sync(cnt)
    dt = time.perf_counter() - t0
    nfb, far, ovf, edge = (int(v) for v in cnt)
    print(
        f"probe: {WINDOWS} windows ({WINDOWS * k} steps) in {dt:.1f} s "
        f"(first call includes compile)"
    )
    print(
        f"fallbacks: {nfb}/{WINDOWS} windows = {nfb / WINDOWS:.2%}  "
        f"breakdown: moved_far {far}, overflow {ovf}, edge {edge}"
    )
    pos = _sync(state.pos)[:N]
    assert np.isfinite(pos).all()


if __name__ == "__main__":
    main()
