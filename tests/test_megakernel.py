"""Small-table megakernel (ops/megakernel.py) vs the regular table loop.

The megakernel runs the whole ungated span between two slot rebuilds as
one Pallas call (the rebuild itself runs between spans on the regular
_smart_rebuild path).  Its math is the same float32 expressions as the
regular path, but Mosaic (and the different accumulation order of the
Newton reactions) shifts roundings by ~1 ulp, so comparisons are
tolerance-based on jittered starts — the same policy as every other
cross-kernel test in this package (CLAUDE.md: never assert bitwise across
kernels on HEX step 0).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import Config, ForceBackend, SimParams, Simulation
from particlerobotsimulations_tpu.engine_table import (
    TABLE_FIELDS,
    _geometry,
    enter_table,
    make_run_chunk_table,
    make_table_step_parts,
)
from particlerobotsimulations_tpu.ops.megakernel import (
    make_mega_span,
    mega_eligible,
)

def params_(**kw):
    base = dict(
        n_cells=300, n_dead=0, seed=3, config=Config.HEX,
        force_backend=ForceBackend.PALLAS, phase_std=0.0,
        light_x=-5.0, light_y=0.0,
    )
    base.update(kw)
    return SimParams(**base)


def jitter(state, scale=1e-4):
    """Break the HEX lattice's exact tangencies (see test_engine_table)."""
    noise = scale * jax.random.normal(jax.random.key(99), state.pos.shape)
    return state._replace(pos=state.pos + noise)


def _mega_views(params, ts):
    total, _, n_pad = _geometry(params)
    g, cap = params.resolved_grid_dim(), params.storage_capacity()
    tbl = jnp.stack(
        [ts.fields[f][:total].reshape(cap, g * g) for f in TABLE_FIELDS]
    )
    strip = jnp.stack(
        [ts.fields[f][total:].reshape(n_pad // 128, 128) for f in TABLE_FIELDS]
    )
    return tbl, strip


def test_eligibility():
    # default ON for eligible (G=16) tables
    assert mega_eligible(params_().validate())
    # G=32+ tables lose to the regular path (scoped-VMEM pressure)
    assert not mega_eligible(params_(n_cells=2_000).validate())
    assert not mega_eligible(params_(n_cells=10_000).validate())
    # overflow spill sublanes are out of scope
    assert not mega_eligible(
        params_(n_cells=1000, overflow_slots=8).validate()
    )
    # a small user-forced grid with a big bot count keeps the table tiny but
    # the parking strip huge — must fall back, not OOM the kernel's VMEM
    assert not mega_eligible(
        params_(n_cells=20_000, grid_dim=16).validate()
    )
    assert not mega_eligible(
        params_(force_backend=ForceBackend.DENSE).validate()
    )
    # opt-out
    os.environ["PBOT_MEGA"] = "0"
    try:
        assert not mega_eligible(params_().validate())
    finally:
        os.environ.pop("PBOT_MEGA", None)


def _assert_fields_close(p, ts_ref, tbl2, strip2, atol):
    total, _, n_pad = _geometry(p)
    for j, f in enumerate(TABLE_FIELDS):
        ref = np.asarray(ts_ref.fields[f])
        got = np.concatenate(
            [
                np.asarray(tbl2[j]).reshape(total),
                np.asarray(strip2[j]).reshape(n_pad),
            ]
        )
        # aa/ar are sums of ~1e3-magnitude forces: reassociation of the
        # Newton-reaction accumulation order costs a few 1e-5 relative
        np.testing.assert_allclose(got, ref, atol=atol, rtol=atol, err_msg=f)


def test_mega_span_matches_regular_parts():
    """span(b) from a mid-step b-1 state == carried-over post(b-1) + (k-1)
    full steps + a final pre(b+k-1), to float32 tolerance (no rebuild
    anywhere — that runs between spans on the regular path)."""
    p = params_().validate()
    ts = enter_table(p, jitter(Simulation(p).state))
    k = max(1, p.resolved_slot_rebuild_steps())
    step_pre, step_post = make_table_step_parts(p)

    ts_mid = step_pre(ts, False, False, False)  # mid-step ts.step
    ts_ref = step_post(ts_mid)
    for _ in range(k - 1):
        ts_ref = step_post(step_pre(ts_ref, False, False, False))
    ts_ref = step_pre(ts_ref, False, False, False)

    _, _, n_pad = _geometry(p)
    tbl, strip = _mega_views(p, ts_mid)
    mega = make_mega_span(p, n_pad)
    tbl2, strip2 = jax.jit(mega)(tbl, strip, ts.step + 1)
    _assert_fields_close(p, ts_ref, tbl2, strip2, 1e-4)


def test_mega_chunk_matches_regular_chunk():
    """Full seg-aligned chunks with interval gates firing: megakernel on
    vs off must agree to chaos-bounded tolerance over a few segments."""
    # cog every 8 steps, phase every 16 -> seg = 8, bps = 2: every segment
    # runs one gated regular block + one megakernel block
    p = params_(
        n_cells=256, centroid_int=0.08, phase_update_interval=0.16
    )
    from particlerobotsimulations_tpu.engine_table import gate_seg

    assert gate_seg(p.validate()) == 8

    def run_with(mega: str):
        os.environ["PBOT_MEGA"] = mega
        try:
            run = make_run_chunk_table(p)
            return run(jitter(Simulation(p).state), 24, True)
        finally:
            os.environ.pop("PBOT_MEGA", None)

    a = run_with("1")
    b = run_with("0")
    assert int(a.step) == 24
    np.testing.assert_allclose(
        np.asarray(a.pos), np.asarray(b.pos), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.rad), np.asarray(b.rad), atol=2e-4
    )
    # phase/centroid run on gated steps in the REGULAR block either way,
    # but see ~1e-6 position differences seeded by the mega blocks
    np.testing.assert_allclose(
        np.asarray(a.phase), np.asarray(b.phase), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.centroid_ring), np.asarray(b.centroid_ring), atol=1e-5
    )


def test_mega_chunk_payload_and_obstacles():
    """Payload (afac/pay planes) + rect/circle obstacles run through the
    megakernel's component-form obstacle path."""
    p = params_(
        n_cells=64,
        n_dead=-1,  # payload convention: last bot is the payload
        centroid_int=0.08,
        phase_update_interval=0.16,
        circle_obstacles=((0.5, 0.0, 0.3),),
        rect_obstacles=((-1.5, -1.0, -0.5, 0.5),),
    )

    def run_with(mega: str):
        os.environ["PBOT_MEGA"] = mega
        try:
            run = make_run_chunk_table(p)
            return run(jitter(Simulation(p).state), 16, True)
        finally:
            os.environ.pop("PBOT_MEGA", None)

    a = run_with("1")
    b = run_with("0")
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=2e-4)
    assert np.isfinite(np.asarray(a.vel)).all()


def test_mega_fallback_on_far_move():
    """A state that violates the incremental-rebuild preconditions must
    take the exact-argsort fallback inside the between-span rebuild and
    end up healthy — same macrostate as the regular chunk."""
    p = params_(n_cells=128, centroid_int=0.08, phase_update_interval=0.16)

    def state0():
        # fresh per run: run_chunk donates its input buffers.  One bot gets
        # a velocity spike (0.6 units/step ~ 4.6 cells per rebuild window)
        # so every rebuild — including the megakernel blocks' — sees a
        # >1-cell move and takes the fallback.
        st = jitter(Simulation(p).state)
        kick = jnp.zeros_like(st.vel).at[7, 0].set(60.0)
        return st._replace(vel=st.vel + kick)

    def run_with(mega: str):
        os.environ["PBOT_MEGA"] = mega
        try:
            run = make_run_chunk_table(p)
            return run(state0(), 16, True)
        finally:
            os.environ.pop("PBOT_MEGA", None)

    a = run_with("1")
    b = run_with("0")
    assert np.isfinite(np.asarray(a.pos)).all()
    np.testing.assert_allclose(
        np.asarray(a.pos), np.asarray(b.pos), atol=1e-3
    )


def test_mega_batched_chunk_matches_regular_batched():
    """The vmapped-span batched loop must agree with the regular batched
    loop over seg-aligned chunks with gates firing."""
    from particlerobotsimulations_tpu.engine_table import (
        make_run_chunk_table_batched,
    )
    from particlerobotsimulations_tpu.parallel.sweep import make_batch_state

    p = params_(
        n_cells=256, centroid_int=0.08, phase_update_interval=0.16
    )

    def run_with(mega: str):
        os.environ["PBOT_MEGA"] = mega
        try:
            run = make_run_chunk_table_batched(p)
            # jitter: pristine HEX lattices flip magnet branches between
            # differently-compiled programs (see module docstring)
            return run(jitter(make_batch_state(p, seeds=[0, 1])), 24, True)
        finally:
            os.environ.pop("PBOT_MEGA", None)

    a = run_with("1")
    b = run_with("0")
    assert int(a.step[0]) == 24 and int(a.step[1]) == 24
    np.testing.assert_allclose(
        np.asarray(a.pos), np.asarray(b.pos), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.phase), np.asarray(b.phase), atol=1e-4
    )


def test_obstacle_forces_xy_matches_vector_form():
    from particlerobotsimulations_tpu.ops.forces import (
        obstacle_forces,
        obstacle_forces_xy,
    )

    p = params_(
        circle_obstacles=((0.2, -0.1, 0.4), (1.0, 1.0, 0.2)),
        rect_obstacles=((-1.0, -0.2, -0.5, 0.8), (0.5, 2.0, -2.0, -1.0)),
    ).validate()
    key = jax.random.key(1)
    n = 512
    pos = jax.random.uniform(key, (n, 2), minval=-2.5, maxval=2.5)
    vel = jax.random.normal(jax.random.key(2), (n, 2))
    rad = jax.random.uniform(jax.random.key(3), (n,), minval=0.05, maxval=0.3)
    f, m = obstacle_forces(p, pos, vel, rad)
    fx, fy, mx = obstacle_forces_xy(p, pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1], rad)
    np.testing.assert_allclose(np.asarray(f[:, 0]), np.asarray(fx), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f[:, 1]), np.asarray(fy), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mx), rtol=1e-6, atol=1e-5)
