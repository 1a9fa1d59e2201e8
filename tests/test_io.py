"""CSV + checkpoint IO tests (reference schema: particlebot.cpp:303-411)."""

import io

import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams, Simulation
from particlerobotsimulations_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from particlerobotsimulations_tpu.io.csvio import CsvDumper, header_lines, load_last_row, row_line


def small_params(**kw):
    base = dict(n_cells=8, n_dead=0, seed=4, max_time=2.0, dump_interval=1.0, testing=1)
    base.update(kw)
    return SimParams(**base)


def test_header_schema():
    p = small_params()
    h = header_lines(p).splitlines()
    assert h[0] == "Seed, 4"
    cols = h[1]
    assert cols.startswith("Time,Particlebot_0_xpos, Particlebot_0_ypos,")
    assert "Particlebot_7_rad," in cols
    assert cols.endswith("Centroid X, Centroid Y, Distance")
    # non-testing header has no per-bot columns
    h2 = header_lines(p.replace(testing=0)).splitlines()
    assert h2[1] == "Time,Centroid X, Centroid Y, Distance"


def test_row_format():
    p = small_params(n_cells=2, light_x=0.0, light_y=0.0)
    pos = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    vel = np.zeros((2, 2), np.float32)
    rad = np.array([0.1, 0.2], np.float32)
    row = row_line(p, 0.0, pos, vel, rad)
    fields = [f.strip() for f in row.strip().split(",") if f.strip()]
    # time + 2*2 pos + 2*2 vel + 2 rad + centroid x,y,dist = 14
    assert len(fields) == 14
    assert fields[0] == "0.000000"
    assert float(fields[-3]) == pytest.approx(2.0)  # centroid x
    assert float(fields[-2]) == pytest.approx(3.0)  # centroid y
    assert float(fields[-1]) == pytest.approx(np.hypot(2.0, 3.0), rel=1e-5)


def test_run_and_resume(tmp_path):
    p = small_params()
    csv = tmp_path / "out.csv"
    sim = Simulation(p)
    sim.run(csv_path=str(csv), echo=False)
    lines = csv.read_text().splitlines()
    assert lines[0].startswith("Seed")
    data_rows = lines[2:]
    assert len(data_rows) == 3  # t = 0, 1, 2

    sim2 = Simulation.resume_from_csv(p, str(csv))
    assert sim2.time == pytest.approx(2.0)
    pos_a, vel_a, rad_a = sim.host_view()
    pos_b, vel_b, rad_b = sim2.host_view()
    # CSV has 6 decimals -> 1e-6 quantization
    np.testing.assert_allclose(pos_a, pos_b, atol=1e-5)
    np.testing.assert_allclose(rad_a, rad_b, atol=1e-5)


def test_resume_past_dead_step_warns(tmp_path):
    # the CSV carries no dead flags (reference fidelity): resuming past
    # time_to_dead silently loses the injection — must warn (VERDICT r2 #7)
    p = small_params(n_dead=2, time_to_dead=1.0)
    csv = tmp_path / "out.csv"
    Simulation(p).run(csv_path=str(csv), echo=False)
    with pytest.warns(UserWarning, match="time_to_dead"):
        sim2 = Simulation.resume_from_csv(p, str(csv))
    assert not np.asarray(sim2.state.dead)[: p.n_cells].any()
    # resume before the injection step is silent
    p2 = small_params(n_dead=2, time_to_dead=5.0)
    csv2 = tmp_path / "out2.csv"
    Simulation(p2).run(csv_path=str(csv2), echo=False)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        Simulation.resume_from_csv(p2, str(csv2))


def test_no_extra_row_off_dump_boundary(tmp_path):
    # max_time not a multiple of dump_interval: the reference's dump gate
    # (particlebot.cpp:309) writes nothing at the final partial step
    p = small_params(max_time=1.5)
    csv = tmp_path / "out.csv"
    Simulation(p).run(csv_path=str(csv), echo=False)
    data_rows = csv.read_text().splitlines()[2:]
    assert len(data_rows) == 2  # t = 0, 1 only


def test_append_to_missing_csv_writes_header(tmp_path):
    p = small_params()
    csv = tmp_path / "fresh.csv"
    Simulation(p).run(csv_path=str(csv), echo=False, append_csv=True)
    lines = csv.read_text().splitlines()
    assert lines[0].startswith("Seed")  # header present despite append mode
    assert len(lines[2:]) == 3


def test_resume_requires_testing():
    p = small_params(testing=0)
    buf = io.StringIO()
    d = CsvDumper(p, buf, echo=False)
    d.dump(0.0, np.zeros((8, 2)), np.zeros((8, 2)), np.zeros(8))
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write(buf.getvalue())
        path = f.name
    try:
        with pytest.raises(ValueError):
            load_last_row(p, path)
    finally:
        os.unlink(path)


def test_checkpoint_roundtrip(tmp_path):
    p = small_params(n_dead=3, time_to_dead=0.1)
    sim = Simulation(p)
    sim.step_chunk(50)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, p, sim.state)
    p2, state2 = load_checkpoint(path)
    assert p2 == p
    import jax

    a = jax.device_get(sim.state)
    b = jax.device_get(state2)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.phase), np.asarray(b.phase))
    np.testing.assert_array_equal(np.asarray(a.dead), np.asarray(b.dead))
    assert int(b.step) == 50

    # resumed run continues identically to an uninterrupted one
    sim_resumed = Simulation(p2, state=state2)
    sim.step_chunk(50)
    sim_resumed.step_chunk(50)
    np.testing.assert_array_equal(sim.host_view()[0], sim_resumed.host_view()[0])


def test_checkpoint_resume_misaligned_table_run(tmp_path):
    """Resuming the PALLAS table loop at a step that is NOT a gate-segment
    multiple must route run() through the legacy per-step-cond path (the
    seg_aligned fast path asserts alignment) and continue identically to
    an uninterrupted run."""
    from particlerobotsimulations_tpu import Config, ForceBackend
    from particlerobotsimulations_tpu.engine_table import gate_seg

    p = small_params(
        n_cells=96, config=Config.HEX, force_backend=ForceBackend.PALLAS,
        phase_std=0.0, max_time=2.0, dump_interval=1.0,
        # short intervals -> seg = 4 (gcd of 8 and 12)
        centroid_int=0.08, phase_update_interval=0.12,
    )
    assert gate_seg(p.validate()) == 4
    sim = Simulation(p)
    sim.step_chunk(7, start_step=0)  # lands on step 7: NOT a multiple of 4
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, p, sim.state)

    p2, state2 = load_checkpoint(path)
    resumed = Simulation(p2, state=state2)
    # both the misaligned (start 7) and later re-aligned chunks execute
    resumed.step_chunk(5, start_step=7)    # misaligned -> legacy path
    resumed.step_chunk(8, start_step=12)   # aligned -> fast path
    sim.step_chunk(5, start_step=7)
    sim.step_chunk(8, start_step=12)
    np.testing.assert_array_equal(sim.host_view()[0], resumed.host_view()[0])
    assert int(resumed.state.step) == 20


def test_resume_off_dump_grid_realigns(tmp_path):
    """A continuation from a non-dump-aligned step (e.g. the final
    checkpoint of a max_time that is not a dump multiple) must step UP TO
    the next absolute dump boundary and keep dumping there — previously
    the chunk stride preserved the misalignment forever and the continued
    run wrote zero rows."""
    p = small_params(max_time=1.3)  # ends at step 130, dump grid = 100s
    sim = Simulation(p)
    sim.run(csv_path=str(tmp_path / "a.csv"), echo=False)
    assert int(sim.state.step) == 130

    csv2 = tmp_path / "b.csv"
    sim.run(max_time=3.0, csv_path=str(csv2), echo=False)
    rows = csv2.read_text().splitlines()[2:]
    times = [float(r.split(",")[0]) for r in rows]
    assert times == pytest.approx([2.0, 3.0])  # back on the absolute grid


def test_run_zero_max_time_is_zero_steps():
    sim = Simulation(small_params())
    sim.run(max_time=0.0, csv_path="/dev/null", echo=False)
    assert int(sim.state.step) == 0


def test_frame_every_steps_zero_is_clamped(tmp_path):
    hits = []
    sim = Simulation(small_params(max_time=0.1))
    sim.run(
        csv_path=str(tmp_path / "c.csv"), echo=False,
        frame_callback=lambda s: hits.append(int(s.state.step)),
        frame_every_steps=0,
    )
    assert hits  # fired (every step), no ZeroDivisionError


def test_checkpoint_exact_path_and_atomic(tmp_path):
    """save_checkpoint must write exactly the requested path (numpy's
    bare-savez appends .npz, which broke the CLI's os.path.exists resume
    probe) and leave no temp file behind."""
    p = small_params()
    sim = Simulation(p)
    path = str(tmp_path / "ck")  # deliberately no .npz suffix
    save_checkpoint(path, p, sim.state)
    import os

    assert os.path.exists(path)
    assert not os.path.exists(path + ".npz")
    assert not os.path.exists(path + ".tmp")
    p2, state2 = load_checkpoint(path)
    assert p2 == p
    np.testing.assert_array_equal(
        np.asarray(sim.state.pos), np.asarray(state2.pos)
    )


def test_resume_from_truncated_csv(tmp_path):
    """A CSV whose final row was cut mid-write (killed process, full disk)
    must resume from the previous complete row, mirroring the reference's
    second-to-last-newline seek (particlebot.cpp:371-389)."""
    p = small_params()
    csv = tmp_path / "out.csv"
    Simulation(p).run(csv_path=str(csv), echo=False)
    text = csv.read_text()
    rows = text.splitlines()
    truncated = "\n".join(rows[:-1] + [rows[-1][: len(rows[-1]) // 2]])
    csv.write_text(truncated + "\n")

    sim2 = Simulation.resume_from_csv(p, str(csv))
    # last complete row is t = 1.0 (rows at t = 0, 1; t = 2 truncated)
    assert sim2.time == pytest.approx(1.0)


def test_cell_overflow_warning():
    """Slot-table backends drop contacts beyond cell_capacity; the run-loop
    probe must warn when real cell occupancy exceeds it (the reference's
    per-thread neighbor loops have no capacity cap, so an overflow is a
    physics deviation the user must hear about)."""
    from particlerobotsimulations_tpu import ForceBackend

    p = small_params().replace(force_backend=ForceBackend.STENCIL, cell_capacity=4)
    sim = Simulation(p)
    n = p.n_cells
    crowded = np.zeros((n, 2), np.float32)  # everyone in one cell
    assert n > p.cell_capacity
    with pytest.warns(RuntimeWarning, match="cell_capacity"):
        sim._check_cell_overflow(crowded, 0)
    # warns once per run only
    sim._overflow_warned = False
    spread = np.stack(
        [np.arange(n, dtype=np.float32) * 2 * p.cutoff(), np.zeros(n, np.float32)],
        axis=1,
    )
    sim._check_cell_overflow(np.clip(spread, -p.world_half, p.world_half), 0)


def test_native_staleness_guard(tmp_path):
    """A repo-local .so older than its C++ sources must be skipped (fall
    back to numpy/PIL) rather than silently running stale code."""
    import os

    from particlerobotsimulations_tpu.render import native as rn

    so = tmp_path / "libpbot_render.so"
    src = tmp_path / "raster.cpp"
    so.write_bytes(b"x")
    src.write_text("//")
    old = 1_000_000_000
    os.utime(so, (old, old))
    assert rn._stale(str(so)) is True
    os.utime(src, (old - 10, old - 10))
    assert rn._stale(str(so)) is False
