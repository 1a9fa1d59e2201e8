"""Profiling utility smoke test."""

from particlerobotsimulations_tpu import Config, SimParams
from particlerobotsimulations_tpu.utils.profiling import measure_throughput


def test_measure_throughput():
    p = SimParams(n_cells=16, n_dead=0, config=Config.HEX, light_x=-5.0)
    t = measure_throughput(p, n_steps=50, reps=1)
    assert t.n_bots == 16
    assert t.particle_steps_per_sec > 0
    assert t.ms_per_step > 0
    assert t.backend == "DENSE"
