"""Swarm-level backend equivalence over longer horizons.

Individual trajectories of the chaotic contact dynamics diverge between
backends (float reassociation), so this checks what SURVEY.md §7 calls for:
that the *swarm-level* behavior — centroid drift toward the light — is
unchanged by the neighbor-search scheme.  This is the justification for
replacing the reference's stale-sort 5x5 scan with an exact every-step
rebuild.
"""

import numpy as np
import pytest

from particlerobotsimulations_tpu import ForceBackend, SimParams, Simulation


def centroid_track(params, n_steps, every=500):
    sim = Simulation(params)
    out = [sim.centroid()]
    done = 0
    while done < n_steps:
        sim.step_chunk(every)
        done += every
        out.append(sim.centroid())
    return np.stack(out)


@pytest.mark.parametrize("backend", [ForceBackend.STENCIL, ForceBackend.CELLGRID])
def test_swarm_behavior_matches_dense(backend):
    base = SimParams(n_cells=96, n_dead=0, seed=21, light_x=-5.0, light_y=0.0,
                     max_time=100.0)
    steps = 6000  # 60 sim-seconds
    dense = centroid_track(base.replace(force_backend=ForceBackend.DENSE), steps)
    other = centroid_track(base.replace(force_backend=backend), steps)

    # same starting point, same drift direction, comparable magnitude
    np.testing.assert_allclose(dense[0], other[0], atol=1e-6)
    d_disp = dense[-1] - dense[0]
    o_disp = other[-1] - other[0]
    assert np.linalg.norm(d_disp) > 0.005  # both actually moved
    assert np.linalg.norm(o_disp) > 0.005
    cos = np.dot(d_disp, o_disp) / (
        np.linalg.norm(d_disp) * np.linalg.norm(o_disp)
    )
    assert cos > 0.9, f"drift directions disagree (cos={cos})"
    ratio = np.linalg.norm(o_disp) / np.linalg.norm(d_disp)
    assert 0.5 < ratio < 2.0, f"drift magnitudes disagree (ratio={ratio})"
    # per-record trajectories stay close early (before chaos decorrelates)
    np.testing.assert_allclose(dense[:4], other[:4], atol=0.02)
