"""Paper-experiment harness smoke tests (tiny scales)."""

import numpy as np

from particlerobotsimulations_tpu import SimParams, load_cfg
from particlerobotsimulations_tpu.models.experiments import (
    dead_cell_robustness,
    gap_transit,
    payload_transport,
    phototaxis_speed,
)


def test_phototaxis_speed():
    p = SimParams(n_cells=32, n_dead=0, seed=1, light_x=-5.0, light_y=0.0)
    out = phototaxis_speed(p, seeds=[0, 1], sim_seconds=40.0,
                           record_every_steps=2000)
    assert out["distance_mean"].shape == (3,)
    assert out["approach_speed"] > 0
    assert out["centroids"].shape == (3, 2, 2)


def test_dead_cell_robustness_monotone_ish():
    p = SimParams(n_cells=40, n_dead=0, seed=4, light_x=-5.0, light_y=0.0)
    out = dead_cell_robustness(p, [0.0, 0.5], seeds=[0, 1], sim_seconds=60.0)
    v0, v1 = out["approach_speed"]
    # killing half the swarm must slow it substantially
    assert v1 < v0


def test_gap_transit_metric():
    p = load_cfg("examples/example_gap.cfg").replace(n_cells=24)
    out = gap_transit(p, seeds=[0, 1], sim_seconds=20.0)
    assert out["wall_x"] == -1.2
    assert out["frac_past_wall"].shape == (2,)
    # 20 sim-seconds: nobody crosses yet, metric must be 0, not NaN
    assert 0.0 <= out["frac_past_wall_mean"] <= 1.0


def test_payload_transport_shapes():
    p = load_cfg("examples/example_object_transport.cfg").replace(n_cells=31)
    out = payload_transport(p, seeds=[0, 1], sim_seconds=20.0)
    assert out["payload_final"].shape == (2, 2)
    assert out["payload_displacement"].shape == (2, 2)
    assert np.isfinite(out["payload_mean_dx"])
