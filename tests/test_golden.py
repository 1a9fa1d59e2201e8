"""Golden-trajectory regression tests.

The reference's only 'expected results' are eyeball PNGs (SURVEY.md §4); here
each shipped scenario (shrunk for test runtime) is pinned to a recorded
centroid trajectory.  Fixtures are generated on the CPU backend by
``python tests/make_golden.py`` and compared with a small tolerance — CPU
float32 execution is deterministic, so any drift means the physics changed.

Behavioral (platform-independent) assertions ride along: phototaxis must
reduce distance-to-light on every scenario.
"""

import os

import numpy as np
import pytest

from particlerobotsimulations_tpu import load_cfg

from make_golden import GOLDEN_DIR, SCENARIOS, run_scenario

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="golden fixtures not generated"
)


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_golden_trajectory(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no fixture for {name}")
    with np.load(path) as z:
        expected = z["centroids"]
    got = run_scenario(name)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4)


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_phototaxis_behavior(name):
    cfg, overrides, _ = SCENARIOS[name]
    params = load_cfg(cfg).replace(**overrides)
    got = run_scenario(name)
    light = np.array([params.light_x, params.light_y])
    d0 = np.linalg.norm(got[0] - light)
    d1 = np.linalg.norm(got[-1] - light)
    assert d1 < d0, f"{name}: centroid did not approach the light ({d0} -> {d1})"
