"""Initial-layout tests (reference: particlebot.cpp:413-801)."""

import math

import numpy as np
import pytest

from particlerobotsimulations_tpu import Config, SimParams
from particlerobotsimulations_tpu.models.placement import initial_state_arrays, place


def connected_components(pos, touch_dist):
    n = len(pos)
    seen = np.zeros(n, bool)
    comps = 0
    for s in range(n):
        if seen[s]:
            continue
        comps += 1
        stack = [s]
        seen[s] = True
        while stack:
            i = stack.pop()
            d = np.linalg.norm(pos - pos[i], axis=1)
            nbrs = np.where((d < touch_dist) & ~seen)[0]
            seen[nbrs] = True
            stack.extend(nbrs.tolist())
    return comps


class TestRandomAccretion:
    @pytest.fixture(scope="class")
    def blob(self):
        p = SimParams(n_cells=120, n_dead=0, config=Config.RANDOM, seed=42)
        pos, sx = place(p)
        return p, pos

    def test_first_bot_pinned(self, blob):
        p, pos = blob
        np.testing.assert_allclose(pos[0], [5.0, 0.0], atol=1e-6)

    def test_no_overlaps(self, blob):
        p, pos = blob
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        np.fill_diagonal(d, 1.0)
        # The packer rejects below 2*min_radius for every bot EXCEPT bot 2,
        # which the reference deliberately wedges tangent to the midpoint of
        # the first pair at distance r*sqrt(2) from both
        # (particlebot.cpp:646-671) — an initial overlap the spring resolves.
        mask = np.ones_like(d, bool)
        mask[2, :] = mask[:, 2] = False
        assert d[mask].min() > 2 * p.min_radius - 1e-5
        assert d[2, [0, 1]].min() > p.min_radius * np.sqrt(2) - 1e-5

    def test_connected_blob(self, blob):
        p, pos = blob
        # pivot-until-contact leaves every bot within ~2r(1+eps) of a neighbor
        assert connected_components(pos, 2 * p.min_radius * 1.35) == 1

    def test_seed_determinism(self):
        p = SimParams(n_cells=50, n_dead=0, seed=7)
        a, _ = place(p)
        b, _ = place(p)
        np.testing.assert_array_equal(a, b)
        c, _ = place(p.replace(seed=8))
        assert not np.array_equal(a, c)

    def test_payload_at_left_edge(self):
        p = SimParams(n_cells=40, n_dead=-1, seed=3)
        pos, _ = place(p)
        assert pos[-1, 0] < pos[:-1, 0].min()
        assert pos[-1, 1] == 0.0
        # reference offset rule (particlebot.cpp:733)
        expected = pos[:-1, 0].min() - p.min_radius * p.rad_factor - 2 * p.min_radius
        assert pos[-1, 0] == pytest.approx(expected, abs=1e-5)


class TestDeterministicLayouts:
    def test_line(self):
        p = SimParams(n_cells=5, n_dead=0, config=Config.LINE)
        pos, sx = place(p)
        assert sx == 5
        assert np.all(pos[:, 1] == 0)
        dx = np.diff(pos[:, 0])
        np.testing.assert_allclose(dx, 2 * p.min_radius, rtol=1e-5)

    def test_hex_first_ring(self):
        p = SimParams(n_cells=7, n_dead=0, config=Config.HEX)
        pos, _ = place(p)
        np.testing.assert_allclose(pos[0], [0, 0], atol=1e-7)
        d = np.linalg.norm(pos[1:], axis=1)
        np.testing.assert_allclose(d, 2 * p.min_radius, rtol=1e-5)

    def test_blob_layouts_touch(self):
        for cfg in (Config.BLOB, Config.BLOB_UPLEFT, Config.LIGHTTEST_7):
            p = SimParams(n_cells=10, n_dead=0, config=cfg)
            pos, _ = place(p)
            assert pos.shape == (10, 2)
            d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            # hand-coded blobs are contact-packed: nearest neighbor ~2r
            assert d.min(axis=1).max() < 2 * p.min_radius * 1.1 + 1e-6
            assert d.min() > 2 * p.min_radius * 0.9

    def test_blob_requires_ten(self):
        with pytest.raises(ValueError):
            place(SimParams(n_cells=9, n_dead=0, config=Config.BLOB))

    def test_grid_replicates_reference_quirk(self):
        # upstream zeroes y (particlebot.cpp:428) — GRID degenerates to a
        # stacked line; we keep that behavior
        p = SimParams(n_cells=9, n_dead=0, config=Config.GRID)
        pos, sx = place(p)
        assert sx == 3
        assert np.all(pos[:, 1] == 0)


def test_nx_fallback():
    p = SimParams(n_cells=16, n_dead=0, config=Config.LINE, nx=0)
    p_eff, *_ = initial_state_arrays(p)
    assert p_eff.nx == 16


def test_initial_arrays_payload():
    p = SimParams(n_cells=20, n_dead=-1, seed=1)
    p_eff, pos, vel, rad, phase, dead = initial_state_arrays(p)
    assert rad[-1] == pytest.approx(p.min_radius * p.rad_factor)
    assert dead[-1] and not dead[:-1].any()
    assert np.all(vel == 0) and np.all(phase == 0)
