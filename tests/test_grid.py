"""Cell-table neighbor-search tests (ops/grid.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams
from particlerobotsimulations_tpu.ops.forces import dense_collide
from particlerobotsimulations_tpu.ops.grid import (
    build_cell_table,
    cellgrid_collide,
    neighbor_candidates,
)

P = SimParams(n_dead=0)


def random_cloud(n, n_pad, spread, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((n_pad, 2), np.float32)
    pos[:n] = rng.uniform(-spread, spread, (n, 2))
    pos[n:] = 1e6
    mask = np.arange(n_pad) < n
    return jnp.asarray(pos), jnp.asarray(mask)


def test_candidates_cover_cutoff_pairs():
    # every within-cutoff pair must appear in the candidate set
    n, n_pad = 100, 128
    pos, mask = random_cloud(n, n_pad, spread=2.0, seed=1)
    tbl = build_cell_table(P, pos, mask)
    assert int(tbl.overflow) == 0
    cand = np.asarray(neighbor_candidates(P, tbl))
    p = np.asarray(pos)
    cutoff = P.cutoff()
    for i in range(n):
        d = np.linalg.norm(p[:n] - p[i], axis=1)
        required = set(np.where((d < cutoff))[0].tolist()) - {i}
        have = set(c for c in cand[i].tolist() if c >= 0)
        missing = required - have
        assert not missing, f"bot {i} missing neighbors {missing}"


def test_overflow_detection():
    # cram more bots into one cell than capacity
    n_pad = 128
    n = P.cell_capacity + 8
    pos = np.full((n_pad, 2), 1e6, np.float32)
    pos[:n] = 0.001 * np.arange(n)[:, None]  # all in one cell
    mask = np.arange(n_pad) < n
    tbl = build_cell_table(P, jnp.asarray(pos), jnp.asarray(mask))
    assert int(tbl.overflow) == 8


def test_matches_dense_single_step():
    n, n_pad = 200, 256
    rng = np.random.default_rng(3)
    # dense-ish random blob with touching pairs
    pos = np.zeros((n_pad, 2), np.float32)
    pos[:n] = rng.uniform(-1.5, 1.5, (n, 2))
    pos[n:] = 1e6
    vel = np.zeros((n_pad, 2), np.float32)
    vel[:n] = rng.normal(0, 0.05, (n, 2))
    rad = np.full((n_pad,), 0.0775, np.float32)
    mask = jnp.asarray(np.arange(n_pad) < n)
    payload = jnp.zeros(n_pad, bool)

    args = (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rad), mask, payload, 0.01)
    vd, fad, frd = dense_collide(P, *args)
    vg, fag, frg = cellgrid_collide(P, *args)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vg), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fad), np.asarray(fag), atol=2e-5)
    np.testing.assert_allclose(np.asarray(frd), np.asarray(frg), atol=2e-4, rtol=1e-5)


def test_wrap_aliasing_filtered():
    # two bots separated by exactly the wrap period land in the same cell but
    # must not interact (true-distance cutoff)
    period = P.resolved_grid_dim() * P.cutoff()
    n_pad = 128
    pos = np.full((n_pad, 2), 1e6, np.float32)
    pos[0] = (0.0, 0.0)
    pos[1] = (period, 0.0)
    mask = jnp.asarray(np.arange(n_pad) < 2)
    vel = jnp.zeros((n_pad, 2), jnp.float32)
    rad = jnp.full((n_pad,), 0.0775, jnp.float32)
    nv, fa, fr = cellgrid_collide(P, jnp.asarray(pos), vel, rad, mask, jnp.zeros(n_pad, bool), 0.01)
    assert np.all(np.asarray(nv)[:2] == 0)
    assert float(fa[0]) == 0.0
