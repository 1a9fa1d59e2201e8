"""Pallas stencil kernel parity vs the XLA backends (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlerobotsimulations_tpu import SimParams
from particlerobotsimulations_tpu.ops.forces import dense_collide
from particlerobotsimulations_tpu.ops.pallas_stencil import (
    assign_slots_slotmajor,
    pallas_stencil_collide,
)
from particlerobotsimulations_tpu.ops.stencil import stencil_collide

P = SimParams(n_dead=0, grid_dim=16, cell_capacity=16)


def cloud(n, n_pad, spread, seed):
    rng = np.random.default_rng(seed)
    pos = np.full((n_pad, 2), 1e6, np.float32)
    pos[:n] = rng.uniform(-spread, spread, (n, 2)).astype(np.float32)
    vel = np.zeros((n_pad, 2), np.float32)
    vel[:n] = rng.normal(0, 0.05, (n, 2)).astype(np.float32)
    rad = np.full((n_pad,), 0.0775, np.float32)
    mask = jnp.asarray(np.arange(n_pad) < n)
    return jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rad), mask


def test_slot_assignment_unique():
    pos, vel, rad, mask = cloud(60, 128, 1.0, seed=0)
    slot, overflow = assign_slots_slotmajor(P, pos, mask)
    s = np.asarray(slot)[:60]
    assert int(overflow) == 0
    assert len(np.unique(s)) == 60  # no two bots share a slot
    total = P.resolved_grid_dim() ** 2 * P.cell_capacity
    assert (s < total).all()
    # padding is dropped
    assert (np.asarray(slot)[60:] == total).all()


def test_pallas_matches_stencil_and_dense():
    n, n_pad = 96, 128
    pos, vel, rad, mask = cloud(n, n_pad, 1.2, seed=3)
    payload = jnp.zeros(n_pad, bool)
    args = (pos, vel, rad, mask, payload, 0.01)

    vp, fap, frp = jax.jit(lambda *a: pallas_stencil_collide(P, *a, 0.01))(*args[:-1])
    vs, fas, frs = jax.jit(lambda *a: stencil_collide(P, *a, 0.01))(*args[:-1])
    vd, fad, frd = jax.jit(lambda *a: dense_collide(P, *a, 0.01))(*args[:-1])

    # tolerances cover rsqrt-vs-divide float32 noise in the kernel
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vs), atol=2e-6)
    np.testing.assert_allclose(np.asarray(fap), np.asarray(fas), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(frp), np.asarray(frs), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vd), atol=2e-6)


def test_pallas_chunking_with_slot_reuse():
    # slot assignments are carried through the scan and rebuilt every
    # slot_rebuild_steps; splitting a run into chunks must reproduce the
    # single-chunk trajectory.  Chunk re-entry re-anchors the grid origin
    # (mid-chunk rebuilds keep it fixed — translation-invariant wrap), so
    # the slot layout and hence float summation order differ: the pair SET
    # is identical, values agree to float32 reassociation tolerance.
    from particlerobotsimulations_tpu import Config, ForceBackend, Simulation

    p = SimParams(
        n_cells=48, n_dead=0, seed=5, config=Config.HEX, light_x=-5.0,
        force_backend=ForceBackend.PALLAS, grid_dim=16,
        slot_rebuild_steps=4,
    )
    a = Simulation(p)
    b = Simulation(p)
    a.step_chunk(40)
    for _ in range(5):
        b.step_chunk(8)  # multiple of slot_rebuild_steps
    # stiff contacts (k=1000) amplify the reassociation noise over 40 steps
    np.testing.assert_allclose(a.host_view()[0], b.host_view()[0], atol=1e-4)
    np.testing.assert_allclose(a.host_view()[1], b.host_view()[1], atol=2e-3)


def test_pallas_payload_factors():
    p = P.replace(n_dead=-1, attraction_factor=0.0, n_cells=2)
    n_pad = 128
    pos = np.full((n_pad, 2), 1e6, np.float32)
    pos[0] = (0.0, 0.0)
    pos[1] = (0.5, 0.0)  # inverse-square regime
    mask = jnp.asarray(np.arange(n_pad) < 2)
    payload = jnp.asarray(np.arange(n_pad) == 1)
    vel = jnp.zeros((n_pad, 2), jnp.float32)
    rad = jnp.full((n_pad,), 0.0775, jnp.float32)
    nv, fa, fr = pallas_stencil_collide(p, jnp.asarray(pos), vel, rad, mask, payload, 0.01)
    assert float(fa[0]) == 0.0 and float(fa[1]) == 0.0


def test_ext_nonnewton_kernel_matches_newton():
    # the halo-extended NON-Newton kernel (sharded-table force pass) with
    # the global table's own wrap rows as halos must reproduce the Newton
    # kernel's forces to float32 reassociation
    from particlerobotsimulations_tpu import Config, Simulation
    from particlerobotsimulations_tpu.ops.pallas_stencil import (
        FIELDS,
        _stencil_forces_pallas,
        assign_slots_slotmajor,
        stencil_forces_pallas_ext,
    )
    from particlerobotsimulations_tpu.state import active_mask

    p = SimParams(
        n_cells=800, n_dead=0, seed=2, config=Config.HEX, light_x=-5.0,
        grid_dim=32,
    ).validate()
    g, cap = p.resolved_grid_dim(), p.cell_capacity
    gg = g * g
    st = Simulation(p).state
    n_pad = st.pos.shape[0]
    mask = active_mask(p, n_pad)
    pos = st.pos + jax.random.uniform(
        jax.random.PRNGKey(0), st.pos.shape, minval=-1e-3, maxval=1e-3
    )
    slot, _ = assign_slots_slotmajor(p, pos, mask)
    rows = jnp.stack(
        [pos[:, 0], pos[:, 1], st.vel[:, 0], st.vel[:, 1], st.rad,
         mask.astype(jnp.float32), jnp.ones((n_pad,))], -1,
    )
    tbl = jnp.zeros((gg * cap, 7), jnp.float32).at[slot].set(rows, mode="drop")
    planes = tbl.reshape(cap, gg, 7)
    tables = {k: planes[:, :, j] for j, k in enumerate(FIELDS)}

    ref = _stencil_forces_pallas(p, tables)
    H = 4 * g  # HALO_ROWS rows; 128-lane aligned since g % 32 == 0
    ext = {
        k: jnp.concatenate([v[:, gg - H:], v, v[:, :H]], axis=-1)
        for k, v in tables.items()
    }
    out = stencil_forces_pallas_ext(p, ext, H, gg)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("with_payload", [False, True])
def test_pairmath_diet_bitwise_vs_legacy(monkeypatch, with_payload):
    """The round-6 pair-math instruction diet (d2 + eps^2, payload-free afac
    fold, unguarded inv2 — ops/pallas_stencil._pair_block) must be BITWISE
    identical to the legacy guarded forms on every reachable input.

    A 96-bot cloud at spread 1.2 exercises contact overlap (gap < 0), the
    magnet ramp (0 < gap < INT2) and the inverse-square tail
    (gap >= INT2); the payload variant keeps the afac planes live."""
    p = P.replace(n_dead=-1) if with_payload else P
    n, n_pad = 96, 128
    pos, vel, rad, mask = cloud(n, n_pad, 1.2, seed=11)
    payload = jnp.asarray(np.arange(n_pad) == 1) if with_payload else jnp.zeros(n_pad, bool)

    def run():
        # jax.clear_caches() is REQUIRED for the env knob to take effect:
        # a fresh outer lambda alone is not enough — the inner module-level
        # jit (_stencil_forces_pallas) keeps its trace cache across calls
        # and silently serves the previous knob's jaxpr (verified round 7:
        # without the clear, both runs lower to the same HLO and the
        # comparison is vacuous)
        jax.clear_caches()
        return jax.jit(
            lambda *a: pallas_stencil_collide(p, *a, 0.01)
        )(pos, vel, rad, mask, payload)

    monkeypatch.setenv("PBOT_PAIRMATH", "legacy")
    legacy = run()
    monkeypatch.delenv("PBOT_PAIRMATH")
    # the non-legacy path also includes the magnet-select min/max collapse
    # (PBOT_MAGMIN, on by default at the reference attraction) for the
    # no-payload variant — this comparison pins the whole diet bitwise
    new = run()
    for a, b in zip(legacy, new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_magmin_exhaustive_enumeration():
    """The magnet-select collapse ``min(max(mina, ramp), inv2)`` must pick
    the SAME float32 value as the reference three-way select
    ``where(gap < i1, mina, where(gap < i2, ramp, inv2))`` for every gap
    where the pair outputs consume mag (gap >= 0; see _pair_block /
    _magmin_ok) at the gated attraction constant (the reference default).

    Protocol (the round-4 pair-math-diet standard): enumerate EVERY
    float32 gap in the risky window [i1/2, 8*i2] — ~34M values spanning
    both breakpoints, where the ramp-vs-inv2 orderings are rounding-luck
    facts — and pin the unbounded tails with monotonicity edge arguments:

    * gap in [0, i1/2): ramp = mina + slope*(gap - i1) <= mina exactly
      (adding a non-positive product), so max(mina, ramp) == mina; and
      inv2 = attr/gap^2 is float-monotone nonincreasing in gap, so
      inv2 >= inv2(window left edge) >= mina (asserted) — min picks mina,
      matching the select (gap == 0 gives inv2 = +inf, which min
      discards; attr > 0 statically so 0/0 NaN is impossible).
    * gap > 8*i2: ramp is float-monotone nondecreasing (mina + a
      nonneg-slope product of float-monotone factors) and inv2
      float-monotone nonincreasing, so inv2 <= inv2(edge) <= ramp(edge)
      <= ramp (edge ordering asserted with margin) — min picks inv2,
      matching the select.
    """
    i1, i2 = np.float32(0.0009), np.float32(0.0019)
    mina = np.float32(2.5)
    attr = np.float32(3.0 * 0.000015884)  # the gated value (_magmin_ok)

    lo, hi = np.float32(i1 / 2), np.float32(8 * i2)
    gaps = np.arange(
        np.float32(lo).view(np.int32), np.float32(hi).view(np.int32) + 1,
        dtype=np.int32,
    ).view(np.float32)

    def ramp_inv2(gap):
        # EXACTLY the kernel's op order (_pair_block)
        slope = (attr * np.float32(1.0 / (0.0019 * 0.0019)) - mina) * (
            np.float32(1.0 / (0.0019 - 0.0009))
        )
        ramp = mina + slope * (gap - i1)
        with np.errstate(divide="ignore"):
            inv2 = attr / (gap * gap)
        return ramp, inv2

    ramp, inv2 = ramp_inv2(gaps)
    select = np.where(gaps < i1, mina, np.where(gaps < i2, ramp, inv2))
    minmax = np.minimum(np.maximum(mina, ramp), inv2)
    np.testing.assert_array_equal(select, minmax)

    # tail pins: left edge (gap in [0, i1/2) region) and right edge
    r_lo, v_lo = ramp_inv2(lo)
    assert v_lo >= mina and r_lo <= mina
    r_hi, v_hi = ramp_inv2(hi)
    assert v_hi <= r_hi and v_hi < np.float32(0.25) * r_hi  # wide margin
    # and the slope factors really are nonnegative (monotonicity premise)
    assert attr * np.float32(1.0 / (0.0019 * 0.0019)) - mina > 0
