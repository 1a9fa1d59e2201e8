"""Initial swarm layout generators (host-side, seeded numpy).

Re-derivation of ``Particlebot::reset`` and helpers
(/root/reference/particlebot.cpp:413-801).  Placement is inherently
sequential for the random-accretion layout, so it stays on the host with a
``numpy.random.Generator`` — the goal is *distributional* parity with the
reference (connected random close-packed blob, payload parked at the left
edge), not bitwise parity with C ``rand()``.

Layouts:
* RANDOM      — stochastic accretion packer (particlebot.cpp:612-747)
* GRID        — reference formula replicated verbatim, including its quirk of
                zeroing every y coordinate (particlebot.cpp:413-436: the y
                term is commented out upstream), so GRID degenerates to a
                stacked line exactly as it does in the reference
* LINE        — single row, spacing 2*min_radius
* HEX         — concentric hex rings (particlebot.cpp:438-481)
* BLOB / BLOB_UPLEFT / LIGHTTEST_7 — hand-coded 10-bot blobs
                (particlebot.cpp:486-611)
"""

from __future__ import annotations

import math


import numpy as np

from ..config import Config, SimParams

_SQRT3 = math.sqrt(3.0)


def config_size_x(params: SimParams) -> int:
    """The layout's x-extent, used for the ``Nx == 0`` fallback
    (particlebot.cpp:772-773).  Deterministic in n (seed-independent) for
    every layout, so batched/sweep callers can resolve params once and
    compile a single step function for all scenes."""
    n = params.n_cells
    cfg = params.config
    if cfg in (Config.RANDOM, Config.GRID):
        return int(math.ceil(math.sqrt(n)))
    if cfg == Config.LINE:
        return n
    if cfg == Config.HEX:
        return _hex_rings(n) * 2
    if cfg in (Config.BLOB, Config.BLOB_UPLEFT, Config.LIGHTTEST_7):
        return 4
    raise ValueError(f"unknown layout {cfg}")


def resolve_params(params: SimParams) -> SimParams:
    """Apply the ``Nx == 0 -> config_size_x`` fallback without running
    placement.  ``Simulation`` resolves via initial_state_arrays; any caller
    compiling a step function directly from raw params (sweeps, profiling)
    must resolve first or the actuation wave period silently differs."""
    if params.nx == 0:
        return params.replace(nx=config_size_x(params))
    return params


def place(params: SimParams, seed: int | None = None):
    """Returns (pos (n,2) float32, config_size_x: int)."""
    n = params.n_cells
    rng = np.random.default_rng(params.seed if seed is None else seed)
    cfg = params.config
    if cfg == Config.RANDOM:
        pos = _random_accretion(params, rng)
    elif cfg == Config.GRID:
        s = config_size_x(params)
        pos = _grid(params, rng, size_x=s, size_y=s, jitter=params.max_radius * 0.01)
    elif cfg == Config.LINE:
        pos = _grid(params, rng, size_x=n, size_y=1, jitter=0.0)
    elif cfg == Config.HEX:
        pos = _hex(params)
    elif cfg in (Config.BLOB, Config.BLOB_UPLEFT, Config.LIGHTTEST_7):
        pos = _fixed_blob(params, cfg)
    else:
        raise ValueError(f"unknown layout {cfg}")
    return pos, config_size_x(params)


def _grid(params: SimParams, rng, size_x: int, size_y: int, jitter: float):
    n = params.n_cells
    spacing = params.min_radius * 2.0
    xs = size_x * spacing / 2.0
    pos = np.zeros((n, 2), dtype=np.float32)
    for i in range(n):
        x = i % size_x
        pos[i, 0] = (
            spacing * x
            + params.min_radius
            - xs
            + (rng.random() * 2.0 - 1.0) * jitter
        )
        pos[i, 1] = 0.0  # reference zeroes y (particlebot.cpp:428)
    return pos


def _hex_rings(n: int) -> int:
    """Final ring counter of the hex fill loop below (== its n_ring exit
    value): ring k holds 6*k bots; the counter increments once more after
    the ring that reaches n."""
    i, n_ring = 1, 1
    while i < n:
        i += 6 * n_ring
        n_ring += 1
    return n_ring


def _hex(params: SimParams):
    """Concentric hexagonal rings around the origin (particlebot.cpp:438-481)."""
    n = params.n_cells
    spacing = params.min_radius * 2.0
    dirs = [
        (1.0, 0.0),
        (0.5, _SQRT3 * 0.5),
        (-0.5, _SQRT3 * 0.5),
        (-1.0, 0.0),
        (-0.5, -_SQRT3 * 0.5),
        (0.5, -_SQRT3 * 0.5),
        (1.0, 0.0),
    ]
    pos = np.zeros((n, 2), dtype=np.float32)
    i = 1
    n_ring = 1
    while i < n:
        for k in range(6):
            for j in range(n_ring):
                if i >= n:
                    break
                pos[i, 0] = dirs[k][0] * (n_ring - j) * spacing + dirs[k + 1][0] * spacing * j
                pos[i, 1] = dirs[k][1] * (n_ring - j) * spacing + dirs[k + 1][1] * spacing * j
                i += 1
            if i >= n:
                break
        n_ring += 1
    assert n_ring == _hex_rings(n)
    return pos


def _fixed_blob(params: SimParams, cfg: Config) -> np.ndarray:
    """The three hand-coded 10-bot layouts (particlebot.cpp:486-611)."""
    if params.n_cells != 10:
        raise ValueError(f"{cfg.name} layout requires n_cells == 10")
    r = params.min_radius
    q = (1.0 + _SQRT3) * r
    if cfg == Config.BLOB:
        xy = [
            (r, -r), (r, r), (-r, -r), (-r, r), (-q, 0.0),
            (0.0, -q), (0.0, q), (2 * r, -q), (2 * r, q), (q, 0.0),
        ]
    elif cfg == Config.BLOB_UPLEFT:
        xy = [
            (-r, r), (r, r), (-r, -r), (r, -r), (0.0, -q),
            (-q, 0.0), (q, 0.0), (-q, 2 * r), (q, 2 * r), (0.0, q),
        ]
    else:  # LIGHTTEST_7
        xy = [
            (0.0, 0.0), (-_SQRT3 * r, r), (_SQRT3 * r, -r), (_SQRT3 * r, r),
            (0.0, 2 * r), (-_SQRT3 * r, -r), (0.0, -2 * r),
            (_SQRT3 * r, 3 * r), (0.0, 4 * r), (_SQRT3 * 2 * r, 2 * r),
        ]
    return np.asarray(xy, dtype=np.float32)


def _random_accretion(params: SimParams, rng):
    """Sequential stochastic packer (particlebot.cpp:612-747).

    Bot 0 pinned at (5, 0); bot 2 placed tangent to the midpoint of the first
    pair; every other bot picks a random anchor and angle, rejects overlaps
    via a bucket grid, grows its placement ring after 200 failures, then
    pivots in 10-degree increments until contact.  The payload (last bot,
    n_dead == -1) is parked left of the blob's min-x at y = 0
    (particlebot.cpp:731-735).
    """
    n = params.n_cells
    min_r = params.min_radius
    cell = params.cell_size()
    gmask = 511  # 512-wide bucket grid, power-of-two wrap (main.cpp:937)
    # the origin only shifts bucket ids uniformly (the 3x3 neighbor check is
    # shift-invariant), so the world_half==0 auto-fit sentinel — resolved
    # AFTER placement from the extent — can use the parity default here
    origin = -(params.world_half or 64.0)

    pos = np.zeros((n, 2), dtype=np.float64)
    buckets: dict[tuple, list[int]] = {}

    def bucket_of(x, y):
        return (
            int(math.floor((x - origin) / cell)) & gmask,
            int(math.floor((y - origin) / cell)) & gmask,
        )

    def add(i, x, y):
        pos[i] = (x, y)
        buckets.setdefault(bucket_of(x, y), []).append(i)

    def overlaps(x, y) -> bool:
        bx, by = bucket_of(x, y)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in buckets.get(((bx + dx) & gmask, (by + dy) & gmask), ()):
                    if math.hypot(x - pos[j, 0], y - pos[j, 1]) < 2.0 * min_r:
                        return True
        return False

    add(0, 5.0, 0.0)
    min_x = math.inf
    inc = math.radians(10.0)
    max_failures = 200
    # carried across bots, reset only on hitting the cap — the reference
    # declares unsuccessful_placements OUTSIDE the per-bot loop
    # (particlebot.cpp:630), so leftover failures from earlier bots make
    # later bots grow their placement ring after fewer fresh rejections
    failures = 0

    for i in range(1, n):
        if i == 2:
            # tangent to the midpoint of bots 0 and 1, random side
            d = pos[1] - pos[0]
            d = d / np.linalg.norm(d)
            side = np.array([d[1], -d[0]]) if rng.integers(2) else np.array([-d[1], d[0]])
            x, y = (pos[0] + pos[1]) / 2.0 + side * min_r
            min_x = min(min_x, x)
            add(i, x, y)
            continue

        r = min_r
        while True:
            anchor = int(rng.integers(i))
            if failures == max_failures:
                failures = 0
                r += min_r
            theta = 2.0 * math.pi * rng.random()
            x = pos[anchor, 0] + 2.0 * r * math.cos(theta)
            y = pos[anchor, 1] + 2.0 * r * math.sin(theta)
            if overlaps(x, y):
                failures += 1
                continue
            # pivot toward contact
            start = theta
            while theta - start < 2.0 * math.pi:
                theta += inc
                x = pos[anchor, 0] + 2.0 * r * math.cos(theta)
                y = pos[anchor, 1] + 2.0 * r * math.sin(theta)
                if overlaps(x, y):
                    theta -= inc
                    break
            x = pos[anchor, 0] + 2.0 * r * math.cos(theta)
            y = pos[anchor, 1] + 2.0 * r * math.sin(theta)
            break

        min_x = min(min_x, x)
        if params.has_payload and i == n - 1:
            x = min_x - min_r * params.rad_factor - 2.0 * min_r
            y = 0.0
        add(i, x, y)

    return pos.astype(np.float32)


def autofit_world_half(params: SimParams, pos: np.ndarray) -> SimParams:
    """Resolve the ``world_half == 0`` auto-fit sentinel from a placement
    (or restored-state) position array: the box must contain the swarm with
    headroom for expansion and drift toward the light, and never shrinks
    below the reference-parity 64 (main.cpp:937-939) so auto-fitted small
    scenarios behave exactly like the default."""
    if params.world_half != 0:
        return params
    span = float(np.abs(pos).max()) if pos.size else 0.0
    max_rad = params.max_radius
    if params.has_payload:
        max_rad = max(max_rad, params.min_radius * params.rad_factor)
    # 25% drift/expansion headroom + one diameter of slack, integer-rounded
    half = max(64.0, float(math.ceil(1.25 * (span + max_rad) + 2.0)))
    return params.replace(world_half=half)


def initial_state_arrays(params: SimParams, seed: int | None = None):
    """Host arrays for a fresh scenario: (pos, vel, rad, phase, dead).

    Radii / dead flags per particlebot.cpp:784-791.  Also resolves the
    ``Nx == 0 -> config_size_x`` fallback (particlebot.cpp:772-773) and the
    ``world_half == 0`` auto-fit sentinel by returning the effective params.
    """
    pos, size_x = place(params, seed=seed)
    if params.nx == 0:
        params = params.replace(nx=size_x)
    params = autofit_world_half(params, pos)
    n = params.n_cells
    vel = np.zeros((n, 2), dtype=np.float32)
    rad = np.full((n,), params.min_radius, dtype=np.float32)
    phase = np.zeros((n,), dtype=np.float32)
    dead = np.zeros((n,), dtype=bool)
    if params.has_payload:
        rad[n - 1] = params.min_radius * params.rad_factor
        dead[n - 1] = True
    return params, pos, vel, rad, phase, dead
