"""Independent small-N physics oracle (VERDICT r2 #4).

A pure-scalar numpy float64 implementation of one full simulation step,
written directly from the REFERENCE kernel equations — NOT from this
package's vectorized ops — so a shared misreading of, e.g., the magnet
ramp slope would fail here instead of passing every cross-backend test:

* triangle-wave actuation with the conditional negative-time wrap and the
  torque-limited expansion / constrained contraction
  (/root/reference/particlebot_kernel_impl.cuh:124-181),
* the three-piece magnet law with its 0.9/1.9 mm breakpoints
  (particlebot_kernel_impl.cuh:576-593),
* DEM spring + dashpot + tangential shear contact (:558-575),
* circle and axis-aligned-rectangle obstacle responses including the
  side-priority double-if and the corner elif chain (:703-798),
* stick-slip friction with the payload's friction/mass factors (:801-825),
* split symplectic-Euler integrate + boundary flip (:53-103),
* the light-phase law phase = (min_d - dist) / (2 min_radius) * rise_period
  (:264-290).

Pair-set rule: the reference has no distance cutoff in the force law —
its reach is bounded by the 5x5-cell scan (:691-699).  This package uses
an explicit cutoff ball instead (README deviations); the oracle applies
the same ``dist < params.cutoff()`` rule so that any disagreement with the
DENSE backend isolates a FORCE-LAW or OP-ORDER transcription error, which
is exactly what an independent oracle is for.

The oracle runs in float64; agreement with the float32 DENSE engine is
asserted per-step at float32-accumulation tolerance over dozens of steps.
"""

import jax
import numpy as np
import pytest

from particlerobotsimulations_tpu import (
    Config,
    ForceBackend,
    SimParams,
    Simulation,
    make_step,
)
from particlerobotsimulations_tpu.state import active_mask, payload_mask

# magnet-law constants, re-read from particlebot_kernel_impl.cuh:578-580
INT1 = 0.0009
INT2 = 0.0019
MIN_ATTR = 2.5
MAX_SPEED = 0.1  # actuation speed constant, :156


def oracle_radius(p, rad, phase, aa, ar, dead, time, dt):
    """updateRad_light_wave, scalar transcription (:124-181)."""
    out = rad.copy()
    period = (p.nx + 1) * p.rise_period
    for i in range(len(rad)):
        if dead[i] or phase[i] > 1.0e7:
            continue
        t1 = time + phase[i]
        if t1 < 0:
            t1 = t1 + 100.0 * period          # conditional wrap quirk (:137)
        if t1 >= period:
            t1 = t1 - period * np.floor(t1 / period)
        if t1 >= 2 * p.rise_period:
            continue                           # hold at current radius
        if t1 <= p.rise_period:
            target = p.min_radius + (p.max_radius - p.min_radius) / p.rise_period * t1
        else:
            target = p.max_radius + (p.min_radius - p.max_radius) / p.rise_period * (
                t1 - p.rise_period
            )
        dr1 = target - rad[i]
        torque = dr1 * p.constraint * rad[i] / MAX_SPEED / p.max_radius / dt
        torque = min(torque, p.constraint)
        dr = 0.0
        if dr1 > 0:
            if torque / rad[i] > ar[i]:
                dr = MAX_SPEED * p.max_radius / p.constraint * (
                    torque / rad[i] - ar[i]
                ) * dt
        else:
            if p.constrained_contraction:
                if -p.constraint_contraction * dr1 > aa[i] * rad[i]:
                    dr = (
                        p.constraint_contraction * dr1 + aa[i] * rad[i]
                    ) / p.constraint_contraction
                dr = max(dr, -p.max_radius * dt)
            else:
                dr = dr1
        out[i] = min(max(rad[i] + dr, p.min_radius), p.max_radius)
    return out


def oracle_pair_force(p, pos_i, pos_j, vel_i, vel_j, rad_i, rad_j, attr):
    """collideSpheres (:540-594): (force_on_i, |f| is_attract, |f| is_contact).
    ``attr`` = attraction * attFact_i * attFact_j (:629-649)."""
    rel = pos_j - pos_i
    dist = float(np.hypot(rel[0], rel[1]))
    cd = rad_i + rad_j
    n = rel / dist
    if dist < cd:
        rel_vel = vel_j - vel_i
        tan_vel = rel_vel - np.dot(rel_vel, n) * n
        f = -p.spring * (cd - dist) * n + p.damping * rel_vel + p.shear * tan_vel
        return f, 0.0, float(np.hypot(f[0], f[1]))
    gap = dist - cd
    if dist >= p.cutoff():
        # package pair-set rule (see module docstring): outside the cutoff
        # ball no magnet force applies
        return np.zeros(2), 0.0, 0.0
    if gap < INT1:
        mag = MIN_ATTR
    elif gap < INT2:
        mag = MIN_ATTR + (attr / INT2**2 - MIN_ATTR) / (INT2 - INT1) * (gap - INT1)
    else:
        mag = attr / gap**2
    f = mag * n
    return f, float(np.hypot(f[0], f[1])), 0.0


def oracle_obstacle_force(p, pos, vel, rad):
    """Circle (:703-728) + rect (:729-798) obstacle responses for one bot.
    Returns (force, contact_magnitude_sum)."""
    force = np.zeros(2)
    mag = 0.0
    for (ox, oy, orad) in p.circle_obstacles:
        d2 = (pos[0] - ox) ** 2 + (pos[1] - oy) ** 2
        if d2 < (rad + orad) ** 2:
            d = np.array([ox - pos[0], oy - pos[1]])
            d = d / np.hypot(d[0], d[1])
            rel_vel = -vel
            tan_vel = rel_vel - np.dot(rel_vel, d) * d
            f = (
                2.0 * p.spring * (rad + orad - np.sqrt(d2)) * (-d)
                + p.damping * rel_vel
                + p.shear * tan_vel
            )
            force += f
            mag += float(np.hypot(f[0], f[1]))
    for (x1, x2, y1, y2) in p.rect_obstacles:
        hit = False
        d = np.zeros(2)
        overlap = 0.0
        if y1 < pos[1] < y2:
            # both side-ifs evaluate; the second wins when both hold (:734-745)
            if x1 - rad < pos[0] < x2 - rad:
                hit, d, overlap = True, np.array([1.0, 0.0]), pos[0] - x1 + rad
            if x1 + rad < pos[0] < x2 + rad:
                hit, d, overlap = True, np.array([-1.0, 0.0]), -pos[0] + x2 + rad
        elif x1 < pos[0] < x2:
            if y1 - rad < pos[1] < y2 - rad:
                hit, d, overlap = True, np.array([0.0, 1.0]), pos[1] - y1 + rad
            if y1 + rad < pos[1] < y2 + rad:
                hit, d, overlap = True, np.array([0.0, -1.0]), -pos[1] + y2 + rad
        else:
            # corner elif chain, reference order: (x2,y2) (x1,y2) (x1,y1) (x2,y1)
            for cx, cy in ((x2, y2), (x1, y2), (x1, y1), (x2, y1)):
                d2c = (pos[0] - cx) ** 2 + (pos[1] - cy) ** 2
                if d2c < rad**2:
                    dc = np.array([pos[0] - cx, pos[1] - cy])
                    d = -dc / np.hypot(dc[0], dc[1])
                    hit, overlap = True, rad - np.sqrt(d2c)
                    break
        if hit:
            rel_vel = -vel
            tan_vel = rel_vel - np.dot(rel_vel, d) * d
            f = (
                -2.0 * p.spring * overlap * d
                + p.damping * rel_vel
                + p.shear * tan_vel
            )
            force += f
            mag += float(np.hypot(f[0], f[1]))
    return force, mag


def oracle_collide(p, pos, vel, rad, payload, dt):
    """collideD (:657-831): all-pairs forces + obstacles + stick-slip ->
    (new_vel, abs_force_a, abs_force_r)."""
    n = len(rad)
    new_vel = vel.copy()
    aa = np.zeros(n)
    ar = np.zeros(n)
    for i in range(n):
        force = np.zeros(2)
        fa = 0.0
        fr = 0.0
        att_i = p.attraction_factor if payload[i] else 1.0
        for j in range(n):
            if j == i:
                continue
            att_j = p.attraction_factor if payload[j] else 1.0
            f, da, dr_ = oracle_pair_force(
                p, pos[i], pos[j], vel[i], vel[j], rad[i], rad[j],
                p.attraction * att_i * att_j,
            )
            force += f
            fa += da
            fr += dr_
        f_obs, m_obs = oracle_obstacle_force(p, pos[i], vel[i], rad[i])
        force += f_obs
        fr += m_obs

        friction = p.friction * (p.friction_factor if payload[i] else 1.0)
        gravity = p.gravity * (p.mass_factor if payload[i] else 1.0)
        v = vel[i].copy()
        if np.hypot(v[0], v[1]) < 1e-6 and np.hypot(force[0], force[1]) < (
            2.0 * friction * gravity
        ):
            force = np.zeros(2)
        if payload[i]:
            v = v + force / p.mass_factor * dt
        else:
            v = v + force * dt
        speed = np.hypot(v[0], v[1])
        if speed < friction * gravity * dt:
            v = np.zeros(2)
        else:
            v = v - (friction * gravity * dt) * (v / speed)
        new_vel[i] = v
        aa[i] = fa
        ar[i] = fr
    return new_vel, aa, ar


def oracle_integrate(p, pos, vel, rad, dt):
    """integrate_functor (:53-103): pos += vel dt, wall clamp + vel flip."""
    pos = pos.copy()
    vel = vel.copy()
    w = p.world_half
    for i in range(len(rad)):
        pos[i] = pos[i] + vel[i] * dt
        for ax in (0, 1):
            if pos[i, ax] > w - rad[i]:
                pos[i, ax] = w - rad[i]
                vel[i, ax] *= p.boundary_damping
            if pos[i, ax] < -w + rad[i]:
                pos[i, ax] = -w + rad[i]
                vel[i, ax] *= p.boundary_damping
    return pos, vel


def _ray_hits_segment(x0, y0, x1, y1, x3, y3, x4, y4):
    """checkIntersectionLine (:184-209): light ray (x0,y0)->(x1,y1) vs wall
    segment (x3,y3)->(x4,y4), EXCLUSIVE parametric bounds on both."""
    with np.errstate(divide="ignore", invalid="ignore"):
        if abs((x4 - x3) / (x1 - x0)) == abs((y4 - y3) / (y1 - y0)):
            return False
        if abs(y4 - y3) > 0:
            t = (x3 - x0 - (y3 - y0) * (x3 - x4) / (y3 - y4)) * (
                (y3 - y4) / ((x1 - x0) * (y3 - y4) - (y1 - y0) * (x3 - x4))
            )
            if t <= 0 or t >= 1:
                return False
            t1 = (y3 - y0 - t * (y1 - y0)) / (y3 - y4)
            return 0 < t1 < 1
        if abs(x4 - x3) > 0:
            t = (y3 - y0 - (x3 - x0) * (y3 - y4) / (x3 - x4)) * (
                (x3 - x4) / ((y1 - y0) * (x3 - x4) - (x1 - x0) * (y3 - y4))
            )
            if t <= 0 or t >= 1:
                return False
            t1 = (x3 - x0 - t * (x1 - x0)) / (x3 - x4)
            return 0 < t1 < 1
        return False


def _ray_hits_circle(lx, ly, px, py, ox, oy, orad):
    """checkIntersectionCircle (:211-236): quadratic in the ray parameter,
    EXCLUSIVE root bounds."""
    c1 = lx * lx + ly * ly
    c2 = px * px + py * py
    c3 = ox * ox + oy * oy
    c4 = lx * px + ly * py
    c5 = lx * ox + ly * oy
    c6 = px * ox + py * oy
    a = c1 + c2 - 2 * c4
    b = -2 * c1 + 2 * c4 + 2 * c5 - 2 * c6
    c = c1 + c3 - 2 * c5 - orad * orad
    d = b * b - 4 * a * c
    if d < 0:
        return False
    r1 = (-b + np.sqrt(d)) / 2 / a
    r2 = (-b - np.sqrt(d)) / 2 / a
    return (0 < r1 < 1) or (0 < r2 < 1)


def _shadowed(p, x, y):
    """checkIntersection (:238-262): any obstacle blocks the light ray."""
    for (ox, oy, orad) in p.circle_obstacles:
        if _ray_hits_circle(p.light_x, p.light_y, x, y, ox, oy, orad):
            return True
    for (x1, x2, y1, y2) in p.rect_obstacles:
        for seg in (
            (x1, y1, x1, y2), (x1, y2, x2, y2),
            (x2, y2, x2, y1), (x2, y1, x1, y1),
        ):
            if _ray_hits_segment(p.light_x, p.light_y, x, y, *seg):
                return True
    return False


def oracle_phase(p, pos, phase):
    """updatePhase (:264-290), no noise: nearest bot leads; shadowed bots
    get the mode-1/2 sentinel phases."""
    light = np.array([p.light_x, p.light_y])
    dists = np.hypot(pos[:, 0] - light[0], pos[:, 1] - light[1])
    min_d = dists.min()  # over all bots, shadowed or not (host loop,
    #                      particlebot.cpp:214-228)
    out = (min_d - dists) / (2.0 * p.min_radius) * p.rise_period
    if p.light_shadow:
        for i in range(len(out)):
            if _shadowed(p, pos[i, 0], pos[i, 1]):
                out[i] = (
                    -(p.nx - 1) * p.rise_period
                    if p.light_shadow == 1
                    else 9999999999.0
                )
    return out


def oracle_step(p, st, dt, step_idx):
    """One full step in the engine's op order (engine.make_step ==
    particlebot.cpp:170-300): phase -> radius -> integrate -> collide,
    with the one-step-lag force feedback."""
    pos, vel, rad, phase, aa, ar, dead, payload = st
    if step_idx % p.phase_update_steps == 0:
        phase = oracle_phase(p, pos, phase)
    time = step_idx * dt
    rad = oracle_radius(p, rad, phase, aa, ar, dead, time, dt)
    pos, vel = oracle_integrate(p, pos, vel, rad, dt)
    new_vel, aa, ar = oracle_collide(p, pos, vel, rad, payload, dt)
    return (pos, new_vel, rad, phase, aa, ar, dead, payload)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def engine_state_arrays(p, state):
    n = p.n_cells
    return (
        np.asarray(state.pos, np.float64)[:n].copy(),
        np.asarray(state.vel, np.float64)[:n].copy(),
        np.asarray(state.rad, np.float64)[:n].copy(),
        np.asarray(state.phase, np.float64)[:n].copy(),
        np.asarray(state.abs_force_a, np.float64)[:n].copy(),
        np.asarray(state.abs_force_r, np.float64)[:n].copy(),
        np.asarray(state.dead)[:n].copy(),
        np.asarray(payload_mask(p, state.pos.shape[0]))[:n].copy(),
    )


def run_both(p, n_steps, atol_pos=2e-5, atol_vel=2e-4, atol_rad=2e-6):
    """Step the DENSE engine and the oracle side by side, comparing every
    step (divergence compounds chaotically — early detection matters)."""
    p = p.validate()
    sim = Simulation(p)
    # jitter off the lattice's exact tangencies (gap == 0 is a branch edge)
    noise = 1e-4 * jax.random.normal(jax.random.key(7), sim.state.pos.shape)
    state = sim.state._replace(pos=sim.state.pos + noise)
    st = engine_state_arrays(p, state)
    step = jax.jit(make_step(p))
    n = p.n_cells
    for k in range(n_steps):
        state = step(state)
        st = oracle_step(p, st, p.timestep, k)
        np.testing.assert_allclose(
            np.asarray(state.rad)[:n], st[2], atol=atol_rad,
            err_msg=f"rad step {k}",
        )
        np.testing.assert_allclose(
            np.asarray(state.pos)[:n], st[0], atol=atol_pos,
            err_msg=f"pos step {k}",
        )
        np.testing.assert_allclose(
            np.asarray(state.vel)[:n], st[1], atol=atol_vel,
            err_msg=f"vel step {k}",
        )
        # force magnitudes are float32 sums of O(1..1e3) terms: compare at
        # float32-accumulation tolerance (relative), small atol floor for
        # borderline-cutoff pairs whose membership differs in f32 vs f64
        np.testing.assert_allclose(
            np.asarray(state.abs_force_a)[:n], st[4], rtol=5e-3, atol=1e-3,
            err_msg=f"abs_force_a step {k}",
        )
        np.testing.assert_allclose(
            np.asarray(state.abs_force_r)[:n], st[5], rtol=5e-3, atol=1e-2,
            err_msg=f"abs_force_r step {k}",
        )
    return state, st


def base_params(**kw):
    base = dict(
        n_cells=10,
        n_dead=0,
        seed=11,
        config=Config.HEX,
        force_backend=ForceBackend.DENSE,
        phase_std=0.0,
        light_x=-3.0,
        light_y=1.0,
        phase_update_interval=0.06,   # cross two phase gates in 30 steps
    )
    base.update(kw)
    return SimParams(**base)


def test_oracle_plain_cluster():
    """10-bot free cluster, 30 steps: contact + magnet + stick-slip +
    actuation wave against the oracle."""
    run_both(base_params(), 30)


def test_oracle_payload_and_obstacles():
    """Payload (mass/friction/attraction factors) + circle and rect
    obstacles placed to contact the drifting cluster."""
    p = base_params(
        n_cells=10,
        n_dead=-1,                       # last bot is the payload
        circle_obstacles=((-0.42, 0.05, 0.25),),
        rect_obstacles=((0.45, 0.8, -0.4, 0.4),),  # (x1, x2, y1, y2)
    )
    # 24 steps (4 phase gates): persistent obstacle contact makes this the
    # stiffest scenario — float32-vs-float64 drift compounds fastest here
    state, st = run_both(p, 24)
    # the scenario actually exercised the circle-obstacle branch
    pos = st[0]
    d_circle = np.hypot(pos[:, 0] + 0.42, pos[:, 1] - 0.05)
    assert (
        d_circle < 0.25 + st[2] + 0.02
    ).any(), "circle obstacle never approached — scenario misplaced"


def test_oracle_boundary_flip():
    """Bots flung at the wall: clamp + boundaryDamping velocity flip."""
    p = base_params(n_cells=4, constrained_contraction=0)
    p = p.validate()
    sim = Simulation(p)
    n = 4
    pos0 = np.array(
        [[63.2, 0.0], [62.5, 1.0], [0.0, 63.3], [-63.1, -0.5]], np.float32
    )
    vel0 = np.array(
        [[30.0, 0.0], [25.0, 5.0], [0.0, 28.0], [-27.0, 0.0]], np.float32
    )
    n_pad = sim.state.pos.shape[0]
    pos_f = np.zeros((n_pad, 2), np.float32)
    vel_f = np.zeros((n_pad, 2), np.float32)
    pos_f[:n] = pos0
    vel_f[:n] = vel0
    state = sim.state._replace(
        pos=jax.numpy.asarray(pos_f), vel=jax.numpy.asarray(vel_f)
    )
    st = engine_state_arrays(p, state)
    step = jax.jit(make_step(p))
    hit_wall = False
    for k in range(12):
        state = step(state)
        st = oracle_step(p, st, p.timestep, k)
        np.testing.assert_allclose(
            np.asarray(state.pos)[:n], st[0], atol=2e-5, err_msg=f"step {k}"
        )
        np.testing.assert_allclose(
            np.asarray(state.vel)[:n], st[1], atol=2e-4, err_msg=f"step {k}"
        )
        hit_wall = hit_wall or (
            np.abs(st[0]).max() > p.world_half - st[2].max() - 1e-6
        )
    assert hit_wall, "no bot reached the wall — scenario misconfigured"


def test_oracle_constrained_contraction():
    """The constrained-contraction branch (:166-176) — attraction-loaded
    bots contract slower than the free triangle wave."""
    run_both(base_params(constrained_contraction=1), 30)


@pytest.mark.parametrize("mode", [1, 2])
def test_oracle_shadow_raycast(mode):
    """Light-shadow modes (:276-284): a circle obstacle between the light
    and part of the cluster puts the far side in shadow — the mode-1
    (lag-phase) / mode-2 (never-modulate sentinel) assignments and the
    segment/circle intersection predicates must match the engine."""
    p = base_params(
        light_x=-3.0, light_y=0.0, light_shadow=mode,
        circle_obstacles=((-1.2, 0.18, 0.15),),
        rect_obstacles=((-1.0, -0.8, -0.5, -0.1),),  # (x1, x2, y1, y2)
    )
    state, st = run_both(p, 14)
    # the scenario actually produced a shadow split
    ph = st[3]
    sentinel = (
        -(p.nx - 1) * p.rise_period if mode == 1 else 9999999999.0
    )
    n_shadow = int(np.sum(np.isclose(ph, sentinel)))
    assert 0 < n_shadow < p.n_cells, (
        f"shadow split degenerate: {n_shadow}/{p.n_cells} shadowed"
    )
