"""Monte-Carlo sweeps: vmap over scenes, sharded over a TPU mesh.

The reference is strictly single-GPU/single-scene
(/root/reference/particlebot_cuda.cu:29-47); its parallelism story is one
CUDA thread per bot.  The TPU scale-out axis is the *scene batch*: the paper
workflow (robustness curves vs dead-cell fraction, seed sweeps) runs many
seeds of the same scenario, which is embarrassingly parallel — one scene fits
one chip; we ``vmap`` scenes on-chip and lay the batch over the mesh's data
axis so XLA keeps every chip busy with zero per-step communication.
Cross-scene statistics (mean/std centroid trajectories) ride ICI in a single
collective at the end.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimParams
from ..engine import make_run_chunk, make_run_chunk_batched
from ..models.placement import initial_state_arrays
from ..state import SimState, make_state

# Single-device execution-strategy policy, measured on TPU through
# run_sweep itself (v5e, scripts/sweepbench.py, 8 seeds x 30k steps at the
# real dump-interval record cadence — docs/RESULTS.md "Sweep execution
# strategy"):
#
#   bots   sequential  batched   winner
#   300      16.1M      30.9M    batched  (DENSE: per-scene chunk dispatch
#                                          ~24 ms dominates sequential)
#   1000     37.8M      29.7M    sequential (megakernel band: the vmapped
#                                          span grid repeats per-scene
#                                          kernel cost; regular-batched is
#                                          no better, 27.7M)
#   2000     55.1M vs 47.9M      batched
#   4000     90.3M vs 77.3M      batched
#   10000    99.9M vs 96.2M      batched
#
# So: ON-CHIP batching wins everywhere EXCEPT the megakernel-eligible band
# (PALLAS backend, G=16 tables, <= ~1.2k bots), where a single scene's
# span kernel is so much faster than its vmapped twin that it beats the
# dispatch amortization.  With a device mesh the batch IS the parallelism
# axis — always batched.


def make_batch_state(params: SimParams, seeds: Sequence[int]) -> SimState:
    """Stack fresh scenes (one per seed) along a leading batch axis.

    Placement runs on host per seed (inherently sequential accretion); the
    stacked pytree is then a single device array per field.
    """
    states = []
    for s in seeds:
        p_eff, pos, vel, rad, phase, dead = initial_state_arrays(
            params.replace(seed=int(s))
        )
        states.append(make_state(p_eff, pos, vel, rad, phase, dead, seed=int(s)))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def shard_batch(state: SimState, mesh: Mesh, axis: str = "data") -> SimState:
    """Lay the scene batch over the mesh's data axis; per-scene arrays are
    replicated-free (fully sharded on the leading dim)."""
    # every leaf — including step counters and keys — is per-scene along the
    # leading batch dim after make_batch_state, so all leaves shard on it
    # (the lockstep gating in engine.make_run_chunk_batched relies on the
    # per-scene counters advancing together)
    batch_spec = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, batch_spec), state)


def default_mesh(axis: str = "data") -> Mesh:
    devs = np.array(jax.devices())
    return Mesh(devs.reshape(-1), (axis,))


def _platform_is_tpu() -> bool:
    """Whether the compute platform is the TPU (or the axon relay to one).

    The packed strategy's measured crossover is TPU-only: on CPU its
    pallas table loop runs in interpret mode — orders of magnitude slower
    than the DENSE vmap batch it would replace — so AUTO must never pick
    it there.  Reads ``jax.config.jax_platforms`` first (no backend-init
    side effect, same rationale as engine._chunk_cache_key); only falls
    back to ``jax.default_backend()`` when the platform is auto-detected.
    """
    plats = jax.config.jax_platforms
    if plats:
        return plats.split(",")[0] in ("tpu", "axon")
    return jax.default_backend() in ("tpu", "axon")


def choose_sweep_strategy(
    params: SimParams, n_scenes: int, mesh: Mesh | None
) -> str:
    """Pick the sweep execution strategy: ``"sequential"`` (single-scene
    chunk runner looped over seeds) or ``"batched"`` (scenes vmapped into
    one stacked pytree).

    With a mesh the batch IS the parallelism axis — always batched.  On one
    device, batched wins at every measured scale EXCEPT the megakernel
    band (PALLAS, G=16 tables), where the vmapped span grid repeats
    per-scene kernel cost — see the measured crossover table in
    docs/RESULTS.md.  The env knob ``PBOT_SWEEP_STRATEGY`` forces either
    for A/B runs.
    """
    forced = os.environ.get("PBOT_SWEEP_STRATEGY", "")
    if forced in ("sequential", "batched", "packed"):
        if mesh is not None and forced != "batched":
            raise ValueError(
                f"PBOT_SWEEP_STRATEGY={forced} is incompatible with a "
                "device mesh (the scene batch is the sharding axis)"
            )
        return forced
    if mesh is not None:
        return "batched"
    if n_scenes <= 1:
        return "sequential"
    from ..config import ForceBackend
    from ..ops.megakernel import mega_eligible
    from .packed import packed_eligible

    # Scene-tiling (packed) wins exactly where BOTH single-device
    # strategies are floored by per-scene fixed costs: the DENSE and
    # megakernel bands (small scenes), with enough scenes to amortize the
    # isolation-forced table sparsity (measured crossover in
    # docs/RESULTS.md: 300x64 packed 35.2M vs batched 27.6M; 1000x16
    # 50.9M vs sequential 50.0M; but 300x32 = a 9600-bot union loses to
    # batched 31.5 vs 35.1, and 2000x16 — the regular-table band — loses
    # 57.6 vs 59.3).  The union threshold 12288 splits the measured
    # 9600-loss / 16000-win gap.  Packed always runs the PALLAS table
    # loop on the union, so AUTO only picks it on the TPU platform and
    # when the caller hasn't forced a different backend.
    small_scene = params.resolved_backend() == ForceBackend.DENSE or (
        params.resolved_backend() == ForceBackend.PALLAS
        and mega_eligible(params)
    )
    if (
        packed_eligible(params)
        and params.force_backend in (ForceBackend.AUTO, ForceBackend.PALLAS)
        and small_scene
        and n_scenes * params.n_cells >= 12288
        and _platform_is_tpu()
    ):
        return "packed"
    if (
        params.resolved_backend() == ForceBackend.PALLAS
        and mega_eligible(params)
    ):
        return "sequential"
    return "batched"


def _run_sweep_sequential(
    params: SimParams,
    seeds: Sequence[int],
    n_steps: int,
    record_every: int,
    seg: int,
):
    """Loop scenes through the SINGLE-scene chunk runner (compiled once,
    reused across seeds — shapes are seed-independent)."""
    run = make_run_chunk(params)
    n = params.n_cells
    finals = []
    all_records = []
    for s in seeds:
        p_eff, pos, vel, rad, phase, dead = initial_state_arrays(
            params.replace(seed=int(s))
        )
        state = make_state(p_eff, pos, vel, rad, phase, dead, seed=int(s))
        # centroids stay ON DEVICE until the end: a per-chunk device_get
        # costs a full relay round-trip (~24 ms) and serializes the chunk
        # pipeline; deferred fetches let chunks queue back-to-back
        recs = [jnp.mean(state.pos[:n, :], axis=0)]
        done = 0
        while done < n_steps:
            chunk = min(record_every, n_steps - done)
            state = run(state, chunk, seg > 0 and done % seg == 0)
            done += chunk
            recs.append(jnp.mean(state.pos[:n, :], axis=0))
        finals.append(state)
        all_records.append(recs)
    final = jax.tree.map(lambda *xs: jnp.stack(xs), *finals)
    # (n_records, n_scenes, 2) — same layout as the batched recorder; ONE
    # device_get on the whole record pytree is the only host sync of the
    # sweep (per-record np.asarray would pay the ~24 ms relay round-trip
    # once per record)
    return final, np.asarray(jax.device_get(all_records)).transpose(1, 0, 2)


def run_sweep(
    params: SimParams,
    seeds: Sequence[int],
    n_steps: int,
    mesh: Mesh | None = None,
    record_every: int | None = None,
    strategy: str | None = None,
):
    """Run ``len(seeds)`` scenes for ``n_steps``; returns
    (final_state, centroid_trajectories (n_records, n_scenes, 2)).

    ``record_every`` defaults to the scenario dump interval.  With a mesh,
    scenes are sharded across devices and XLA partitions the whole scan —
    no code change, no per-step collectives.  Without one, the execution
    strategy (sequential single-scene chunks vs on-chip vmap batch) is
    picked by the measured crossover — see ``choose_sweep_strategy``.
    """
    from ..config import ForceBackend
    from ..engine_table import gate_seg
    from ..models.placement import resolve_params

    # Nx == 0 -> config_size_x, exactly as Simulation resolves it — the
    # compiled actuation wave period must match single-scene runs
    params = resolve_params(params.validate())
    record_every = record_every or params.dump_steps
    seg = (
        gate_seg(params)
        if params.resolved_backend() == ForceBackend.PALLAS
        else 0
    )
    if strategy is None:
        strategy = choose_sweep_strategy(params, len(seeds), mesh)
    elif strategy not in ("sequential", "batched", "packed"):
        raise ValueError(f"unknown sweep strategy: {strategy!r}")
    elif strategy != "batched" and mesh is not None:
        # same incompatibility the env-knob path rejects: the scene batch
        # IS the sharding axis, so a sequential/packed run would silently
        # drop the requested multi-device sharding
        raise ValueError(
            f"strategy={strategy!r} is incompatible with a device mesh "
            "(the scene batch is the sharding axis)"
        )
    if strategy == "packed":
        from .packed import run_sweep_packed

        return run_sweep_packed(params, seeds, n_steps, record_every)
    if strategy == "sequential":
        return _run_sweep_sequential(params, seeds, n_steps, record_every, seg)

    state = make_batch_state(params, seeds)
    if mesh is not None:
        state = shard_batch(state, mesh)
    run = make_run_chunk_batched(params)

    n = params.n_cells
    records = []

    def centroid(s: SimState):
        return jnp.mean(s.pos[:, :n, :], axis=1)

    done = 0  # scenes start at step 0 and advance in lockstep
    # deferred host fetches: see _run_sweep_sequential
    records.append(centroid(state))
    while done < n_steps:
        chunk = min(record_every, n_steps - done)
        state = run(state, chunk, seg > 0 and done % seg == 0)
        done += chunk
        records.append(centroid(state))
    return state, np.stack(jax.device_get(records))


def sweep_summary(centroids: np.ndarray, params: SimParams):
    """Aggregate a sweep into mean/std distance-to-light trajectories."""
    light = np.array([params.light_x, params.light_y], dtype=np.float64)
    d = np.linalg.norm(centroids - light, axis=-1)  # (n_records, n_scenes)
    return {
        "distance_mean": d.mean(axis=1),
        "distance_std": d.std(axis=1),
        "centroid_mean": centroids.mean(axis=1),
    }
