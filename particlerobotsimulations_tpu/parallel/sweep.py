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

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimParams
from ..engine import make_run_chunk_batched
from ..models.placement import initial_state_arrays
from ..state import SimState, make_state


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


def run_sweep(
    params: SimParams,
    seeds: Sequence[int],
    n_steps: int,
    mesh: Mesh | None = None,
    record_every: int | None = None,
):
    """Run ``len(seeds)`` scenes for ``n_steps``; returns
    (final_state, centroid_trajectories (n_records, n_scenes, 2)).

    ``record_every`` defaults to the scenario dump interval.  With a mesh,
    scenes are sharded across devices and XLA partitions the whole scan —
    no code change, no per-step collectives.
    """
    from ..config import ForceBackend
    from ..engine_table import gate_seg
    from ..models.placement import resolve_params

    # Nx == 0 -> config_size_x, exactly as Simulation resolves it — the
    # compiled actuation wave period must match single-scene runs
    params = resolve_params(params.validate())
    record_every = record_every or params.dump_steps
    state = make_batch_state(params, seeds)
    if mesh is not None:
        state = shard_batch(state, mesh)
    run = make_run_chunk_batched(params)
    seg = (
        gate_seg(params)
        if params.resolved_backend() == ForceBackend.PALLAS
        else 0
    )

    n = params.n_cells
    records = []

    def centroid(s: SimState):
        return jnp.mean(s.pos[:, :n, :], axis=1)

    done = 0  # scenes start at step 0 and advance in lockstep
    records.append(jax.device_get(centroid(state)))
    while done < n_steps:
        chunk = min(record_every, n_steps - done)
        state = run(state, chunk, seg > 0 and done % seg == 0)
        done += chunk
        records.append(jax.device_get(centroid(state)))
    return state, np.stack(records)


def sweep_summary(centroids: np.ndarray, params: SimParams):
    """Aggregate a sweep into mean/std distance-to-light trajectories."""
    light = np.array([params.light_x, params.light_y], dtype=np.float64)
    d = np.linalg.norm(centroids - light, axis=-1)  # (n_records, n_scenes)
    return {
        "distance_mean": d.mean(axis=1),
        "distance_std": d.std(axis=1),
        "centroid_mean": centroids.mean(axis=1),
    }
