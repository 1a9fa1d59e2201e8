"""Full-fidelity checkpoint/resume.

The reference's only resume path is the CSV tail, which silently drops phase
and dead state (particlebot.cpp:369-411 restores pos/vel/rad only) — a
fidelity gap SURVEY.md flags.  This module snapshots the *entire* SimState
(including phase, dead flags, force-magnitude carry, centroid ring and PRNG
key) as a compressed ``.npz`` plus the params needed to validate shape
compatibility on restore.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from ..config import Config, Control, ForceBackend, SimParams
from ..state import SimState

FORMAT_VERSION = 1


def _params_json(params: SimParams) -> str:
    d = dataclasses.asdict(params)
    for k, v in d.items():
        if isinstance(v, (Config, Control, ForceBackend)):
            d[k] = int(v)
    return json.dumps(d)


def _params_from_json(s: str) -> SimParams:
    d = json.loads(s)
    d["config"] = Config(d["config"])
    d["control"] = Control(d["control"])
    d["force_backend"] = ForceBackend(d["force_backend"])
    d["rect_obstacles"] = tuple(tuple(o) for o in d["rect_obstacles"])
    d["circle_obstacles"] = tuple(tuple(o) for o in d["circle_obstacles"])
    return SimParams(**d)


def save_checkpoint(path: str, params: SimParams, state: SimState) -> None:
    """Atomically snapshot ``state`` to exactly ``path``.

    Writes to a temp file in the same directory and ``os.replace``s it so
    a crash mid-save (watchdog kill, OOM) can never destroy the previous
    good checkpoint — crash recovery is the feature's whole purpose.  The
    file object keeps ``np.savez_compressed`` from appending ``.npz`` to
    the name, so ``load_checkpoint(path)``/``os.path.exists(path)`` (the
    CLI resume probe) always see the file the caller asked for."""
    import os

    host = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(
            fh,
            format_version=FORMAT_VERSION,
            params_json=_params_json(params),
            pos=host.pos,
            vel=host.vel,
            rad=host.rad,
            phase=host.phase,
            dead=host.dead,
            abs_force_a=host.abs_force_a,
            abs_force_r=host.abs_force_r,
            step=np.asarray(host.step),
            key_data=np.asarray(jax.random.key_data(state.key)),
            centroid_ring=host.centroid_ring,
        )
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (params, state)."""
    with np.load(path, allow_pickle=False) as z:
        if int(z["format_version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['format_version']}")
        params = _params_from_json(str(z["params_json"]))
        import jax.numpy as jnp

        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
        state = SimState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            rad=jnp.asarray(z["rad"]),
            phase=jnp.asarray(z["phase"]),
            dead=jnp.asarray(z["dead"]),
            abs_force_a=jnp.asarray(z["abs_force_a"]),
            abs_force_r=jnp.asarray(z["abs_force_r"]),
            step=jnp.int32(z["step"]),
            key=key,
            centroid_ring=jnp.asarray(z["centroid_ring"]),
        )
    return params, state
