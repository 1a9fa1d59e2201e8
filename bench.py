"""Throughput benchmark: particle-steps/sec at 10k bots.

Target (BASELINE.json north star): >= 1e8 particle-steps/sec at 10k bots on a
TPU v5e-8.  The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against the 1e8 target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_BOTS = 10_000
STEPS = 60_000  # long chunks amortize the ~24ms relay dispatch latency
# (60000 steps ~ 6.5 s/call at current speed — far under the ~2 min
# single-call watchdog, and dispatch becomes <0.4% of the measurement;
# 60000 is also a multiple of the 200-step gate segment, so every chunk
# enters the amortized-cond fast path)
TARGET = 1.0e8


def _sync(state):
    # NOTE: jax.block_until_ready does not reliably block on the axon relay
    # backend — force a device->host transfer as the sync point.
    return np.asarray(jax.device_get(state.step))


def build():
    from particlerobotsimulations_tpu import Config, SimParams
    from particlerobotsimulations_tpu.engine import make_run_chunk_batched
    from particlerobotsimulations_tpu.parallel.sweep import (
        default_mesh,
        make_batch_state,
        shard_batch,
    )

    params = SimParams(
        n_cells=N_BOTS,
        n_dead=0,
        seed=7,
        config=Config.HEX,  # instant deterministic packed blob at any N
        light_x=-20.0,
        light_y=0.0,
    )
    n_dev = len(jax.devices())
    batch = max(1, n_dev)  # one 10k-bot scene per device
    if n_dev == 1:
        # single chip: skip the vmap wrapper (measured ~6% overhead at B=1)
        from particlerobotsimulations_tpu import Simulation
        from particlerobotsimulations_tpu.engine import make_run_chunk

        sim = Simulation(params)
        return params, sim.state, make_run_chunk(params), 1
    state = make_batch_state(params, seeds=list(range(batch)))
    state = shard_batch(state, default_mesh())
    run = make_run_chunk_batched(params)
    return params, state, run, batch


def main():
    params, state, run, batch = build()

    # every chunk starts on a step that is a multiple of STEPS (itself a
    # multiple of the 200-step gate segment) -> amortized-cond fast path
    # warmup / compile (same scan length as the timed runs).  The adaptive
    # rebuild cadence (single-chip default at >= 4k bots) needs three
    # warmup chunks to settle: chunk 1 probes the HEX relaxation transient
    # (withholds K=8), chunk 2 measures steady state, chunk 3 compiles and
    # runs the certified K=8 program — so the timed calls measure the
    # steady certified cadence, which is what production runs at.
    warmups = 3 if (batch == 1 and params.validate().adaptive_rebuild()) else 1
    for _ in range(warmups):
        state = run(state, STEPS, True)
        _sync(state)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state, STEPS, True)
        _sync(state)
        best = min(best, time.perf_counter() - t0)

    # sanity: simulation must remain healthy or the number is meaningless
    pos = np.asarray(jax.device_get(state.pos))[..., : params.n_cells, :]
    assert np.isfinite(pos).all(), "simulation blew up during bench"

    throughput = N_BOTS * STEPS * batch / best
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec_10k_bots",
                "value": throughput,
                "unit": "particle-steps/s",
                "vs_baseline": throughput / TARGET,
            }
        )
    )


if __name__ == "__main__":
    main()
