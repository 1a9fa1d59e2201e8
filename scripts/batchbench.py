"""Dev throughput probe for BATCHED scenes on one chip.

Usage: python scripts/batchbench.py [n_bots] [batch] [steps_per_call] [n_calls]

Same measurement protocol as devbench.py (device_get sync, best-of-N
calls, seg-aligned chunks) but over a lockstep scene batch built with
parallel.sweep.make_batch_state — the aggregate number is
B * N * steps / wall, directly comparable to the single-scene probe.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 6000
CALLS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def _sync(state):
    return np.asarray(jax.device_get(state.step))


def main():
    from particlerobotsimulations_tpu import Config, SimParams
    from particlerobotsimulations_tpu.engine import make_run_chunk_batched
    from particlerobotsimulations_tpu.engine_table import gate_seg
    from particlerobotsimulations_tpu.parallel.sweep import make_batch_state

    params = SimParams(
        n_cells=N, n_dead=0, seed=7, config=Config.HEX,
        light_x=-20.0, light_y=0.0,
    )
    state = make_batch_state(params, seeds=list(range(3, 3 + B)))
    run = make_run_chunk_batched(params)
    seg = gate_seg(params.validate())
    aligned = seg > 0 and STEPS % seg == 0
    print(f"B={B} x {N} bots; gate segment {seg}, aligned: {aligned}")

    t0 = time.perf_counter()
    state = run(state, STEPS, aligned)
    _sync(state)
    print(f"warmup+compile: {time.perf_counter() - t0:.1f} s")

    best = float("inf")
    for i in range(CALLS):
        t0 = time.perf_counter()
        state = run(state, STEPS, aligned)
        _sync(state)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(
            f"call {i}: {dt * 1e3:.1f} ms -> {dt / STEPS / B * 1e6:.2f} "
            f"us/scene-step  ({B * N * STEPS / dt / 1e6:.1f}M aggregate)"
        )
    pos = np.asarray(jax.device_get(state.pos))[:, : params.n_cells]
    assert np.isfinite(pos).all()
    print(
        f"best: {best / STEPS / B * 1e6:.2f} us/scene-step = "
        f"{B * N * STEPS / best / 1e6:.1f}M aggregate particle-steps/s"
    )


if __name__ == "__main__":
    main()
