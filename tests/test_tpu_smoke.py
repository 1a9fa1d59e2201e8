"""Real-Mosaic smoke test (chip-guarded).

The suite runs on a forced CPU backend (conftest.py), so the production
Pallas kernels are only ever exercised in interpret mode there — Mosaic
layout/compile regressions would first surface in the official bench.
This test compiles and runs the PALLAS table loop (force kernel + the
incremental-rebuild compaction kernel) on the real chip in a clean
subprocess, and skips cleanly when no TPU is reachable or the chip is
busy (two processes must not share it)."""

import os
import subprocess
import sys

import pytest

_SMOKE = r"""
import jax, numpy as np
backend = jax.default_backend()
assert backend not in ("cpu",), f"NO_TPU backend={backend}"
from particlerobotsimulations_tpu import Config, ForceBackend, SimParams, Simulation
from particlerobotsimulations_tpu.engine import make_run_chunk

p = SimParams(n_cells=300, n_dead=0, seed=1, config=Config.HEX,
              force_backend=ForceBackend.PALLAS, grid_dim=16,
              light_x=-5.0, light_y=0.0)
sim = Simulation(p)
run = make_run_chunk(p)
out = run(sim.state, 8)  # crosses a slot rebuild: both kernels compile
pos = np.asarray(jax.device_get(out.pos))[:p.n_cells]
assert np.isfinite(pos).all(), "non-finite positions from real-Mosaic step"
print("MOSAIC_SMOKE_OK")
"""


def test_real_mosaic_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin register
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _SMOKE],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,  # remote Mosaic compiles take 10-60 s each
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU smoke timed out (chip busy or compile relay slow)")
    if "MOSAIC_SMOKE_OK" in proc.stdout:
        return
    if "NO_TPU" in proc.stderr + proc.stdout:
        pytest.skip("no TPU backend available")
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-5:]
        pytest.skip("TPU unavailable/busy: " + " | ".join(tail))
    raise AssertionError(f"smoke subprocess odd result: {proc.stdout!r}")
