"""Quantitative paper-parity report: seed-distribution sweeps of all five
reference scenarios.

The CUDA reference publishes no numbers and ships no test artifacts beyond
three eyeball PNGs per scenario (/root/reference/img/); the Nature 2019
paper's claims are behavioral (phototaxis, graceful degradation with dead
cells, obstacle/gap traversal, payload transport).  This script turns the
parity evidence quantitative: every scenario runs over a seed batch and is
summarized as distributions (mean +/- std), written to docs/parity/ as
JSON + plots + a markdown table for docs/RESULTS.md.

Usage:  python scripts/parity_report.py [--seeds 8] [--quick]
        (--quick shortens horizons ~10x for a smoke run)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particlerobotsimulations_tpu import load_cfg
from particlerobotsimulations_tpu.models.experiments import (
    dead_cell_robustness,
    gap_transit,
    payload_transport,
    phototaxis_speed,
)

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="docs/parity")
    args = ap.parse_args()
    seeds = list(range(args.seeds))
    scale = 0.1 if args.quick else 1.0
    os.makedirs(args.out, exist_ok=True)

    results = {}

    def cfg(name):
        return load_cfg(os.path.join(EXAMPLES, name))

    # 1. phototaxis (example.cfg, 300 bots, 7200 s)
    p = cfg("example.cfg")
    r = phototaxis_speed(p, seeds, sim_seconds=p.max_time * scale)
    per_seed = _per_seed_speed(r, p)
    results["phototaxis"] = {
        "n_cells": p.n_cells,
        "sim_seconds": p.max_time * scale,
        "approach_speed_mean": float(np.mean(per_seed)),
        "approach_speed_std": float(np.std(per_seed)),
        "per_seed_speed": per_seed.tolist(),
        "distance_start": float(r["distance_mean"][0]),
        "distance_end": float(r["distance_mean"][-1]),
    }
    print("phototaxis:", results["phototaxis"], flush=True)

    # 2. dead-cell robustness (example_dead_cells.cfg, 100 bots)
    p = cfg("example_dead_cells.cfg").replace(n_dead=0)
    fractions = [0.0, 0.1, 0.2, 0.3, 0.4]
    sim_s = 1200.0 if not args.quick else 240.0
    rob = dead_cell_robustness(p, fractions, seeds, sim_seconds=sim_s)
    speeds = np.array(rob["approach_speed"])
    norm = speeds / speeds[0] if speeds[0] else speeds
    results["robustness"] = {
        "n_cells": p.n_cells,
        "sim_seconds": sim_s,
        "fractions": fractions,
        "approach_speed": speeds.tolist(),
        "normalized_speed": norm.tolist(),
    }
    print("robustness:", results["robustness"], flush=True)

    # 3. obstacle field (example_obstacle.cfg, 500 bots)
    p = cfg("example_obstacle.cfg")
    r = phototaxis_speed(p, seeds, sim_seconds=p.max_time * scale)
    per_seed = _per_seed_speed(r, p)
    results["obstacle"] = {
        "n_cells": p.n_cells,
        "sim_seconds": p.max_time * scale,
        "approach_speed_mean": float(np.mean(per_seed)),
        "approach_speed_std": float(np.std(per_seed)),
        "distance_start": float(r["distance_mean"][0]),
        "distance_end": float(r["distance_mean"][-1]),
    }
    print("obstacle:", results["obstacle"], flush=True)

    # 4. gap traversal (example_gap.cfg, 1000 bots)
    p = cfg("example_gap.cfg")
    r = gap_transit(p, seeds, sim_seconds=p.max_time * scale)
    results["gap"] = {
        "n_cells": p.n_cells,
        "sim_seconds": p.max_time * scale,
        "frac_past_wall_mean": r["frac_past_wall_mean"],
        "frac_past_wall_per_seed": r["frac_past_wall"].tolist(),
        "distance_start": float(r["distance_mean"][0]),
        "distance_end": float(r["distance_mean"][-1]),
    }
    print("gap:", results["gap"], flush=True)

    # 5. payload transport (example_object_transport.cfg, 200+1 bots)
    p = cfg("example_object_transport.cfg")
    r = payload_transport(p, seeds, sim_seconds=p.max_time * scale)
    results["transport"] = {
        "n_cells": p.n_cells,
        "sim_seconds": p.max_time * scale,
        "payload_dx_mean": float(r["payload_displacement"][:, 0].mean()),
        "payload_dx_std": float(r["payload_displacement"][:, 0].std()),
        "payload_dx_per_seed": r["payload_displacement"][:, 0].tolist(),
        "moved_toward_light_frac": float(
            (r["payload_displacement"][:, 0] < 0).mean()
        ),
    }
    print("transport:", results["transport"], flush=True)

    with open(os.path.join(args.out, "parity.json"), "w") as f:
        json.dump(results, f, indent=2)

    _plots(results, args.out)
    _markdown(results, args.out)
    print(f"written: {args.out}/parity.json, robustness.png, table.md")


def _per_seed_speed(r, p):
    cents = r["centroids"]  # (n_rec, n_scenes, 2)
    light = np.array([p.light_x, p.light_y])
    d = np.linalg.norm(cents - light, axis=-1)
    t_total = r["time_s"][-1] if r["time_s"][-1] else 1.0
    return (d[0] - d[-1]) / t_total


def _plots(results, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rob = results["robustness"]
    fig, ax = plt.subplots(figsize=(5, 3.5), dpi=120)
    ax.plot(rob["fractions"], rob["normalized_speed"], "o-")
    ax.set_xlabel("dead-cell fraction")
    ax.set_ylabel("normalized approach speed")
    ax.set_title("Dead-cell robustness (paper fig. 4 protocol)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "robustness.png"))
    plt.close(fig)


def _markdown(results, out):
    ph, rob = results["phototaxis"], results["robustness"]
    gap, tr, ob = results["gap"], results["transport"], results["obstacle"]
    lines = [
        "| scenario | seeds metric (this framework) | paper / reference expectation | verdict |",
        "|---|---|---|---|",
        (
            f"| phototaxis (300 bots) | approach speed "
            f"{ph['approach_speed_mean']:.2e} ± {ph['approach_speed_std']:.1e} u/s; "
            f"dist {ph['distance_start']:.2f} → {ph['distance_end']:.2f} | "
            "directed locomotion toward the light (paper's headline result) | "
            f"{'PASS' if ph['approach_speed_mean'] > 0 else 'FAIL'} |"
        ),
        (
            f"| dead cells (100 bots) | normalized speed at 0/0.1/0.2/0.3/0.4 dead: "
            f"{', '.join(f'{v:.2f}' for v in rob['normalized_speed'])} | "
            "graceful degradation; still functional at 20% dead (paper fig. 4) | "
            f"{'PASS' if rob['normalized_speed'][2] > 0.2 else 'FAIL'} |"
        ),
        (
            f"| obstacle field (500 bots) | approach speed "
            f"{ob['approach_speed_mean']:.2e} ± {ob['approach_speed_std']:.1e} u/s; "
            f"dist {ob['distance_start']:.2f} → {ob['distance_end']:.2f} | "
            "navigates between circular obstacles toward the light | "
            f"{'PASS' if ob['distance_end'] < ob['distance_start'] else 'FAIL'} |"
        ),
        (
            f"| wall gap (1000 bots) | {gap['frac_past_wall_mean']:.0%} of swarm past "
            f"the wall (per-seed: {', '.join(f'{v:.0%}' for v in gap['frac_past_wall_per_seed'])}) | "
            "swarm squeezes through a 2-unit gap (paper supplementary) | "
            f"{'PASS' if gap['frac_past_wall_mean'] > 0.5 else 'FAIL'} |"
        ),
        (
            f"| payload transport (200+1) | payload dx "
            f"{tr['payload_dx_mean']:.2f} ± {tr['payload_dx_std']:.2f} u toward light; "
            f"{tr['moved_toward_light_frac']:.0%} of seeds toward light | "
            "swarm transports an inert high-mass object (paper fig. 3) | "
            f"{'PASS' if tr['payload_dx_mean'] < 0 else 'FAIL'} |"
        ),
    ]
    with open(os.path.join(out, "table.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
