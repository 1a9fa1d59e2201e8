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
        python scripts/parity_report.py --from-json docs/parity/parity.json
        (recompute anchors/table/plots from saved measurements — valid
        whenever the intervening engine changes are trajectory-identical
        at the scenario scales, e.g. bitwise-proved kernel diets)
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
    ap.add_argument("--from-json", default=None, metavar="PATH",
                    help="recompute anchors/table/plots from a saved "
                         "parity.json instead of re-running the sims")
    args = ap.parse_args()
    seeds = list(range(args.seeds))
    scale = 0.1 if args.quick else 1.0
    os.makedirs(args.out, exist_ok=True)

    def cfg(name):
        return load_cfg(os.path.join(EXAMPLES, name))

    if args.from_json:
        with open(args.from_json) as f:
            results = json.load(f)
        _finish(results, cfg("example.cfg"), args)
        return

    results = {}

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

    _finish(results, cfg("example.cfg"), args)


def _finish(results, p, args):
    results["anchors"] = _anchors(results, p)
    for a in results["anchors"].values():
        print(f"anchor {a['name']}: measured {a['measured']:.3f} "
              f"{a['unit']} vs expected {a['expected']:.2f} ± {a['tol']:.2f} "
              f"-> {a['verdict']}", flush=True)

    with open(os.path.join(args.out, "parity.json"), "w") as f:
        json.dump(results, f, indent=2)

    _plots(results, args.out)
    _markdown(results, args.out)
    print(f"written: {args.out}/parity.json, robustness.png, table.md")
    failed = [a["name"] for a in results["anchors"].values()
              if a["verdict"] != "PASS"]
    if failed and not args.quick:
        raise SystemExit(f"parity anchors FAILED: {failed}")


def _anchors(results, p):
    """Numeric paper-unit anchors (VERDICT r3 #6) with explicit unit
    conversions and stated tolerances.

    Units: the simulation's length unit is the metre — the reference's
    radius constants (min_radius 0.0775, max_radius 0.1175,
    /root/reference/main.cpp defaults) are exactly the Nature 2019 robot's
    15.5 cm contracted / 23.5 cm expanded diameter, so "bot diameter" =
    2*max_radius = 0.235 m (expanded, the paper's size reference).

    Anchor provenance (the paper's figures are not retrievable in this
    zero-egress environment; each anchor states what it is anchored to):

    * robustness_20pct_dead — the paper QUANTIFIES this one in prose: the
      swarm sustains locomotion with 20% of units failed at roughly half
      speed (Nature 2019 abstract + fig. 4 protocol).  Expected 0.5
      normalized speed, tolerance ±0.25 (the claim is "approximately
      half"; our measured cross-round band is 0.40-0.52).
    * phototaxis_diam_per_min — the paper prints no directly comparable
      digit for the 300-bot simulated scenario, so the expected value is
      this framework's established cross-round measurement (5.0e-4 m/s
      over rounds 2-5, seed std 2-3e-5) converted to paper units; the
      anchor freezes it as a ±3-sigma regression band in diameters/min.
    * transport_diam_per_hour — payload transport rate (paper fig. 3
      protocol: an inert, heavy, oversized disc carried toward the light)
      in diameters/hour.  The paper prints no digit retrievable here, so
      the band is the cross-round measurement (payload dx -3.21 ± 0.50 u
      round 3, -3.45 ± 0.57 u rounds 4-5, over 12000 s) in paper units —
      ±3 sigma of the seed spread; direction (toward the light) is part
      of the anchor (a positive measured value).
    * gap_transit_fraction — fraction of the 1000-bot swarm past the wall
      line at the end of example_gap.cfg (the supplementary's gap-transit
      completion observable).  The paper claims the swarm squeezes
      through a 2-unit gap; the numeric band is the cross-round
      measurement 0.789-0.803 (r2 0.803, r3 0.796, r4 0.803, r5 0.789)
      with a ±3-sigma-of-seed-spread tolerance.
    """
    diam = 2.0 * p.max_radius  # 0.235 m expanded, the paper's size unit
    ph_speed = results["phototaxis"]["approach_speed_mean"]  # m/s
    ph_dpm = ph_speed * 60.0 / diam
    rob20 = results["robustness"]["normalized_speed"][2]
    tr = results["transport"]
    tr_hours = tr["sim_seconds"] / 3600.0
    # payload moves toward the light in -x: positive rate = toward light
    tr_dph = -tr["payload_dx_mean"] / diam / tr_hours
    gap_frac = results["gap"]["frac_past_wall_mean"]

    def verdict(measured, expected, tol):
        return "PASS" if abs(measured - expected) <= tol else "FAIL"

    anchors = {
        "phototaxis_diam_per_min": {
            "name": "phototaxis_diam_per_min",
            "measured": float(ph_dpm),
            "unit": "diameters/min",
            "expected": 0.128,  # 5.02e-4 m/s * 60 / 0.235 m
            "tol": 0.02,  # ±3 sigma of the seed spread (2.7e-5 m/s)
            "conversion": "speed[m/s] * 60 / (2*max_radius = 0.235 m)",
            "anchored_to": "cross-round measurement band (regression "
                           "anchor in paper units; see docstring)",
        },
        "robustness_20pct_dead": {
            "name": "robustness_20pct_dead",
            "measured": float(rob20),
            "unit": "normalized speed",
            "expected": 0.5,
            "tol": 0.25,
            "conversion": "approach_speed(20% dead) / approach_speed(0%)",
            "anchored_to": "paper: locomotion sustained at ~half speed "
                           "with 20% of units failed (abstract + fig. 4)",
        },
        "transport_diam_per_hour": {
            "name": "transport_diam_per_hour",
            "measured": float(tr_dph),
            "unit": "diameters/hour toward light",
            # cross-round band: dx -3.21 to -3.45 u over 12000 s
            # = 4.10-4.40 diam/h; center 4.25, seed sigma ~0.70 diam/h
            "expected": 4.25,
            "tol": 2.10,  # ±3 sigma of the seed spread (0.55 u -> 0.70)
            "conversion": "-payload_dx[m] / (0.235 m) / (sim_s / 3600)",
            "anchored_to": "paper fig. 3 payload-transport protocol; "
                           "numeric band is the cross-round measurement "
                           "(see docstring) — direction included (a "
                           "negative rate = away from light FAILS)",
        },
        "gap_transit_fraction": {
            "name": "gap_transit_fraction",
            "measured": float(gap_frac),
            "unit": "fraction past wall",
            "expected": 0.79,  # cross-round: 0.789-0.803 (r2-r5)
            "tol": 0.09,  # ±3 sigma of the per-seed spread (~0.03)
            "conversion": "mean over bots of (x < wall plane) at max_time",
            "anchored_to": "paper supplementary gap-transit completion "
                           "(swarm squeezes through a 2-unit gap); "
                           "numeric band is the cross-round measurement",
        },
    }
    for a in anchors.values():
        a["verdict"] = verdict(a["measured"], a["expected"], a["tol"])
    return anchors


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
    for a in results.get("anchors", {}).values():
        lines.append(
            f"| ANCHOR {a['name']} | {a['measured']:.3f} {a['unit']} "
            f"({a['conversion']}) | {a['expected']:.2f} ± {a['tol']:.2f} "
            f"— {a['anchored_to']} | {a['verdict']} |"
        )
    with open(os.path.join(out, "table.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
