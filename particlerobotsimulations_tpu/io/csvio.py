"""CSV metrics dump + resume, byte-compatible with the reference schema.

Re-derivation of ``dumpParticlebot`` / ``loadFromFile``
(/root/reference/particlebot.cpp:303-411):

* header: ``Seed, <seed>`` then ``Time,`` + (testing=1 only) per-bot
  ``Particlebot_i_xpos, Particlebot_i_ypos,`` / ``..._xvel, ..._yvel,`` /
  ``..._rad,`` columns + ``Centroid X, Centroid Y, Distance``
* one row per ``dump_interval`` sim-seconds: time, optional full state,
  centroid x/y and distance to the light (each ``%f``, 6 decimals)
* resume parses the last complete row (the reference seeks to the
  second-to-last newline) and restores pos/vel/rad + time — testing=1 format
  required, exactly like the reference.
"""

from __future__ import annotations

import io
from typing import TextIO

import numpy as np

from ..config import SimParams


def _f(x: float) -> str:
    return f"{float(x):f}"  # printf %f: 6 decimals


def header_lines(params: SimParams) -> str:
    out = io.StringIO()
    out.write(f"Seed, {params.seed}\n")
    out.write("Time,")
    if params.testing:
        n = params.n_cells
        for i in range(n):
            out.write(f"Particlebot_{i}_xpos, Particlebot_{i}_ypos,")
        for i in range(n):
            out.write(f"Particlebot_{i}_xvel, Particlebot_{i}_yvel,")
        for i in range(n):
            out.write(f"Particlebot_{i}_rad,")
    out.write("Centroid X, Centroid Y, Distance")
    out.write("\n")
    return out.getvalue()


def row_line(
    params: SimParams,
    time: float,
    pos: np.ndarray,   # (n, 2) — unpadded
    vel: np.ndarray,   # (n, 2)
    rad: np.ndarray,   # (n,)
) -> str:
    n = params.n_cells
    out = io.StringIO()
    out.write(f"{_f(time)},")
    if params.testing:
        for i in range(n):
            out.write(f"{_f(pos[i, 0])}, {_f(pos[i, 1])},")
        for i in range(n):
            out.write(f"{_f(vel[i, 0])}, {_f(vel[i, 1])},")
        for i in range(n):
            out.write(f"{_f(rad[i])},")
    cx = float(pos[:n, 0].mean(dtype=np.float64))
    cy = float(pos[:n, 1].mean(dtype=np.float64))
    dist = float(np.hypot(cx - params.light_x, cy - params.light_y))
    out.write(f"{_f(cx)}, {_f(cy)}, {_f(dist)},")
    out.write("\n")
    return out.getvalue()


class CsvDumper:
    """Streams reference-format rows; also mirrors centroid to stdout like
    the reference's printf (particlebot.cpp:366)."""

    def __init__(self, params: SimParams, fp: TextIO, echo: bool = True):
        self.params = params
        self.fp = fp
        self.echo = echo
        self._wrote_header = False

    def dump(self, time: float, pos: np.ndarray, vel: np.ndarray, rad: np.ndarray):
        if not self._wrote_header:
            self.fp.write(header_lines(self.params))
            self._wrote_header = True
        self.fp.write(row_line(self.params, time, pos, vel, rad))
        self.fp.flush()
        if self.echo:
            n = self.params.n_cells
            cx = float(pos[:n, 0].mean(dtype=np.float64))
            cy = float(pos[:n, 1].mean(dtype=np.float64))
            print(f"{_f(time)} {_f(cx)} {_f(cy)} ")


def load_last_row(params: SimParams, path: str):
    """Parse the last complete CSV row -> (time, pos, vel, rad).

    Mirrors loadFromFile (particlebot.cpp:369-411); requires testing=1
    format.  Returns None if the file has no data rows.
    """
    with open(path, "r", encoding="utf-8") as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    # drop header lines (Seed + column names)
    data = [ln for ln in lines if not ln.startswith(("Seed", "Time"))]
    if not data:
        return None
    if not params.testing:
        raise ValueError("resume requires testing=1 CSV format")
    n = params.n_cells
    expected = 1 + (4 * n + n if params.testing else 0) + 3

    def parse(row):
        try:
            vals = [float(tok) for tok in row.split(",") if tok.strip()]
        except ValueError:
            return None
        return vals if len(vals) == expected else None

    # a killed process / full disk can truncate the final row mid-write:
    # fall back to the previous complete row, like the reference's
    # second-to-last-newline seek (particlebot.cpp:371-389)
    vals = parse(data[-1])
    if vals is None and len(data) > 1:
        vals = parse(data[-2])
    if vals is None:
        raise ValueError(
            f"no complete CSV row with {expected} fields in the last two "
            "rows (resume requires testing=1 dumps)"
        )
    t = vals[0]
    k = 1
    pos = np.array(vals[k : k + 2 * n], dtype=np.float32).reshape(n, 2)
    k += 2 * n
    vel = np.array(vals[k : k + 2 * n], dtype=np.float32).reshape(n, 2)
    k += 2 * n
    rad = np.array(vals[k : k + n], dtype=np.float32)
    return t, pos, vel, rad
