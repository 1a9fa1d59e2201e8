"""Shared ``key=value`` SimParams override parsing for the dev scripts.

Coerces from each field's current value: bools accept 1/0/true/false,
enums accept member NAMES (``config=HEX``), everything else goes through
the field type's constructor (ints, floats, strings).
"""

from __future__ import annotations

import enum


def parse_overrides(params, pairs: dict):
    """Return ``params.replace(**typed)`` for string-valued ``pairs``."""
    typed = {}
    for k, v in pairs.items():
        cur = getattr(params, k)
        if isinstance(cur, bool):
            typed[k] = v.lower() in ("1", "true")
        elif isinstance(cur, enum.Enum):
            typed[k] = type(cur)[v.upper()]
        else:
            typed[k] = type(cur)(v)
    if typed:
        print(f"overrides: {typed}")
    return params.replace(**typed)
