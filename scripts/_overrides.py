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
            # strict: a typo ('yes', 'True ', 'on') must not silently flip
            # a physics knob to False in a measurement script
            s = v.strip().lower()
            if s in ("1", "true"):
                typed[k] = True
            elif s in ("0", "false"):
                typed[k] = False
            else:
                raise ValueError(
                    f"bool override {k}={v!r}: use 1/0/true/false"
                )
        elif isinstance(cur, enum.Enum):
            typed[k] = type(cur)[v.upper()]
        else:
            typed[k] = type(cur)(v)
    if typed:
        print(f"overrides: {typed}")
    return params.replace(**typed)
