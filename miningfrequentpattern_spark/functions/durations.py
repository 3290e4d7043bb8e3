"""Shared duration-literal parsing.

One grammar for every operator that takes a human duration string
('7 days', '10 minutes'): pit_trailing_features and ttl_dedup in
operators/timeseries.py and the ttl_dedup_stream twin in
streaming/stateful.py previously each carried an identical copy of
this regex — a batch operator and its stream twin must accept the
exact same inputs, so the grammar lives in exactly one place.
"""

from __future__ import annotations

import re

_DURATION_RE = re.compile(r"(\d+)\s*(second|minute|hour|day)s?")
_MULT = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def duration_us(text: str, *, what: str = "duration") -> int:
    """Parse '<N> (second|minute|hour|day)[s]' into a duration length
    in microseconds (relative, never an epoch timestamp).

    Raises ValueError naming `what` (the caller's parameter name) so
    error messages stay operator-specific.
    """
    m = _DURATION_RE.fullmatch(text.strip())
    if not m:
        raise ValueError(
            f"{what} must look like '7 days'/'10 minutes', got {text!r}"
        )
    return int(m.group(1)) * _MULT[m.group(2)] * 1_000_000
