"""Half-up rounding with exact SQL parity.

``round_half_up(x, d)`` == DuckDB's ``floor(x * 10^d + 0.501) / 10^d``
operation-for-operation (same IEEE doubles in, same doubles out), so a
Ray result and a DuckDB oracle hash-match bit-exactly.  pandas/numpy
``round`` is half-to-even — it disagrees with SQL ``round`` whenever the
dropped digits are exactly 5 (e.g. 1/128 at 6 decimals), which is why
the pipelines never use it for oracle-checked columns.

The extra 1e-3 in the scaled domain makes ties robust to summation
order: monetary inputs are exact multiples of 1e-4, so a grouped SUM
can land *exactly* on a .xx5 boundary — there, Ray's partial-sum order
and the oracle's scan order disagree by ~1e-8 and a bare +0.5 floors
to different cents (observed on lineitem monthly revenue). Shifting the
boundary into the open gap between representable data values (steps
≥ 0.01 in the scaled domain ≫ 1e-3 ≫ FP noise) removes the knife edge
on both sides identically.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, digits: int = 2):
    """Vectorized half-up rounding; scalars in → float out.

    Deviation window (deliberate, see module docstring): any value
    whose scaled fraction lies in [0.499, 0.501) also rounds UP — the
    +0.001 tie-robustness shift. Both compare sides (this function and
    ``sql_round``) shift identically, so the pair stays bit-exact; do
    NOT reuse this where true unbiased half-up semantics matter."""
    m = 10.0 ** digits
    r = np.floor(np.asarray(x, dtype=np.float64) * m + 0.501) / m
    if np.ndim(r) == 0:
        return float(r)
    return r


def sql_round(expr: str, digits: int = 2) -> str:
    """The DuckDB expression string equivalent to ``round_half_up``."""
    m = 10 ** digits
    return f"floor(({expr}) * {m} + 0.501) / {m}"
