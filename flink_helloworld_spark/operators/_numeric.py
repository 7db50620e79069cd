"""NumPy rounding helpers that match the engine's oracle tie rule.

``np.round`` is round-half-to-EVEN (banker's rounding), while both
DuckDB's ``round()`` and Spark's ``F.round`` are round-half-AWAY-from-
zero (HALF_UP). The BLAS kernels round scores/distances before
threshold tests and packed-argmin comparisons, so a product landing
exactly on an N.5 double would flip an assignment between engine and
oracle under banker's rounding. Every vectorized kernel routes through
these helpers to keep the "oracle-exact" rounding-parity contract.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray, dp: int) -> np.ndarray:
    """Element-wise round to ``dp`` decimals, ties away from zero —
    the DuckDB ``round()`` / Spark ``F.round`` rule. NaNs pass through."""
    s = 10.0**dp
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def pack_scaled_int(x: np.ndarray, scale: float = 1_000_000.0) -> np.ndarray:
    """``round(x * scale)`` as int64 with ties away from zero, for the
    integer-packed argmin trick. ``x`` must be non-negative (squared
    distances); floor(x*scale + 0.5) is then exactly half-up."""
    return np.floor(x * scale + 0.5).astype(np.int64)
