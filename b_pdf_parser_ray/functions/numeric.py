"""Numeric helpers shared by query pipelines."""

from __future__ import annotations

import numpy as np


def sql_round(values, digits: int):
    """Round half AWAY from zero — SQL/DuckDB semantics.

    numpy/pandas ``round`` is half-to-even (banker's); every rounded float
    column that is compared against a SQL oracle must use this instead, or
    exact .5 ties (e.g. ratios with power-of-two denominators: 27/96 =
    0.28125) hash-mismatch.
    """
    arr = np.asarray(values, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
