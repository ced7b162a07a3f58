"""Layout-aware reading order: column detection + y/x coordinate sort.

The north rule names this step explicitly — "layout-aware text
reconstruction (column detection, reading-order sort via y/x coordinate
clustering)".  In the reference it is latent inside the extraction
backends (PyMuPDF et al. emit spans already linearized y-desc/x-asc;
SURVEY.md §2 O4) and the engine's canonical input carries the result as
the span ``offset``.  This stage makes the technique an explicit,
testable engine kernel for sources that deliver POSITIONED spans
(x, y page coordinates) without a reading order — the raw shape one gets
from a PDF content stream before linearization.

Algorithm (classic x-projection gap clustering):

1. **Column detection** — sort a page's span x-positions; every adjacent
   gap ≥ ``min_gap`` (fraction of page width) is a column boundary, so k
   columns fall out of one pass (no k chosen a priori).  A page whose x
   spread never jumps stays single-column.
2. **Reading order** — sort (column, −y, x): columns left-to-right, and
   top-down then left-to-right inside a column (PDF y grows upward).

Everything is vectorized across ALL documents in a batch: two lexsorts,
one adjacent-diff, one cumsum — no per-document Python.  The stage is a
pure per-batch transform (each row carries a whole document's spans), so
it runs embarrassingly parallel under ``map_batches`` with no shuffle —
at 10^12 documents the cost is one streaming pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: default column-boundary threshold: a horizontal whitespace gap wider
#: than 15% of the page width separates columns (two-column statements
#: sit near 50%; intra-column x jitter stays well under 10%)
MIN_COLUMN_GAP = 0.15


def reading_order_flat(
    doc_idx: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    min_gap: float = MIN_COLUMN_GAP,
):
    """Assign (column, offset) to positioned spans, vectorized.

    Inputs are parallel arrays over a batch's exploded spans: the owning
    document's batch-row index (``doc_idx``, int, grouped but any order
    within), and normalized page coordinates ``x``/``y`` in [0, 1].
    Returns ``(column, offset, n_cols)``: per-span column id (0-based,
    left to right), per-span reading-order rank within its document, and
    the per-DOCUMENT column count (indexed by doc row, length =
    max(doc_idx)+1 entries for docs present).
    """
    n = len(doc_idx)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.int64)
    n_docs = int(doc_idx.max()) + 1

    # --- column detection: one (doc, x) lexsort, adjacent gaps in-doc ---
    by_x = np.lexsort((x, doc_idx))
    dx, xx = doc_idx[by_x], x[by_x]
    same_doc = np.r_[False, dx[1:] == dx[:-1]]
    boundary = same_doc & (np.r_[0.0, xx[1:] - xx[:-1]] >= min_gap)
    # column id = running boundary count, reset at each document start
    cum = np.cumsum(boundary.astype(np.int64))
    doc_start = ~same_doc
    base = np.zeros(n, dtype=np.int64)
    base[doc_start] = cum[doc_start]
    np.maximum.accumulate(base, out=base)
    col_sorted = cum - base
    column = np.empty(n, dtype=np.int64)
    column[by_x] = col_sorted

    n_cols = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(n_cols, dx, col_sorted + 1)

    # --- reading order: (doc, column, -y, x) lexsort → rank in doc ---
    order = np.lexsort((x, -y, column, doc_idx))
    ranks = np.empty(n, dtype=np.int64)
    d_sorted = doc_idx[order]
    starts = np.r_[True, d_sorted[1:] != d_sorted[:-1]]
    first = np.zeros(n, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    first[starts] = idx[starts]
    np.maximum.accumulate(first, out=first)
    ranks[order] = idx - first
    return column, ranks, n_cols


def assign_reading_order(
    batch: pa.Table,
    doc_col: str = "doc_id",
    min_gap: float = MIN_COLUMN_GAP,
) -> pa.Table:
    """Per-batch stage over an EXPLODED positioned-span table
    (``doc_id, x, y, ...``): appends ``column`` and ``offset`` (the
    reading-order rank).  Spans of one document must share a block — the
    contract every exploded-span stage in this engine uses (explode
    assigns the partition per document, reassemble groups on it)."""
    ids = batch.column(doc_col)
    codes = ids.combine_chunks().dictionary_encode().indices.to_numpy()
    column, offset, _ = reading_order_flat(
        codes.astype(np.int64),
        batch.column("x").to_numpy(zero_copy_only=False).astype(np.float64),
        batch.column("y").to_numpy(zero_copy_only=False).astype(np.float64),
        min_gap,
    )
    return batch.append_column(
        "column", pa.array(column, type=pa.int32())
    ).append_column("offset", pa.array(offset, type=pa.int32()))
