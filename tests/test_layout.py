"""Layout stage: gap-clustered column detection + (col, −y, x) reading
order (stages/layout.py) — the north rule's "column detection,
reading-order sort via y/x coordinate clustering" as a testable kernel.
Pure numpy/Arrow, no Ray session needed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from b_pdf_parser_ray.stages.layout import (
    assign_reading_order,
    reading_order_flat,
)


def _two_col_page(n0=5, n1=4):
    col = np.array([0] * n0 + [1] * n1)
    row = np.r_[np.arange(n0), np.arange(n1)]
    x = 0.05 + 0.55 * col + 0.001 * (row % 3)
    y = -row.astype(float)
    return col, x, y


def test_two_column_page_recovers_column_major_order():
    """Column-major truth: col0 top-down then col1 top-down.  The input
    arrives shuffled; the stage must not rely on span order."""
    col_truth, x, y = _two_col_page()
    n = len(x)
    perm = np.random.RandomState(1).permutation(n)
    col, off, ncols = reading_order_flat(
        np.zeros(n, dtype=np.int64), x[perm], y[perm]
    )
    assert ncols[0] == 2
    assert list(col) == list(col_truth[perm])
    assert list(perm[np.argsort(off)]) == list(range(n))


def test_naive_y_sort_interleaves_but_stage_does_not():
    """The adversarial case that makes column detection load-bearing: a
    plain y-then-x sort interleaves the two columns row by row."""
    _, x, y = _two_col_page()
    naive = np.lexsort((x, -y))
    assert list(naive) != list(range(len(x)))  # interleaved
    _, off, _ = reading_order_flat(np.zeros(len(x), dtype=np.int64), x, y)
    assert list(np.argsort(off)) == list(range(len(x)))


def test_single_column_no_false_split():
    x = np.full(5, 0.05) + 0.001 * (np.arange(5) % 3)  # jitter < min_gap
    _, off, ncols = reading_order_flat(
        np.zeros(5, dtype=np.int64), x, -np.arange(5, dtype=float)
    )
    assert ncols[0] == 1
    assert list(off) == [0, 1, 2, 3, 4]


def test_k_columns_and_multiple_docs_in_one_batch():
    """k falls out of the gap pass (no k chosen a priori); per-doc state
    never leaks across documents sharing a batch."""
    d = np.array([0, 0, 0, 1, 1, 1, 1, 1, 1], dtype=np.int64)
    x = np.array([0.1, 0.5, 0.9, 0.1, 0.1, 0.5, 0.5, 0.9, 0.9])
    y = np.array([0.0, 0.0, 0.0, 0.0, -1.0, 0.0, -1.0, 0.0, -1.0])
    col, off, ncols = reading_order_flat(d, x, y)
    assert list(ncols) == [3, 3]
    assert list(off[:3]) == [0, 1, 2]
    assert list(off[3:]) == [0, 1, 2, 3, 4, 5]


def test_assign_reading_order_batch_shape():
    """The Arrow stage appends (column, offset) int32 columns and keys
    documents by value (string doc ids, any order within the block)."""
    batch = pa.table(
        {
            "doc_id": ["b", "a", "b", "a"],
            "x": [0.1, 0.6, 0.6, 0.1],
            "y": [0.0, 0.0, 0.0, 0.0],
            "text": ["L", "R", "R", "L"],
        }
    )
    out = assign_reading_order(batch)
    assert out.column_names[-2:] == ["column", "offset"]
    by = {
        (r["doc_id"], r["text"]): (r["column"], r["offset"])
        for r in out.to_pylist()
    }
    assert by[("b", "L")] == (0, 0) and by[("b", "R")] == (1, 1)
    assert by[("a", "L")] == (0, 0) and by[("a", "R")] == (1, 1)


def test_empty_batch():
    col, off, ncols = reading_order_flat(
        np.zeros(0, dtype=np.int64), np.zeros(0), np.zeros(0)
    )
    assert len(col) == len(off) == len(ncols) == 0
