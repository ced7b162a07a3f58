"""Size-bucketed skew isolation for heavyweight documents (north rule;
SURVEY.md §4 'Skew / stragglers', §7.5).

The corpus has a heavy tail (fixture family ``heavy``: 100-500 transactions,
~10× the median document cost — mirroring multi-hundred-page PDFs).  Inside
a count-bounded batch, one heavy document can dominate the batch's wall
time; isolating heavies into their own stage with a small ``batch_size``
bounds straggler time to ~one heavy document.

Implementation: a cheap vectorized size estimate (``pc.list_value_length``
— no text materialization) splits the stream into light/heavy branches;
each branch runs the same extraction stage with a size-appropriate batch
size, and the results union.  Both branches re-read the (cheap, columnar)
source — at 100 TB the split would instead be baked into the storage
layout (size-partitioned fragments) so each branch reads only its files;
``partition_corpus_by_size`` writes exactly that layout.
"""

from __future__ import annotations

from typing import Tuple

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_HEAVY_SPANS = 600  # ≈120+ transactions at ~5 lines each


def add_size_columns(batch: pa.Table) -> pa.Table:
    """Append n_spans (vectorized; no span text touched)."""
    return batch.append_column(
        "n_spans", pc.cast(pc.list_value_length(batch.column("spans")), pa.int32())
    )


def split_by_size(ds, heavy_spans: int = DEFAULT_HEAVY_SPANS) -> Tuple[object, object]:
    """→ (light, heavy) datasets, split on the span-count estimate."""
    sized = ds.map_batches(add_size_columns, batch_format="pyarrow")
    light = sized.filter(expr=f"n_spans < {heavy_spans}")
    heavy = sized.filter(expr=f"n_spans >= {heavy_spans}")
    return light, heavy


def extract_with_skew_isolation(
    ds,
    verify: bool = True,
    heavy_spans: int = DEFAULT_HEAVY_SPANS,
    light_batch_size: int = 666,
    heavy_batch_size: int = 32,
):
    """Flagship extraction with the heavy tail isolated.

    Light documents flow in large batches (throughput); heavy documents in
    small batches (straggler bound ≈ one heavy doc).  Output schema matches
    ``extract_documents`` exactly, so sinks/metrics are shared.
    """
    from ..pipelines.flagship import extract_documents

    light, heavy = split_by_size(ds, heavy_spans)
    out_light = extract_documents(
        light.drop_columns(["n_spans"]), verify=verify, batch_size=light_batch_size
    )
    out_heavy = extract_documents(
        heavy.drop_columns(["n_spans"]), verify=verify, batch_size=heavy_batch_size
    )
    return out_light.union(out_heavy)


def partition_corpus_by_size(
    ds, out_dir: str, heavy_spans: int = DEFAULT_HEAVY_SPANS
) -> None:
    """Write the size-partitioned storage layout (`size=light|heavy` dirs):
    the 100 TB form of the split, where each extraction branch reads only
    its own fragments instead of filtering the full stream twice."""
    sized = ds.map_batches(add_size_columns, batch_format="pyarrow")

    def bucket(b: pa.Table) -> pa.Table:
        lab = pc.if_else(
            pc.greater_equal(b.column("n_spans"), heavy_spans),
            pa.scalar("heavy"),
            pa.scalar("light"),
        )
        return b.append_column("size", lab)

    sized.map_batches(bucket, batch_format="pyarrow").drop_columns(
        ["n_spans"]
    ).write_parquet(out_dir, partition_cols=["size"], compression="none")
