"""Column-pruned readers for the benchmark/test star-schema tables.

Always pass ``columns`` so only the needed columns leave storage
(ray_guide.md 'prune at the read') — at 100 TB an unpruned read of a wide
table is the single largest avoidable cost.
"""

from __future__ import annotations

import os
from typing import List, Optional

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(sf_dir: str, name: str, columns: Optional[List[str]] = None,
               filter=None):
    """``filter`` is an optional ``pyarrow.dataset`` expression pushed into
    the fragment scan (row-group statistics pruning) — rows that fail the
    predicate never leave storage, vs a post-read ``Dataset.filter`` that
    ships every row first."""
    import ray.data

    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    kwargs = {} if filter is None else {"filter": filter}
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs
    )


def read_arrow(sf_dir: str, name: str, columns: Optional[List[str]] = None):
    """Driver-side Arrow read for genuinely small dimension tables only
    (region/nation/supplier scale) — the broadcast side of a map-side join."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_arrow_filtered(sf_dir: str, name: str,
                        columns: Optional[List[str]] = None, filters=None):
    """Driver-side PUSHED-DOWN Arrow fetch: ``filters`` prune row groups
    (and whole fragment files) before any data is decoded, so this is safe
    for a bounded candidate fetch out of an arbitrarily large table — the
    bound is on the SELECTED rows, never the table.  Accepts the table as
    a single ``<name>.parquet`` file or as a directory of fragment files
    (the production layout); ``pq.read_table`` dispatches on both."""
    import pyarrow.parquet as pq

    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    return pq.read_table(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, filters=filters
    )


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _is_jsonl(uri: str) -> bool:
    path = uri.rstrip("/")
    if path.endswith((".jsonl", ".json")):
        return True
    return os.path.isdir(path) and any(
        f.endswith((".jsonl", ".json")) for f in os.listdir(path)
    )


def _is_pdf(uri: str) -> bool:
    path = uri.rstrip("/")
    if path.endswith(".pdf"):
        return True
    return os.path.isdir(path) and any(
        f.endswith(".pdf") for f in os.listdir(path)
    )


def _normalize_span_documents(ds):
    """JSON-parsed document rows → the canonical span schema: the JSON
    reader infers struct field order by appearance and integers as int64,
    so rebuild ``spans`` as ``list<SPAN_TYPE>`` (kind/text/media_ref order,
    int32 offset) and force ``doc_id`` to string; every downstream stage
    then sees a schema identical to the parquet/lance path.  Other columns
    (strategy, family, …) pass through untouched."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..model import SPAN_TYPE

    def norm(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        struct = pa.StructArray.from_arrays(
            [pc.cast(flat.field(f.name), f.type) for f in SPAN_TYPE],
            fields=list(SPAN_TYPE),
        )
        arrays, names = [], []
        for name in batch.column_names:
            if name == "doc_id":
                arrays.append(pc.cast(batch.column("doc_id"), pa.string()))
            elif name == "spans":
                arrays.append(pa.ListArray.from_arrays(spans.offsets, struct))
            else:
                arrays.append(batch.column(name))
            names.append(name)
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(norm, batch_format="pyarrow")


def read_documents(uri: str, columns: Optional[List[str]] = None):
    """Document-corpus source for the north rule's Lance input.

    Uses ``ray.data.read_lance`` when the ``lance`` package is installed
    (the production format — fragment-parallel, column-pruned); this
    container ships without it, so ``.lance`` URIs raise a clear error and
    parquet directories (same schema, same fragment-per-block layout, the
    tested stand-in) read via ``read_parquet``.  ``.jsonl``/``.json``
    corpora (the interchange format crawl tooling actually emits) read via
    ``ray.data.read_json`` with schema normalization back to the canonical
    span layout; note JSONL has no column pruning — convert to
    parquet/lance for production scans.  ``.pdf`` files / directories of
    PDFs read via byte-stream tokenization (``sources/pdfbytes.py``) into
    the same canonical documents(doc_id, spans) schema.
    """
    import ray.data

    if uri.rstrip("/").endswith(".lance"):
        if not lance_available():
            raise ImportError(
                "lance is not installed in this environment; write the corpus "
                "as parquet (fixtures.write_corpus) or install pylance"
            )
        return ray.data.read_lance(uri, columns=columns)
    if _is_jsonl(uri):
        ds = _normalize_span_documents(ray.data.read_json(uri))
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if _is_pdf(uri):
        from .pdfbytes import read_pdf_documents

        ds = read_pdf_documents(uri)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return ray.data.read_parquet(uri, columns=columns)


def write_documents(ds, uri: str) -> None:
    """Counterpart sink: Lance when available and requested, ``.jsonl``
    for interchange, else parquet."""
    if uri.rstrip("/").endswith(".lance"):
        if not lance_available():
            raise ImportError("lance is not installed; use a parquet path")
        ds.write_lance(uri)
        return
    if uri.rstrip("/").endswith((".jsonl", ".json")):
        ds.write_json(uri)
        return
    ds.write_parquet(uri, compression="none")


def salted_partitions(
    source_rows: int, target_rows: int = 2_000_000, floor: int = 64
) -> int:
    """Partition count for the salted-shuffle operators, derived from the
    source-table row count (footer metadata — no data read) so one
    partition-group stays worker-memory-sized at ANY corpus: a fixed P=64
    over 10^10 rows would put ~160M rows in one Ray group.  Power of two
    (the salt is a bit-and), floored at 64 so small inputs keep enough
    parallelism.  IEEE float formula (ceil(x/t), 2^ceil(log2(.))) matches
    DuckDB's CEIL/LOG2/POWER exactly — the pack oracle recomputes it in
    SQL from count(*)."""
    import math

    x = max(floor, math.ceil(source_rows / target_rows))
    return 1 << math.ceil(math.log2(x))


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — no data read, no Ray.
    The size-gated join planner's input (functions/joins.py).  Accepts the
    table as a single file or as a directory of fragment files (the
    production layout — one fragment per input shard)."""
    import pyarrow.parquet as pq

    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows
