"""Sinks: normalized CSV / partitioned Parquet writers (SURVEY.md §2.2).

The reference writes per-document semicolon-delimited CSVs from the DRIVER
(`batch.py:193-219` — a serialization bottleneck its own README flags).
Here every sink writes from the Ray tasks that hold the data:

* K1/K2 — metadata / transactions CSV: number normalization
  (`utils.py:363-425` semantics via ``kernel.format_number_for_csv``)
  happens in a ``map_batches`` stage immediately before the sink, then
  ``ds.write_csv`` streams per-block files.
* K3 — partitioned parquet: one directory per key value
  (``partition_cols``), the resumable layout for 100 TB output.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from .. import kernel


def normalize_transactions_batch(batch: pa.Table) -> pa.Table:
    """Explode per-doc transaction lists to row-per-transaction with
    CSV-normalized amounts — the distributed form of the reference's
    ``save_transactions_csv`` loop (`utils.py:447-481`).

    The explode is zero-copy Arrow (``flatten`` + ``list_parent_indices``);
    the only per-row Python left is the number normalizer on the three
    amount columns (format semantics the reference defines in Python)."""
    import pyarrow.compute as pc

    txns = batch.column("transactions").combine_chunks()
    if isinstance(txns, pa.ChunkedArray):
        txns = txns.chunk(0) if txns.num_chunks else pa.array([], type=txns.type)
    # null transaction lists (error rows) explode to nothing
    parent = pc.list_parent_indices(txns)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    flat = txns.flatten()
    fmt = kernel.format_number_for_csv

    def fmt_col(name: str) -> pa.Array:
        # null/empty → "" (never a null): the reference's
        # _format_number_for_csv(None) returns "", and downstream Arrow/
        # parquet consumers of this table rely on the column being null-free
        return pa.array(
            [fmt(v) if v else "" for v in flat.field(name).to_pylist()],
            type=pa.string(),
        )

    return pa.Table.from_arrays(
        [
            doc_ids,
            flat.field("date"),
            flat.field("description"),
            flat.field("user"),
            fmt_col("debit"),
            fmt_col("credit"),
            fmt_col("balance"),
        ],
        names=["doc_id", "date", "description", "user", "debit", "credit", "balance"],
    )


def normalize_metadata_batch(batch: pa.Table) -> pa.Table:
    """Flatten the metadata struct to columns with normalized numeric fields
    (the reference's ``save_metadata_csv``, `utils.py:428-444`)."""
    fmt = kernel.format_number_for_csv
    numeric = {"total_debit", "total_credit", "opening_balance", "closing_balance"}
    metas = batch.column("metadata").to_pylist()
    field_names = [f.name for f in batch.schema.field("metadata").type]
    cols = {name: [] for name in field_names}
    for m in metas:
        m = m or {}
        for name in field_names:
            v = m.get(name) or ""
            cols[name].append(fmt(v) if name in numeric and v else v)
    return pa.Table.from_arrays(
        [batch.column("doc_id")]
        + [pa.array(cols[n], type=pa.string()) for n in field_names],
        names=["doc_id"] + field_names,
    )


def write_transactions_csv(extracted_ds, out_dir: str, delimiter: str = ";") -> None:
    """K2: row-per-transaction CSV files, written from the tasks."""
    from pyarrow import csv as pacsv

    (
        extracted_ds.map_batches(normalize_transactions_batch, batch_format="pyarrow")
        .write_csv(
            out_dir,
            arrow_csv_args_fn=lambda: {
                "write_options": pacsv.WriteOptions(delimiter=delimiter)
            },
        )
    )


def write_metadata_csv(extracted_ds, out_dir: str, delimiter: str = ";") -> None:
    """K1: row-per-document metadata CSV files."""
    from pyarrow import csv as pacsv

    (
        extracted_ds.map_batches(normalize_metadata_batch, batch_format="pyarrow")
        .write_csv(
            out_dir,
            arrow_csv_args_fn=lambda: {
                "write_options": pacsv.WriteOptions(delimiter=delimiter)
            },
        )
    )


def write_per_document_csvs(extracted_ds, output_dir: str, delimiter: str = ";") -> int:
    """K3, reference file layout: one ``{doc_id}_metadata.csv`` under
    ``output_dir/metadata/`` and one ``{doc_id}_transactions.csv`` under
    ``output_dir/transactions/`` per document — the exact per-file fan-out
    users of the reference glob against (`batch.py:193-219`,
    `utils.py:428-481`), but written from the Ray tasks that hold the data
    (one task writes the files for its batch; no driver serialization).

    Mirrors the reference's write conditions: the metadata CSV is written
    whenever the parse produced a metadata dict, the transactions CSV only
    when at least one transaction exists.  Returns the number of documents
    that wrote at least one file.

    Scale note: a file per document is the reference's contract, kept for
    script compatibility; on a multi-node cluster ``output_dir`` must be
    shared storage.  For 100 TB output prefer ``write_partitioned_parquet``.
    """
    import csv
    import os

    import pyarrow.compute as pc

    meta_dir = os.path.join(output_dir, "metadata")
    txn_dir = os.path.join(output_dir, "transactions")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(txn_dir, exist_ok=True)
    fmt = kernel.format_number_for_csv

    def write_batch(batch: pa.Table) -> pa.Table:
        # re-create on the worker: tasks may land on nodes where only the
        # shared mount exists, not the driver-created dirs
        os.makedirs(meta_dir, exist_ok=True)
        os.makedirs(txn_dir, exist_ok=True)
        wrote = 0
        for doc_id, meta, txns in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("metadata").to_pylist(),
            batch.column("transactions").to_pylist(),
        ):
            base = str(doc_id)
            did = False
            if meta:  # reference: `if result["metadata"]` (batch.py:211)
                path = os.path.join(meta_dir, f"{base}_metadata.csv")
                with open(path, "w", newline="", encoding="utf-8") as f:
                    w = csv.writer(f, delimiter=delimiter)
                    w.writerow(["Field", "Value"])
                    for field, value in meta.items():
                        w.writerow([field, fmt(value) if value else ""])
                did = True
            if txns:  # reference: `if result["transactions"]` (batch.py:216)
                path = os.path.join(txn_dir, f"{base}_transactions.csv")
                with open(path, "w", newline="", encoding="utf-8") as f:
                    w = csv.writer(f, delimiter=delimiter)
                    w.writerow(
                        ["Date", "Description", "User", "Debit", "Credit", "Balance"]
                    )
                    for t in txns:
                        w.writerow(
                            [
                                t.get("date", ""),
                                t.get("description", ""),
                                t.get("user", ""),
                                fmt(t.get("debit", "")),
                                fmt(t.get("credit", "")),
                                fmt(t.get("balance", "")),
                            ]
                        )
                did = True
            wrote += did
        return pa.Table.from_pydict({"n_docs_written": [wrote]})

    parts = extracted_ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    return int(parts["n_docs_written"].sum()) if len(parts) else 0


def write_partitioned_parquet(
    ds, out_dir: str, partition_cols: Optional[List[str]] = None
) -> None:
    """K3: key-partitioned parquet — one directory per key value, the
    resume/skip unit of a large run."""
    ds.write_parquet(out_dir, partition_cols=partition_cols)


def compact_parquet(
    input_path: str,
    out_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Lakehouse compaction: rewrite a directory of small parquet fragments
    into ~``target_rows_per_file``-row files — the standing maintenance job
    of any 100-TB table (a million 1 MB fragments tax every subsequent
    scan's footer reads, block planning and object-store metadata; the PDF
    path-list source attacks the same problem on the READ side,
    ``sources/pdfbytes.py``).

    Streams: read fragments → ``write_parquet(min/max_rows_per_file)``;
    no exchange, no driver materialization — Ray coalesces blocks into
    target-sized files as they arrive, so worker memory is one block
    however large the table.  Returns {files_in, files_out, rows} for the
    caller's compaction ledger.  Row-level content is preserved exactly;
    ORDER is not a parquet-table property and is not promised (the test
    asserts multiset equality).

    Hive-partitioned input (the ``key=value`` directory layout that
    ``write_partitioned_parquet`` and the ANN ``cluster=N/`` index produce)
    is compacted **within each partition directory**, mirroring the layout
    under ``out_dir`` — the partition column stays encoded in the directory
    name exactly as in the input, and each partition is an independent,
    resumable compaction unit (a failed run reruns only unfinished
    partitions; at 100 TB the per-partition pass IS the maintenance job's
    checkpoint grain).  The ledger counts fragments and footer rows
    RECURSIVELY so it matches what is actually compacted (the old
    top-level-only glob undercounted nested input)."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    def _frags(root: str) -> list:
        if not os.path.isdir(root):
            return [root]
        return sorted(
            glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        )

    frags = _frags(input_path)
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in frags)

    # leaf partition dirs = distinct parents of the fragments; flat input
    # degenerates to the single leaf == input_path (unchanged behavior)
    leaves = sorted({os.path.dirname(f) for f in frags}) or [input_path]
    root = input_path if os.path.isdir(input_path) else os.path.dirname(input_path)
    for leaf in leaves:
        rel = os.path.relpath(leaf, root)
        dest = out_dir if rel == os.curdir else os.path.join(out_dir, rel)
        # partitioning=None: the leaf path's own key=value segments must
        # stay ENCODED IN THE DIRECTORY NAME, not get hive-inferred into a
        # materialized column the input files never carried
        ds = ray.data.read_parquet(leaf, partitioning=None)
        ds.write_parquet(
            dest,
            min_rows_per_file=target_rows_per_file,
            max_rows_per_file=target_rows_per_file,
        )
    files_out = len(_frags(out_dir))
    return {
        "files_in": len(frags),
        "files_out": files_out,
        "rows": rows,
        "partitions": len(leaves),
    }
