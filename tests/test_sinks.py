"""Sink tests: normalized CSV + partitioned parquet (SURVEY.md §2.2)."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from b_pdf_parser_ray.fixtures import corpus_table
from b_pdf_parser_ray.pipelines.flagship import extract_documents
from b_pdf_parser_ray.sources.sinks import (
    normalize_metadata_batch,
    normalize_transactions_batch,
    write_metadata_csv,
    write_partitioned_parquet,
    write_transactions_csv,
)


def _extracted(n=40):
    return extract_documents(
        ray.data.from_arrow(corpus_table(n)), concurrency=(1, 2), batch_size=20
    )


def test_normalize_transactions_batch_pure(ray_session):
    ext = _extracted(20).to_pandas()
    batch = pa.Table.from_pandas(ext[["doc_id", "transactions"]], preserve_index=False)
    flat = normalize_transactions_batch(batch)
    assert flat.column_names == [
        "doc_id", "date", "description", "user", "debit", "credit", "balance"
    ]
    assert flat.num_rows > 20  # many txns per doc
    # normalization: "1,234.56" → "1234.56"; "0.00" → "0"
    debs = set(flat.column("debit").to_pylist())
    assert not any("," in d for d in debs)
    assert "0" in debs


def test_write_transactions_csv_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "txns")
    write_transactions_csv(_extracted(30), out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    tbl = pa.concat_tables(
        pacsv.read_csv(
            f, parse_options=pacsv.ParseOptions(delimiter=";"),
            convert_options=pacsv.ConvertOptions(column_types={"date": pa.string()}),
        )
        for f in files
    )
    assert tbl.num_rows > 30


def test_write_metadata_csv(ray_session, tmp_path):
    out = str(tmp_path / "meta")
    write_metadata_csv(_extracted(30), out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    tbl = pacsv.read_csv(files[0], parse_options=pacsv.ParseOptions(delimiter=";"))
    assert "account_no" in tbl.column_names and "total_debit" in tbl.column_names


def test_write_partitioned_parquet(ray_session, tmp_path):
    out = str(tmp_path / "part")
    ds = ray.data.from_arrow(corpus_table(30))

    def add_bucket(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.append_column(
            "bucket",
            pc.cast(pc.multiply(pc.list_value_length(b.column("spans")), 0), pa.string()),
        )

    write_partitioned_parquet(
        ds.map_batches(add_bucket, batch_format="pyarrow").select_columns(
            ["doc_id", "strategy", "bucket"]
        ),
        out,
        partition_cols=["strategy"],
    )
    dirs = glob.glob(os.path.join(out, "strategy=*"))
    assert len(dirs) >= 2  # column + inline/indonesian strategies present


def test_write_per_document_csvs_layout(ray_session, tmp_path):
    """K3 naming parity: one {doc_id}_metadata.csv + {doc_id}_transactions.csv
    per document, the layout reference users glob (batch.py:193-219)."""
    from b_pdf_parser_ray.sources.sinks import write_per_document_csvs

    out = str(tmp_path / "perdoc")
    n = write_per_document_csvs(_extracted(20), out)
    assert n == 20
    meta_files = sorted(glob.glob(os.path.join(out, "metadata", "*_metadata.csv")))
    txn_files = sorted(glob.glob(os.path.join(out, "transactions", "*_transactions.csv")))
    assert len(meta_files) == 20  # metadata dict always present for parsed docs
    assert 0 < len(txn_files) <= 20
    with open(meta_files[0], encoding="utf-8") as f:
        header = f.readline().strip()
    assert header == "Field;Value"
    with open(txn_files[0], encoding="utf-8") as f:
        header = f.readline().strip()
    assert header == "Date;Description;User;Debit;Credit;Balance"


def test_write_per_document_csvs_reference_bytes(ray_session, tmp_path, reference):
    """Differential: our per-doc CSV bytes == the reference's
    save_metadata_csv / save_transactions_csv output for the same parse."""
    from b_pdf_parser_ray.sources.sinks import write_per_document_csvs

    out = str(tmp_path / "ours")
    rows = _extracted(8).take_all()
    write_per_document_csvs(_extracted(8), out)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    for r in rows:
        if r["metadata"]:
            ref_path = str(ref_dir / "m.csv")
            reference.utils.save_metadata_csv(r["metadata"], ref_path)
            ours = os.path.join(out, "metadata", f"{r['doc_id']}_metadata.csv")
            assert open(ours, encoding="utf-8").read() == open(ref_path, encoding="utf-8").read()
        if r["transactions"]:
            ref_path = str(ref_dir / "t.csv")
            reference.utils.save_transactions_csv(r["transactions"], ref_path)
            ours = os.path.join(out, "transactions", f"{r['doc_id']}_transactions.csv")
            assert open(ours, encoding="utf-8").read() == open(ref_path, encoding="utf-8").read()


def test_read_write_documents_parquet_roundtrip(ray_session, tmp_path):
    from b_pdf_parser_ray.sources.tables import read_documents, write_documents

    out = str(tmp_path / "docs_pq")
    write_documents(ray.data.from_arrow(corpus_table(25)), out)
    back = read_documents(out, columns=["doc_id", "strategy"])
    assert back.count() == 25
    assert set(back.schema().names) == {"doc_id", "strategy"}


def test_read_documents_lance_requires_package():
    import pytest

    from b_pdf_parser_ray.sources.tables import lance_available, read_documents

    if lance_available():
        pytest.skip("lance installed; error path not applicable")
    with pytest.raises(ImportError):
        read_documents("/tmp/nonexistent.lance")


def test_normalized_transactions_are_null_free(ray_session):
    """None debit/credit/balance must land as "" (the reference's
    _format_number_for_csv(None) semantics), never an Arrow null — parquet/
    Arrow consumers of the normalized table rely on null-free amounts."""
    txn_type = pa.list_(
        pa.struct(
            [
                ("date", pa.string()),
                ("description", pa.string()),
                ("user", pa.string()),
                ("debit", pa.string()),
                ("credit", pa.string()),
                ("balance", pa.string()),
            ]
        )
    )
    batch = pa.Table.from_arrays(
        [
            pa.array([1], type=pa.int64()),
            pa.array(
                [[{"date": "01/01/24 10:00:00", "description": "d", "user": "123456",
                   "debit": None, "credit": "", "balance": "1,000.00"}]],
                type=txn_type,
            ),
        ],
        names=["doc_id", "transactions"],
    )
    flat = normalize_transactions_batch(batch)
    for col in ("debit", "credit", "balance"):
        assert flat.column(col).null_count == 0
    assert flat.column("debit").to_pylist() == [""]
    assert flat.column("credit").to_pylist() == [""]
    assert flat.column("balance").to_pylist() == ["1000"]


def test_read_documents_jsonl_matches_parquet(ray_session, tmp_path):
    """JSONL corpus ingestion: a span corpus written as JSON lines must
    read back with the exact canonical schema (struct field order, int32
    offset, string doc_id) and identical values to the parquet path, and
    extraction over it must produce identical results."""
    import json

    import pyarrow as pa
    import ray

    from b_pdf_parser_ray.fixtures import corpus_table
    from b_pdf_parser_ray.sources.tables import read_documents, write_documents

    tbl = corpus_table(20)
    pq_dir = str(tmp_path / "pq")
    write_documents(ray.data.from_arrow(tbl), pq_dir)
    jl_path = tmp_path / "corpus.jsonl"
    with open(jl_path, "w") as f:
        for row in tbl.to_pylist():
            f.write(json.dumps(row) + "\n")

    via_pq = read_documents(pq_dir).to_pandas().sort_values("doc_id", ignore_index=True)
    via_jl = read_documents(str(jl_path)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(via_jl.columns) == list(via_pq.columns)
    assert via_jl["doc_id"].tolist() == via_pq["doc_id"].tolist()
    assert via_jl["spans"].map(len).tolist() == via_pq["spans"].map(len).tolist()

    def extract(ds):
        return (
            extract_documents(ds, batch_size=16)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )

    a = extract(read_documents(pq_dir))
    b = extract(read_documents(str(jl_path)))
    for df in (a, b):
        df["n_txns"] = df["transactions"].map(len)
    pd.testing.assert_frame_equal(
        a[["doc_id", "is_valid", "n_txns"]], b[["doc_id", "is_valid", "n_txns"]]
    )


def test_write_documents_jsonl_roundtrip(ray_session, tmp_path):
    import ray

    from b_pdf_parser_ray.fixtures import corpus_table
    from b_pdf_parser_ray.sources.tables import read_documents, write_documents

    out = str(tmp_path / "corpus.jsonl")
    write_documents(ray.data.from_arrow(corpus_table(10)), out)
    back = read_documents(out)
    df = back.to_pandas()
    assert len(df) == 10
    assert set(["doc_id", "spans"]).issubset(df.columns)


def test_compact_parquet_preserves_rows_and_reduces_files(ray_session, tmp_path):
    """Compaction must preserve the exact row multiset while collapsing
    many small fragments into target-sized files."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.sources.sinks import compact_parquet

    src = tmp_path / "frags"
    src.mkdir()
    n_frag, rows_per = 24, 500
    for i in range(n_frag):
        tbl = pa.table(
            {"id": pa.array(range(i * rows_per, (i + 1) * rows_per), pa.int64()),
             "v": pa.array([i] * rows_per, pa.int32())}
        )
        pq.write_table(tbl, src / f"frag-{i:03d}.parquet")

    out = tmp_path / "compacted"
    ledger = compact_parquet(str(src), str(out), target_rows_per_file=4000)
    assert ledger["files_in"] == n_frag
    assert ledger["rows"] == n_frag * rows_per
    # parallel write streams each flush at their own block boundaries, so
    # the exact count varies with scheduling; the compaction CONTRACT is:
    # far fewer files, none above the target size, content multiset exact
    files = glob.glob(str(out / "*.parquet"))
    assert ledger["files_out"] == len(files) <= n_frag // 3
    assert all(
        pq.ParquetFile(f).metadata.num_rows <= 4000 for f in files
    )
    got = pq.read_table(str(out)).to_pandas().sort_values("id", ignore_index=True)
    want = pq.read_table(str(src)).to_pandas().sort_values("id", ignore_index=True)
    assert got.equals(want)


def test_compact_parquet_hive_partitioned_input(ray_session, tmp_path):
    """Round-4 verdict task 8: compaction of a ``key=value``-partitioned
    table (the ANN ``cluster=N/`` layout) must compact WITHIN each
    partition dir, mirror the layout, reduce per-dir file counts, keep the
    per-partition row multiset exact, and ledger-count fragments/rows
    RECURSIVELY (ADVICE r4: the old top-level glob undercounted)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.sources.sinks import compact_parquet

    src = tmp_path / "index"
    n_clusters, frags_per, rows_per = 3, 12, 400
    for c in range(n_clusters):
        d = src / f"cluster={c}"
        d.mkdir(parents=True)
        for i in range(frags_per):
            base = (c * frags_per + i) * rows_per
            tbl = pa.table(
                {"vec_id": pa.array(range(base, base + rows_per), pa.int64()),
                 "v": pa.array([c] * rows_per, pa.int32())}
            )
            pq.write_table(tbl, d / f"frag-{i:03d}.parquet")

    out = tmp_path / "compacted"
    ledger = compact_parquet(str(src), str(out), target_rows_per_file=2400)
    assert ledger["files_in"] == n_clusters * frags_per
    assert ledger["rows"] == n_clusters * frags_per * rows_per
    assert ledger["partitions"] == n_clusters
    total_out = 0
    for c in range(n_clusters):
        in_dir = src / f"cluster={c}"
        out_dir = out / f"cluster={c}"
        files = glob.glob(str(out_dir / "*.parquet"))
        assert files, f"partition cluster={c} missing from output layout"
        assert len(files) <= frags_per // 3
        total_out += len(files)
        got = pq.read_table(str(out_dir)).to_pandas().sort_values(
            "vec_id", ignore_index=True
        )
        want = pq.read_table(str(in_dir)).to_pandas().sort_values(
            "vec_id", ignore_index=True
        )
        assert got.equals(want)
    assert ledger["files_out"] == total_out
