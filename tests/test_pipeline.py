"""End-to-end Ray Data pipeline tests: extraction stage, span equality at
corpus level, explode/reassemble round-trip, resumable sink."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from b_pdf_parser_ray import fixtures, kernel, model
from b_pdf_parser_ray.pipelines.flagship import (
    extract_documents,
    run_resumable,
    summarize,
)
from b_pdf_parser_ray.stages.reassemble import explode, reassemble

N_DOCS = 120


@pytest.fixture(scope="module")
def corpus():
    return fixtures.corpus_table(N_DOCS)


@pytest.fixture(scope="module")
def extracted_rows(ray_session, corpus):
    import ray.data

    ds = ray.data.from_arrow(corpus)
    out = extract_documents(ds, concurrency=2, batch_size=32).take_all()
    return {r["doc_id"]: r for r in out}


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_extraction_matches_kernel_per_document(corpus, extracted_rows):
    """The distributed pipeline must agree with the plain kernel on every
    document — parity of the Ray layer, not just the kernel."""
    assert len(extracted_rows) == N_DOCS
    for row in corpus.to_pylist():
        got = extracted_rows[row["doc_id"]]
        text = model.render_text(row["spans"])
        want = kernel.parse_document(row["doc_id"], text, strategy=row["strategy"])
        want_md = dict.fromkeys(model.ALL_METADATA_KEYS, "")
        want_md.update(want["metadata"])
        assert got["metadata"] == want_md, row["doc_id"]
        assert got["transactions"] == want["transactions"], row["doc_id"]
        assert got["is_valid"] == want["is_valid"], row["doc_id"]
        v = want["verification"]
        assert got["verification"]["status"] == v["status"]
        assert got["verification"]["passed"] == v["passed"]
        assert got["verification"]["total_debit_calculated"] == pytest.approx(
            v["total_debit_calculated"]
        )
        assert got["error"] is None


def test_verification_struct_full_reference_parity(corpus, extracted_rows, reference):
    """The columnar verification struct must carry the reference's FULL
    verification dict (utils.py:763-775) — including debit_match,
    credit_match and message — field for field."""
    checked = 0
    for row in corpus.to_pylist():
        got = extracted_rows[row["doc_id"]]["verification"]
        text = model.render_text(row["spans"])
        want_txns = kernel.parse_document(
            row["doc_id"], text, strategy=row["strategy"]
        )["transactions"]
        want = reference.utils.verify_turnover(want_txns, summary_text=text)
        assert set(want) == set(got), row["doc_id"]
        for key, v in want.items():
            if isinstance(v, float):
                assert got[key] == pytest.approx(v), (row["doc_id"], key)
            else:
                assert got[key] == v, (row["doc_id"], key)
        checked += 1
    assert checked == N_DOCS


def test_span_sequence_equality_whole_corpus(corpus, extracted_rows):
    """North-rule invariant: output spans == input spans in offset order,
    (kind, text, media_ref, offset) all preserved — media spans included."""
    for row in corpus.to_pylist():
        expected = sorted(row["spans"], key=lambda s: s["offset"])
        got = extracted_rows[row["doc_id"]]["out_spans"]
        assert _span_tuples(got) == _span_tuples(expected), row["doc_id"]


def test_extractor_handles_unsorted_spans(ray_session):
    """Block order is never a correctness carrier: shuffle spans within a
    document; rendered text and out_spans must be identical."""
    import random

    import ray.data

    doc = fixtures.make_document(3)
    shuffled = list(doc["spans"])
    random.Random(7).shuffle(shuffled)
    tbl = pa.Table.from_pylist(
        [{**doc, "spans": shuffled}], schema=fixtures.CORPUS_SCHEMA
    )
    out = extract_documents(
        ray.data.from_arrow(tbl), concurrency=1, batch_size=8
    ).take_all()[0]
    expected = sorted(doc["spans"], key=lambda s: s["offset"])
    assert _span_tuples(out["out_spans"]) == _span_tuples(expected)
    text = model.render_text(doc["spans"])
    want = kernel.parse_document(doc["doc_id"], text, strategy=doc["strategy"])
    assert out["transactions"] == want["transactions"]


def test_explode_reassemble_roundtrip(ray_session, corpus):
    import ray.data

    small = corpus.slice(0, 25)
    ds = ray.data.from_arrow(small)
    back = reassemble(explode(ds)).take_all()
    by_id = {r["doc_id"]: r["spans"] for r in back}
    assert len(by_id) == 25
    for row in small.to_pylist():
        expected = sorted(row["spans"], key=lambda s: s["offset"])
        assert _span_tuples(by_id[row["doc_id"]]) == _span_tuples(expected)


def test_summarize_counts(ray_session, corpus):
    import ray.data

    s = summarize(extract_documents(ray.data.from_arrow(corpus), concurrency=2))
    assert s["total"] == N_DOCS
    assert 0 < s["valid"] <= N_DOCS
    assert s["transactions"] > 0
    n_invalid = sum(
        1
        for r in corpus.to_pylist()
        if fixtures.family_of(int(r["doc_id"].rsplit("_", 1)[1])) == "truncated"
    )
    assert s["failed"] == n_invalid


def test_resumable_run_skips_done_shards(ray_session, tmp_path):
    shard_dir = tmp_path / "in"
    shard_dir.mkdir()
    files = []
    for k in range(3):
        p = shard_dir / f"shard{k}.parquet"
        pq.write_table(fixtures.corpus_table(30, start=k * 30), p)
        files.append(str(p))

    out = tmp_path / "out"
    first = run_resumable(files, str(out), concurrency=2)
    assert [r["skipped"] for r in first] == [False, False, False]
    assert all(r["status"] == "done" for r in first)
    assert sum(r["total"] for r in first) == 90

    second = run_resumable(files, str(out), concurrency=2)
    assert [r["skipped"] for r in second] == [True, True, True]

    # outputs are readable and complete
    import ray.data

    total = ray.data.read_parquet(str(out)).count()
    assert total == 90


def test_resumable_pipelined_matches_sequential(ray_session, tmp_path):
    """Shard pipelining (max_inflight_shards>1) must not change output:
    same manifests, same row counts as the strictly sequential path."""
    import ray.data

    shard_dir = tmp_path / "in"
    shard_dir.mkdir()
    files = []
    for k in range(4):
        p = shard_dir / f"s{k}.parquet"
        pq.write_table(fixtures.corpus_table(25, start=k * 25), p)
        files.append(str(p))

    seq = run_resumable(files, str(tmp_path / "seq"), concurrency=2,
                        max_inflight_shards=1)
    par = run_resumable(files, str(tmp_path / "par"), concurrency=2,
                        max_inflight_shards=2)
    assert [(r["partition_id"], r["total"], r["valid"]) for r in seq] == [
        (r["partition_id"], r["total"], r["valid"]) for r in par
    ]
    a = ray.data.read_parquet(str(tmp_path / "seq")).count()
    b = ray.data.read_parquet(str(tmp_path / "par")).count()
    assert a == b == 100


def test_poison_document_becomes_error_row(ray_session, monkeypatch):
    """A document that makes the kernel raise must yield an error row, not a
    failed job (reference batch.py:183-189 behavior)."""
    import ray.data

    bad = pa.Table.from_pylist(
        [
            {
                "doc_id": "poison",
                "spans": [{"kind": "text", "text": None, "media_ref": "", "offset": 0}],
                "strategy": "column",
                "family": "poison",
            }
        ],
        schema=fixtures.CORPUS_SCHEMA,
    )
    out = extract_documents(
        ray.data.from_arrow(bad), concurrency=1
    ).take_all()
    assert len(out) == 1
    assert out[0]["error"] is not None
    assert out[0]["is_valid"] is False


def test_summarize_empty_input(ray_session):
    import pyarrow as pa
    import ray.data

    from b_pdf_parser_ray.fixtures import CORPUS_SCHEMA
    from b_pdf_parser_ray.pipelines.flagship import extract_documents, summarize

    empty = pa.Table.from_pylist([], schema=CORPUS_SCHEMA)
    m = summarize(extract_documents(ray.data.from_arrow(empty)))
    assert m["total"] == 0 and m["valid"] == 0 and m["success_rate"] == 0.0


def test_batch_parse_empty_table(ray_session):
    import pyarrow as pa

    from b_pdf_parser_ray import batch_parse
    from b_pdf_parser_ray.fixtures import CORPUS_SCHEMA

    res = batch_parse(pa.Table.from_pylist([], schema=CORPUS_SCHEMA))
    assert res["total"] == 0 and res["failed"] == 0


def test_extractor_handles_doc_with_no_text_spans(ray_session):
    import pyarrow as pa
    import ray.data

    from b_pdf_parser_ray.fixtures import CORPUS_SCHEMA
    from b_pdf_parser_ray.pipelines.flagship import extract_documents

    doc = {
        "doc_id": "media_only",
        "spans": [
            {"kind": "media", "text": "", "media_ref": "Im0", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "Im1", "offset": 1},
        ],
        "strategy": "column",
        "family": "synthetic",
    }
    out = extract_documents(
        ray.data.from_arrow(pa.Table.from_pylist([doc], schema=CORPUS_SCHEMA))
    ).take_all()
    assert len(out) == 1
    row = out[0]
    assert row["is_valid"] is False and row["error"] is None
    assert [s["media_ref"] for s in row["out_spans"]] == ["Im0", "Im1"]


def test_extractor_handles_shuffled_span_order(ray_session):
    """Offset is the only order carrier: shuffling a document's span list
    must not change the parse, and out_spans must come back offset-sorted."""
    import random

    import pyarrow as pa
    import ray.data

    from b_pdf_parser_ray.fixtures import CORPUS_SCHEMA, make_document
    from b_pdf_parser_ray.pipelines.flagship import extract_documents

    docs = [make_document(i) for i in range(12)]
    shuffled = []
    rng = random.Random(99)
    for d in docs:
        s = dict(d)
        s["spans"] = rng.sample(d["spans"], len(d["spans"]))
        shuffled.append(s)

    def run(rows):
        out = extract_documents(
            ray.data.from_arrow(pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA))
        ).take_all()
        return sorted(out, key=lambda r: r["doc_id"])

    a, b = run(docs), run(shuffled)
    for ra, rb in zip(a, b):
        assert ra["doc_id"] == rb["doc_id"]
        assert ra["metadata"] == rb["metadata"]
        assert ra["transactions"] == rb["transactions"]
        assert ra["is_valid"] == rb["is_valid"]
        offs = [s["offset"] for s in rb["out_spans"]]
        assert offs == sorted(offs)
        assert rb["out_spans"] == ra["out_spans"]


def test_job_submit_entrypoint(tmp_path):
    """scripts/run_extraction_job.py is the `ray job submit` driver: runs
    standalone (own Ray session in a subprocess), prints one JSON line,
    and a re-run skips all done shards."""
    import json
    import subprocess
    import sys

    src = tmp_path / "in"
    src.mkdir()
    for k in range(2):
        pq.write_table(fixtures.corpus_table(20, start=k * 20), src / f"s{k}.parquet")

    cmd = [sys.executable, "scripts/run_extraction_job.py",
           "--input", str(src), "--output", str(tmp_path / "out")]
    env = dict(**__import__("os").environ)
    env.pop("RAY_ADDRESS", None)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["shards"] == 2 and rec["total"] == 40 and rec["skipped_shards"] == 0

    out2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", env=env)
    rec2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert rec2["skipped_shards"] == 2 and rec2["total"] == 40


def test_resumable_records_failed_shard_and_continues(ray_session, tmp_path):
    """on_error='record': a corrupt shard yields a status='failed' manifest
    and the run continues; the re-run (with the file fixed) retries exactly
    that shard and completes."""
    shard_dir = tmp_path / "in"
    shard_dir.mkdir()
    good = shard_dir / "good.parquet"
    bad = shard_dir / "bad.parquet"
    pq.write_table(fixtures.corpus_table(20), good)
    bad.write_bytes(b"this is not parquet")
    files = [str(bad), str(good)]

    out = tmp_path / "out"
    recs = run_resumable(files, str(out), concurrency=2, on_error="record")
    by_id = {r["partition_id"]: r for r in recs}
    assert by_id["good"]["status"] == "done" and by_id["good"]["total"] == 20
    assert by_id["bad"]["status"] == "failed" and "error" in by_id["bad"]

    # fail-fast default still raises
    with pytest.raises(Exception):
        run_resumable([str(bad)], str(tmp_path / "out2"), concurrency=2)

    # fix the shard; re-run retries only it
    pq.write_table(fixtures.corpus_table(10, start=100), bad)
    recs2 = run_resumable(files, str(out), concurrency=2, on_error="record")
    by_id2 = {r["partition_id"]: r for r in recs2}
    assert by_id2["good"]["skipped"] is True
    assert by_id2["bad"]["status"] == "done" and by_id2["bad"]["total"] == 10


def test_resumable_same_basename_shards_do_not_collide(ray_session, tmp_path):
    """Two input files with the same basename in different directories must
    get distinct shard ids (relative-path fallback), not silently overwrite
    one another's shard dir and manifest."""
    a_dir = tmp_path / "a"
    b_dir = tmp_path / "b"
    a_dir.mkdir()
    b_dir.mkdir()
    pa_path = a_dir / "part.parquet"
    pb_path = b_dir / "part.parquet"
    pq.write_table(fixtures.corpus_table(15, start=0), pa_path)
    pq.write_table(fixtures.corpus_table(15, start=15), pb_path)

    out = tmp_path / "out"
    recs = run_resumable(
        [str(pa_path), str(pb_path)], str(out), concurrency=2,
        max_inflight_shards=2,
    )
    ids = [r["partition_id"] for r in recs]
    assert len(set(ids)) == 2, ids
    assert sum(r["total"] for r in recs) == 30

    import ray.data

    assert ray.data.read_parquet(str(out)).count() == 30

    # a literally duplicated input path is a genuine error
    with pytest.raises(ValueError, match="duplicate input shards"):
        run_resumable([str(pa_path), str(pa_path)], str(tmp_path / "out2"))


def test_run_resumable_jsonl_shards(ray_session, tmp_path):
    """run_resumable is input-format-agnostic: JSONL shards extract,
    checkpoint, and resume exactly like parquet shards."""
    import json

    from b_pdf_parser_ray.fixtures import corpus_table
    from b_pdf_parser_ray.pipelines.flagship import run_resumable

    tbl = corpus_table(40)
    rows = tbl.to_pylist()
    shards = []
    for i in range(2):
        p = tmp_path / f"shard{i}.jsonl"
        with open(p, "w") as f:
            for row in rows[i * 20 : (i + 1) * 20]:
                f.write(json.dumps(row) + "\n")
        shards.append(str(p))

    out = str(tmp_path / "out")
    recs = run_resumable(shards, out)
    assert [r["total"] for r in recs] == [20, 20]
    assert all(not r["skipped"] for r in recs)
    recs2 = run_resumable(shards, out)
    assert all(r["skipped"] for r in recs2)


def test_documents_corpus_generator_planted_structure(ray_session, tmp_path):
    """The documents-shaped corpus generator (big-run evidence input) must
    be deterministic and carry its closed-form duplicate structure: in each
    decade of ids >= 10, id%10==8 is an EXACT copy of the decade base and
    id%10==7 is a near copy (~5% token mutations); the first decade has no
    duplicates."""
    from b_pdf_parser_ray.fixtures import make_text_document, write_documents_corpus

    a = make_text_document(123)
    assert a == make_text_document(123), "generator not deterministic"
    base, near, exact = (make_text_document(i) for i in (120, 127, 128))
    assert exact["text"] == base["text"]
    bt, nt = base["text"].split(), near["text"].split()
    assert len(bt) == len(nt)
    diff = sum(x != y for x, y in zip(bt, nt)) / len(bt)
    assert 0 < diff <= 0.08, f"near-dup mutation rate off: {diff}"
    assert make_text_document(7)["text"] != make_text_document(0)["text"]

    write_documents_corpus(str(tmp_path), 200, docs_per_file=100)
    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "documents.parquet"))
    assert t.num_rows == 200
    assert set(t.column_names) == {"doc_id", "text", "lang", "source", "n_chars"}
    df = t.to_pandas().set_index("doc_id")
    assert df.loc[38, "text"] == df.loc[30, "text"]
    assert (df["n_chars"] == df["text"].str.len()).all()


def test_run_resumable_sink_compression(ray_session, tmp_path):
    """sink_compression='zstd' must write decodable shards with identical
    content to the default codec (smaller is expected, not asserted —
    content equality is the contract)."""
    import glob

    import pyarrow.parquet as pq

    from b_pdf_parser_ray.fixtures import write_corpus
    from b_pdf_parser_ray.pipelines.flagship import run_resumable

    write_corpus(str(tmp_path / "c"), 300, docs_per_file=150)
    shards = sorted(glob.glob(str(tmp_path / "c" / "*.parquet")))
    run_resumable(shards, str(tmp_path / "o1"))
    run_resumable(shards, str(tmp_path / "o2"), sink_compression="zstd")

    def load(d):
        t = pq.read_table(d)
        return (
            t.select(["doc_id", "is_valid", "n_spans", "n_chars"])
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )

    a = load(str(tmp_path / "o1"))
    b = load(str(tmp_path / "o2"))
    assert a.equals(b)
