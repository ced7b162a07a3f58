"""Compatibility API tests (reference __init__.py:41-163, batch.py:254-465)."""

import pytest
import ray.data

from b_pdf_parser_ray import DocumentParser, batch_parse, batch_parse_from_directory, parse
from b_pdf_parser_ray.fixtures import corpus_table, make_document
from b_pdf_parser_ray.model import render_text


def test_parse_accepts_document_row():
    doc = make_document(3)
    res = parse(doc)
    assert set(res) >= {"metadata", "transactions", "is_valid"}
    assert "full_text" not in res


def test_parse_accepts_plain_text_and_matches_row_form():
    doc = make_document(3)
    res_row = parse(doc)
    res_text = parse(
        render_text(doc["spans"]), doc_id=doc["doc_id"], strategy=doc["strategy"]
    )
    assert res_row == res_text


def test_parse_verify_toggle():
    doc = make_document(3)
    assert "verification" in parse(doc)
    assert "verification" not in parse(doc, verify_turnover=False)


def test_invalid_strategy_raises():
    with pytest.raises(ValueError):
        parse("text", strategy="pymupdf")
    with pytest.raises(ValueError):
        DocumentParser(strategy="bogus")


def test_document_parser_class():
    p = DocumentParser(strategy="column", verify_turnover=True)
    res = p.parse(make_document(11))
    assert res["verification"]["status"] in {"passed", "failed", "not_available"}
    assert "strategy='column'" in repr(p)


def test_invalid_embedded_strategy_raises():
    """A strategy smuggled in the document dict must hit the same gate as
    the argument (the reference raises on unknown parser names)."""
    doc = dict(make_document(3))
    doc["strategy"] = "pymupdf"
    with pytest.raises(ValueError):
        parse(doc)


def test_batch_parse_counters(ray_session, tmp_path):
    out = str(tmp_path / "out")
    res = batch_parse(corpus_table(60), output_dir=out)
    assert res["total"] == 60
    # reference semantics (batch.py:374-379): successful = parsed without
    # error; validation failures stay successful and show up in `valid`
    assert res["successful"] + res["failed"] == 60
    assert res["successful"] == 60 - res["errors"]
    assert 0 < res["valid"] <= res["successful"]
    assert res["throughput"] > 0 and 0 <= res["success_rate"] <= 100
    assert res["memory_peak_mb"] > 0 and res["worker_overhead_percent"] == 0.0
    assert ray.data.read_parquet(out).count() == 60


def test_batch_parse_warn_and_skip_paths(ray_session, tmp_path):
    """F6: missing/non-file entries in a path list warn and skip; an
    all-invalid list returns the zero-counter dict (batch.py:321-343)."""
    from b_pdf_parser_ray.fixtures import write_corpus

    src = str(tmp_path / "src")
    write_corpus(src, 20, docs_per_file=20)
    import glob

    good = sorted(glob.glob(src + "/*.parquet"))
    with pytest.warns(UserWarning, match="skipping"):
        res = batch_parse(good + [str(tmp_path / "nope.parquet"), str(tmp_path)])
    assert res["total"] == 20

    with pytest.warns(UserWarning):
        res = batch_parse([str(tmp_path / "nope.parquet")])
    assert res == {
        "total": 0, "successful": 0, "failed": 1, "valid": 0, "errors": 0,
        "success_rate": 0.0, "duration": 0.0, "throughput": 0.0,
        "memory_peak_mb": 0.0, "worker_overhead_percent": 0.0,
        "transactions": 0, "output_dir": None,
    }


def test_validate_batch_params_reference_ranges():
    from b_pdf_parser_ray import validate_batch_params

    validate_batch_params("column", max_workers=8, chunk_size=10)
    with pytest.raises(ValueError, match="Invalid strategy"):
        validate_batch_params("pymupdf")
    with pytest.raises(ValueError, match="max_workers"):
        validate_batch_params("column", max_workers=33)
    with pytest.raises(ValueError, match="chunk_size"):
        validate_batch_params("column", chunk_size=501)
    with pytest.raises(ValueError, match="init_strategy"):
        validate_batch_params("column", init_strategy="bogus")


def test_load_config_env_file(tmp_path, monkeypatch):
    from b_pdf_parser_ray import load_config

    monkeypatch.delenv("SOURCE_PDF_DIR", raising=False)
    monkeypatch.delenv("VERIFY_TURNOVER", raising=False)
    env = tmp_path / ".env"
    env.write_text("SOURCE_PDF_DIR=/data/pdfs\nVERIFY_TURNOVER=true\n# comment\n")
    cfg = load_config(str(env))
    assert cfg["source_pdf_dir"] == "/data/pdfs"
    assert cfg["verify_turnover"] == "true"
    assert cfg["output_dir"] == "output"  # reference default
    # existing environment wins over the file (dotenv default)
    monkeypatch.setenv("SOURCE_PDF_DIR", "/elsewhere")
    assert load_config(str(env))["source_pdf_dir"] == "/elsewhere"


def test_batch_parse_from_directory(ray_session, tmp_path):
    src = str(tmp_path / "src")
    from b_pdf_parser_ray.fixtures import write_corpus

    write_corpus(src, 40, docs_per_file=20)
    res = batch_parse_from_directory(src, max_files=1)
    assert res["total"] == 20
    with pytest.raises(FileNotFoundError):
        batch_parse_from_directory(str(tmp_path / "empty_missing_dir_x"))


def test_batch_parse_reference_tuning_knobs(ray_session):
    """chunk_size / max_workers / init_strategy map onto the Ray physical
    plan (batch size, actor pool) with reference-range validation."""
    res = batch_parse(
        corpus_table(30), chunk_size=15, init_strategy="per-file", max_workers=2
    )
    assert res["total"] == 30 and res["successful"] == 30
    with pytest.raises(ValueError, match="chunk_size"):
        batch_parse(corpus_table(5), chunk_size=501)
    with pytest.raises(ValueError, match="init_strategy"):
        batch_parse(corpus_table(5), init_strategy="bogus")
    with pytest.raises(ValueError, match="max_workers"):
        batch_parse(corpus_table(5), max_workers=0)
