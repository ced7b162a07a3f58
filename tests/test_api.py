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


def test_batch_parse_counters(ray_session, tmp_path):
    out = str(tmp_path / "out")
    res = batch_parse(corpus_table(60), output_dir=out)
    assert res["total"] == 60
    assert res["successful"] + res["failed"] == 60
    assert res["throughput"] > 0 and 0 <= res["success_rate"] <= 100
    assert ray.data.read_parquet(out).count() == 60


def test_batch_parse_from_directory(ray_session, tmp_path):
    src = str(tmp_path / "src")
    from b_pdf_parser_ray.fixtures import write_corpus

    write_corpus(src, 40, docs_per_file=20)
    res = batch_parse_from_directory(src, max_files=1)
    assert res["total"] == 20
    with pytest.raises(FileNotFoundError):
        batch_parse_from_directory(str(tmp_path / "empty_missing_dir_x"))
