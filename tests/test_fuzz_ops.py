"""Property/fuzz tests for the newer operators (SURVEY.md §5 pattern:
extractors always return well-shaped values and never crash on junk)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from b_pdf_parser_ray import kernel
from b_pdf_parser_ray.functions.html import segment_blocks, strip_boilerplate
from b_pdf_parser_ray.functions.dedup import shingle_hashes, ngram_jaccard

TXN_KEYS = {"date", "description", "user", "debit", "credit", "balance"}


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=2000))
def test_table_extractor_total(text):
    rows = kernel.extract_transactions_table(text)
    assert isinstance(rows, list)
    for r in rows:
        assert set(r) == TXN_KEYS
        assert all(isinstance(v, str) for v in r.values())


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=2000))
def test_html_strip_total(html):
    res = strip_boilerplate(html)
    offs = [s["offset"] for s in res["spans"]]
    assert offs == sorted(offs)
    for s in res["spans"]:
        if s["kind"] == "media":
            assert s["text"] == ""
        else:
            assert s["media_ref"] == ""
    assert res["n_content_blocks"] == len(res["spans"])
    assert len(segment_blocks(html)) == res["n_blocks"]


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=500), st.text(max_size=500))
def test_ngram_jaccard_bounds_and_symmetry(a, b):
    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a)
    assert ngram_jaccard(a, a) == 1.0


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=1000))
def test_shingle_hashes_deterministic_sorted_unique(text):
    import numpy as np

    h1, h2 = shingle_hashes(text), shingle_hashes(text)
    assert np.array_equal(h1, h2)
    assert len(set(h1.tolist())) == len(h1)


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=2000), st.sampled_from(["column", "inline", "indonesian", "table"]))
def test_parse_document_total_any_strategy(text, strategy):
    res = kernel.parse_document("fuzz_doc", text, strategy=strategy, verify=True)
    assert set(res) == {"metadata", "transactions", "is_valid", "verification"}
    assert isinstance(res["is_valid"], bool)
    assert res["verification"]["status"] in {"passed", "failed", "not_available"}
