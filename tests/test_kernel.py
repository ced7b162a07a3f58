"""Kernel unit tests: golden literals, reference parity, property-based fuzz.

Mirrors the reference's test strategy (SURVEY.md §5,
/root/reference/tests/test_utils.py): exact-value assertions on literal
Indonesian/English strings, edge cases, hypothesis no-crash fuzz, plus a
parity sweep against the reference implementation over the full fixture
corpus grammar.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from b_pdf_parser_ray import fixtures, kernel, model

# ---------------------------------------------------------------------------
# Golden literals (exact values, reference tests/test_utils.py:264-429)
# ---------------------------------------------------------------------------

HEADER = (
    "No. Rekening\nAccount No\n: 0419010015483\n"
    "Unit Kerja\nBusiness Unit\n:\nKC Kalimalang\n"
    "Nama Produk\nProduct Name : Giro Umum-IDR\n"
    "Statement Date : 08/12/23\n"
    "Valuta\nCurrency\n: IDR\n"
    "Periode Transaksi\nTransaction Period\n:\n01/11/23 - 30/11/23\n"
    "Alamat Unit Kerja\n:\nJl. Kalimalang Blok C3 No.6\n"
)


def test_metadata_golden():
    md = kernel.extract_metadata(HEADER)
    assert md == {
        "account_no": "0419010015483",
        "business_unit": "KC Kalimalang",
        "product_name": "Giro Umum",
        "statement_date": "08/12/23",
        "valuta": "IDR",
        "unit_address": "Jl. Kalimalang Blok C3 No.6",
        "transaction_period": "01/11/23 - 30/11/23",
    }


def test_metadata_empty_and_label_filter():
    assert kernel.extract_metadata("") == dict.fromkeys(kernel.METADATA_KEYS, "")
    # a value that equals a known label phrase is treated as empty
    text = "Nama Produk\nProduct Name : Teller\n"
    assert kernel.extract_metadata(text)["product_name"] == ""


def test_transactions_with_user_id():
    text = (
        "03/11/23 04:14:59\n"
        "NBMB UJANG SUMARWAN TRSF\n"
        "ESB NBMB ref FA sixty\n"
        "8888083\n0.00\n25,000.00\n269,897,497.00\n"
    )
    txns = kernel.extract_transactions(text)
    assert txns == [
        {
            "date": "03/11/23 04:14:59",
            "description": "NBMB UJANG SUMARWAN TRSF ESB NBMB ref FA sixty",
            "user": "8888083",
            "debit": "0.00",
            "credit": "25,000.00",
            "balance": "269,897,497.00",
        }
    ]


def test_transactions_without_user_id():
    text = "03/11/23 04:14:59\nInterest on Account\n0.00\n25,000.00\n1,000.00\n"
    txns = kernel.extract_transactions(text)
    assert txns[0]["user"] == ""
    assert txns[0]["debit"] == "0.00"
    assert txns[0]["balance"] == "1,000.00"


def test_transactions_fallback_branch():
    # next field is neither user-id nor amount → kept as user, empty amounts
    text = "03/11/23 04:14:59\nSOME DESC\nWEIRD FIELD X\n"
    # 'WEIRD FIELD X' is a description line (non-numeric), so desc absorbs it;
    # EOF after description drops the row entirely (utils.py:300-301)
    assert kernel.extract_transactions(text) == []
    # a non-numeric non-amount line *after* a numeric desc-stop:
    text2 = "03/11/23 04:14:59\nDESC\n99\nNOT A NUMBER\n"
    txns = kernel.extract_transactions(text2)
    assert txns == [
        {
            "date": "03/11/23 04:14:59",
            "description": "DESC",
            "user": "99",
            "debit": "",
            "credit": "",
            "balance": "",
        }
    ]


def test_transactions_eight_digit_ambiguity():
    # 8-digit integer reads as user id, shifting fields (utils.py:303-310)
    text = "03/11/23 04:14:59\nDESC\n12345678\n1,000.00\n2,000.00\n"
    txns = kernel.extract_transactions(text)
    assert txns[0]["user"] == "12345678"
    assert txns[0]["debit"] == "1,000.00"
    assert txns[0]["credit"] == "2,000.00"
    assert txns[0]["balance"] == ""


def test_transactions_truncated_drops_partial_row():
    text = "03/11/23 04:14:59\nDESC ONLY\n"
    assert kernel.extract_transactions(text) == []


def test_summary_block_positional_zip():
    text = (
        "Saldo Awal\nTotal Transaksi Debet\nTotal Transaksi Kredit\nSaldo Akhir\n"
        "Opening Balance\nTotal Debit Transaction\nTotal Credit Transaction\n"
        "Closing Balance\n"
        "269,872,497.00\n47,104.00\n28,105,461.00\n297,930,854.00\n"
    )
    totals = kernel.extract_summary_totals(text)
    assert totals == {
        "opening_balance": "269,872,497.00",
        "total_debit": "47,104.00",
        "total_credit": "28,105,461.00",
        "closing_balance": "297,930,854.00",
    }


def test_summary_inline_fallback():
    # reference tests/test_utils.py:267-309 literal
    text = "Total Transaksi Debet: 1.234.567,89\nTotal Transaksi Kredit: 500,00\n"
    totals = kernel.extract_summary_totals(text)
    assert totals["total_debit"] == "1.234.567,89"
    assert totals["total_credit"] == "500,00"
    assert totals["opening_balance"] is None


def test_number_parsing_golden():
    assert kernel.parse_indonesian_number("1.000.000,00") == 1000000.0
    assert kernel.parse_indonesian_number("123,45") == 123.45
    assert kernel.parse_indonesian_number("") == 0.0
    assert kernel.parse_indonesian_number("abc") == 0.0
    assert kernel.format_number_for_csv("1.234.567,89") == "1234567.89"
    assert kernel.format_number_for_csv("1,234,567.89") == "1234567.89"
    assert kernel.format_number_for_csv("1,000,000") == "1000000"
    assert kernel.format_number_for_csv("no digits") == "no digits"
    assert kernel.format_number_for_csv("") == ""


def test_debit_credit_sums():
    txns = [
        {"debit": "100.000,25", "credit": ""},
        {"debit": "200.000,25", "credit": "50,50"},
    ]
    assert kernel.debit_sum(txns) == pytest.approx(300000.50)
    assert kernel.credit_sum(txns) == pytest.approx(50.50)


def test_is_valid_parse():
    md = {"account_no": "123", "valuta": "IDR"}
    txns = [{"date": "d", "balance": "b"}]
    assert kernel.is_valid_parse(md, txns)
    assert not kernel.is_valid_parse({"account_no": "123"}, txns)
    assert not kernel.is_valid_parse(md, [])
    assert not kernel.is_valid_parse(md, [{"date": "d", "balance": ""}])


def test_verify_turnover_statuses():
    txns = [{"debit": "1,000.00", "credit": "0.00"}]
    ok = kernel.verify_turnover(
        txns,
        summary_text="Total Transaksi Debet: 1,00000\nTotal Transaksi Kredit: 0,00\n",
    )
    assert ok["status"] == "passed" and ok["passed"]
    bad = kernel.verify_turnover(
        txns,
        summary_text="Total Transaksi Debet: 9,99\nTotal Transaksi Kredit: 0,00\n",
    )
    assert bad["status"] == "failed"
    # a lone debit total (credit absent) can never pass — credit_match stays
    # False while status isn't not_available (utils.py:747-761 fidelity)
    lone = kernel.verify_turnover(txns, summary_text="Total Transaksi Debet: 1,00000\n")
    assert lone["status"] == "failed"
    na = kernel.verify_turnover(txns, summary_text="nothing here")
    assert na["status"] == "not_available"


def test_filename_account_fallback():
    assert kernel.account_no_from_name("stmt_0419010015483_0000001") == "0419010015483"
    assert kernel.account_no_from_name("short_123") == ""


# ---------------------------------------------------------------------------
# Reference parity over the full fixture grammar
# ---------------------------------------------------------------------------

N_PARITY_DOCS = 400


def test_reference_parity_full_sweep(reference):
    ref_u, ref_p = reference.utils, reference.plumber
    for i in range(N_PARITY_DOCS):
        doc = fixtures.make_document(i)
        text = model.render_text(doc["spans"])
        assert kernel.extract_metadata(text) == ref_u.extract_metadata(text), i
        assert kernel.extract_transactions(text) == ref_u.extract_transactions(text), i
        assert kernel.extract_summary_totals(text) == ref_u.extract_summary_totals(text), i
        assert kernel.extract_transactions_inline(text) == ref_p.extract_transactions_inline(text), i
        assert kernel.extract_metadata_indonesian(text) == ref_p.extract_metadata_pdfplumber(text), i
        txns = (
            kernel.extract_transactions_inline(text)
            if doc["strategy"] == "inline"
            else kernel.extract_transactions(text)
        )
        assert kernel.verify_turnover(txns, summary_text=text) == ref_u.verify_turnover(
            txns, summary_text=text
        ), i


def test_reference_parity_numbers(reference):
    cases = [
        "1.234.567,89", "1,234,567.89", "1,000,000", "123,45", "0.00", "", " ",
        "abc", "12.34", "1.2.3,4", "100.5", "25,000.00", "1.2,3.4", ",,..",
    ]
    for c in cases:
        assert kernel.parse_indonesian_number(c) == reference.utils.parse_indonesian_number(c), c
        assert kernel.format_number_for_csv(c) == reference.utils._format_number_for_csv(c), c


def test_fixture_family_expectations():
    """Each family lands in its designed verification/validity bucket."""
    from collections import defaultdict

    seen = defaultdict(set)
    for i in range(N_PARITY_DOCS):
        doc = fixtures.make_document(i)
        text = model.render_text(doc["spans"])
        res = kernel.parse_document(doc["doc_id"], text, strategy=doc["strategy"])
        seen[doc["family"]].add((res["verification"]["status"], res["is_valid"]))
    assert seen["standard"] == {("passed", True)}
    assert seen["heavy"] == {("passed", True)}
    assert seen["inline"] == {("passed", True)}
    assert seen["indonesian"] == {("passed", True)}
    assert seen["mismatch"] == {("failed", True)}
    assert seen["ambiguous"] == {("failed", True)}
    assert seen["no_summary"] == {("not_available", True)}
    assert seen["truncated"] == {("not_available", False)}


def test_account_fallback_used_when_header_omits_it():
    found = 0
    for i in range(N_PARITY_DOCS):
        doc = fixtures.make_document(i)
        if "_" in doc["doc_id"] and len(doc["doc_id"].split("_")) == 3:
            text = model.render_text(doc["spans"])
            res = kernel.parse_document(doc["doc_id"], text, strategy=doc["strategy"])
            assert res["metadata"]["account_no"] == doc["doc_id"].split("_")[1]
            found += 1
    assert found > 0


# ---------------------------------------------------------------------------
# Property-based fuzz (reference tests/test_utils.py:27-197)
# ---------------------------------------------------------------------------

TEXT_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 \n:.,-/"


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=TEXT_ALPHABET, max_size=2000))
def test_extractors_never_crash(text):
    md = kernel.extract_metadata(text)
    assert isinstance(md, dict) and all(isinstance(v, str) for v in md.values())
    txns = kernel.extract_transactions(text)
    assert isinstance(txns, list)
    for t in txns:
        assert set(t) == set(kernel.TXN_KEYS)
        assert all(isinstance(v, str) for v in t.values())
    totals = kernel.extract_summary_totals(text)
    assert set(totals) == set(kernel.SUMMARY_KEYS)
    kernel.extract_transactions_inline(text)
    kernel.extract_metadata_indonesian(text)
    kernel.verify_turnover(txns, summary_text=text)
    kernel.is_valid_parse(md, txns)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=TEXT_ALPHABET, max_size=2000))
def test_fuzz_parity_with_reference(reference, text):
    assert kernel.extract_metadata(text) == reference.utils.extract_metadata(text)
    assert kernel.extract_transactions(text) == reference.utils.extract_transactions(text)
    assert kernel.extract_summary_totals(text) == reference.utils.extract_summary_totals(text)


@settings(max_examples=50, deadline=None)
@given(st.from_regex(r"\d{2}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}", fullmatch=True))
def test_date_anchor_always_anchors(date):
    assert kernel.RX_TXN_DATE_ANCHOR.match(date)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="0123456789.,", min_size=1, max_size=20))
def test_number_fuzz_parity(reference, s):
    assert kernel.parse_indonesian_number(s) == reference.utils.parse_indonesian_number(s)
    assert kernel.format_number_for_csv(s) == reference.utils._format_number_for_csv(s)


def test_vectorized_line_classes_match_python():
    """The extractor's Arrow-RE2 line-class mask must equal
    ``kernel.classify_line`` per line — including the unicode corners
    where RE2 (\\d/\\s ASCII-only) and Python re (unicode-aware) differ,
    which the ASCII-gated fallback reclassifies."""
    import numpy as np
    import pyarrow as pa

    from b_pdf_parser_ray.stages.extract import _classify_lines

    lines = [
        "", "12/04/25 10:11:12", "12/04/25  rest", "12/04/25",
        "1,234.56", "12345678", "1234567", ",,..", "123,456.78",
        "abc", "12/04/2510:11:12", "12.04.25 10:11:12",
        "١٢/٠٤/٢٥ ١٠:١١:١٢",      # arabic-indic digits: re \d matches, RE2 \d doesn't
        "12/04/25 10:11:12",  # NBSP: re \s matches, RE2 \s doesn't
        "1,2,3.", "42", "0" * 200,
    ]
    got = _classify_lines(pa.array(lines, type=pa.string()))
    want = np.array([kernel.classify_line(s) for s in lines], dtype=np.uint8)
    assert got.tolist() == want.tolist()

    @given(st.lists(st.text(max_size=24), max_size=30))
    @settings(max_examples=60, deadline=None)
    def fuzz(ls):
        ls = [s.strip() for s in ls]
        # the extractor feeds newline-free stripped lines
        ls = [s.replace("\n", " ").replace("\r", " ") for s in ls]
        g = _classify_lines(pa.array(ls, type=pa.string()))
        w = [kernel.classify_line(s) for s in ls]
        assert g.tolist() == w

    fuzz()
