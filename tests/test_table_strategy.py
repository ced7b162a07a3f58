"""Table strategy (kernel M4, pdfplumber_parser.py:145-178) + strategy registry."""

import pyarrow as pa
import ray.data

from b_pdf_parser_ray import kernel
from b_pdf_parser_ray.fixtures import CORPUS_SCHEMA, make_table_document
from b_pdf_parser_ray.model import render_text
from b_pdf_parser_ray.pipelines.flagship import extract_documents


def test_registry_has_all_strategies():
    assert set(kernel.TRANSACTION_STRATEGIES) == {
        "column", "inline", "indonesian", "table"
    }


def test_table_rows_parse_with_header_skip():
    text = "\n".join([
        "Tanggal\tUraian\tTeller\tDebet\tKredit\tSaldo",           # header: skipped
        "01/02/23 10:00:00\tPAYMENT\t123456\t1,000.00\t0.00\t5,000.00",
        "bad row without tabs",
        "02/02/23 11:00:00\tREFUND\t654321\t0.00\t2,000.00\t7,000.00",
    ])
    rows = kernel.extract_transactions_table(text)
    assert [r["date"] for r in rows] == ["01/02/23 10:00:00", "02/02/23 11:00:00"]
    assert rows[0]["debit"] == "1,000.00" and rows[1]["credit"] == "2,000.00"


def test_blank_line_starts_new_table_header():
    text = "\n".join([
        "H1\tH2\tH3\tH4\tH5\tH6",
        "01/02/23 10:00:00\tA\t1\t1.00\t0.00\t2.00",
        "",
        # after the blank, this is a new table's HEADER → must be skipped
        "02/02/23 10:00:00\tB\t2\t1.00\t0.00\t2.00",
        "03/02/23 10:00:00\tC\t3\t1.00\t0.00\t2.00",
    ])
    rows = kernel.extract_transactions_table(text)
    assert [r["description"] for r in rows] == ["A", "C"]


def test_non_date_and_short_rows_dropped():
    text = "\n".join([
        "header\t\t\t\t\t",
        "not-a-date\tX\t1\t1.00\t0.00\t2.00",
        "01/02/23 10:00:00\tonly\tfour\tcells",
    ])
    assert kernel.extract_transactions_table(text) == []


def test_table_document_end_to_end():
    doc = make_table_document(7)
    res = kernel.parse_document(
        doc["doc_id"], render_text(doc["spans"]), strategy="table", verify=True
    )
    assert res["is_valid"]
    assert len(res["transactions"]) >= 5
    assert res["verification"]["status"] == "passed"
    assert res["metadata"]["valuta"] == "IDR"


def test_table_strategy_through_ray_stage(ray_session):
    docs = [make_table_document(i) for i in range(20)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs, schema=CORPUS_SCHEMA))
    out = extract_documents(ds).to_pandas()
    assert len(out) == 20
    assert out["is_valid"].all()
    statuses = {v["status"] for v in out["verification"]}
    assert statuses == {"passed"}
