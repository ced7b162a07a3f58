"""Arrow data model for the interleaved-span document corpus.

Input shape (BASELINE.json ``input_hint``)::

    documents: doc_id:string,
               spans:list<struct<kind:string, text:string,
                                 media_ref:string, offset:int32>>

``kind='text'`` spans carry one extracted text line each (the way the
reference backends linearize a PDF page: one positioned Tj span per line,
SURVEY.md §1.2); ``kind='media'`` spans stand in for image XObjects
(``/ImN Do``) and must survive to the output at their offsets.

The production sink format is Lance; this sandbox has no lance wheel, so all
readers/writers speak Parquet with identical schemas (Lance and Parquet share
the Arrow type system — swapping ``read_parquet``/``write_parquet`` for
``read_lance``/``write_lance`` is a one-line change in ``sources``/``sinks``).
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

METADATA_TYPE = pa.struct(
    [
        ("account_no", pa.string()),
        ("business_unit", pa.string()),
        ("product_name", pa.string()),
        ("statement_date", pa.string()),
        ("valuta", pa.string()),
        ("unit_address", pa.string()),
        ("transaction_period", pa.string()),
        ("total_debit", pa.string()),
        ("total_credit", pa.string()),
        ("opening_balance", pa.string()),
        ("closing_balance", pa.string()),
    ]
)

TRANSACTION_TYPE = pa.struct(
    [
        ("date", pa.string()),
        ("description", pa.string()),
        ("user", pa.string()),
        ("debit", pa.string()),
        ("credit", pa.string()),
        ("balance", pa.string()),
    ]
)

# full field set of the reference verification dict (utils.py:763-775) —
# debit_match/credit_match/message included so the columnar output loses
# nothing vs the reference's per-file result
VERIFICATION_TYPE = pa.struct(
    [
        ("passed", pa.bool_()),
        ("status", pa.string()),
        ("message", pa.string()),
        ("debit_match", pa.bool_()),
        ("credit_match", pa.bool_()),
        ("total_debit_extracted", pa.string()),
        ("total_debit_calculated", pa.float64()),
        ("debit_discrepancy", pa.float64()),
        ("total_credit_extracted", pa.string()),
        ("total_credit_calculated", pa.float64()),
        ("credit_discrepancy", pa.float64()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("metadata", METADATA_TYPE),
        ("transactions", pa.list_(TRANSACTION_TYPE)),
        ("is_valid", pa.bool_()),
        ("verification", VERIFICATION_TYPE),
        ("out_spans", pa.list_(SPAN_TYPE)),
        ("n_spans", pa.int32()),
        ("n_chars", pa.int64()),
        ("error", pa.string()),
    ]
)

ALL_METADATA_KEYS = tuple(f.name for f in METADATA_TYPE)


def render_text(spans: List[Dict]) -> str:
    """Render a document's text layer: kind='text' spans joined by newline in
    offset order (SURVEY.md §1.3 'page text / full text').

    Spans arrive offset-sorted from the fixture writer, but order is
    re-established here because block order is never a correctness carrier
    at scale (SURVEY.md §7 hard part 3).
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    return "\n".join(s["text"] for s in ordered if s["kind"] == "text")


def output_spans(spans: List[Dict]) -> List[Dict]:
    """The north rule's output span sequence: the input spans, offset-sorted,
    with (kind, text, media_ref, offset) preserved — media spans reappear
    unchanged at their offsets."""
    return [
        {
            "kind": s["kind"],
            "text": s["text"],
            "media_ref": s["media_ref"],
            "offset": s["offset"],
        }
        for s in sorted(spans, key=lambda s: s["offset"])
    ]
