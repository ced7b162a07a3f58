"""The extraction stage: a stateful callable class for ``map_batches``.

Maps the reference's per-file parse flow (``pdfparser/batch.py:134-181``,
``pymupdf_parser.py:50-91``) onto a Ray Data actor pool: patterns and the
strategy registry are bound once per actor (``__init__`` — the reference's
per-worker warm state T1/T2, SURVEY.md §2.5), batches of documents flow
through ``__call__`` as zero-copy Arrow tables.

Scale notes (100 TB design):
* Arrow in / Arrow out; the only per-row Python is the parse kernel itself,
  which is inherently per-document (a regex state machine over one text
  layer) — exactly the reference's hot loop, minus its IPC pickling.
* Span rendering is vectorized: one ``flatten`` of the list column per
  batch, numpy offset slicing per row, no per-span Python objects on the
  sorted fast path.
* ``out_spans`` is ZERO-COPY when input spans are already offset-sorted
  (the common case): the input Arrow list column is passed through.
* Poison documents become ``error`` rows, never job failures
  (reference batch.py:183-189 behavior).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from .. import kernel
from ..model import (
    EXTRACTED_SCHEMA,
    METADATA_TYPE,
    SPAN_TYPE,
    TRANSACTION_TYPE,
    VERIFICATION_TYPE,
)

_EMPTY_METADATA = dict.fromkeys(
    (f.name for f in METADATA_TYPE), ""
)

# RE2 twins of the kernel's line classifiers (kernel.py RX_*), applied to
# EVERY stripped line of a batch in one Arrow pass per pattern.  RE2's \d
# and \s are ASCII-only while Python re's are Unicode-aware, so non-ASCII
# lines are reclassified with kernel.classify_line (the ground truth) —
# the mask is therefore bit-identical to per-line re.match.
_CLS_RE2 = (
    ("CLS_ANCHOR", r"^\d{2}/\d{2}/\d{2}\s+\d{2}:\d{2}:\d{2}"),
    ("CLS_NUMERIC", r"^[\d,.]+\s*$"),
)


def _classify_lines(stripped: "pa.Array") -> np.ndarray:
    """Vectorized ``kernel.classify_line`` over a flat line array."""
    import pyarrow.compute as pc

    n = len(stripped)
    cls = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return cls
    if stripped.null_count:
        stripped = pc.fill_null(stripped, "")
    for name, pat in _CLS_RE2:
        hit = pc.match_substring_regex(stripped, pat).to_numpy(
            zero_copy_only=False
        )
        cls |= np.where(hit, np.uint8(getattr(kernel, name)), np.uint8(0))
    ascii_ok = pc.string_is_ascii(stripped).to_numpy(zero_copy_only=False)
    if not ascii_ok.all():
        idx = np.flatnonzero(~ascii_ok)
        vals = stripped.take(pa.array(idx)).to_pylist()
        for j, s in zip(idx, vals):
            cls[j] = kernel.classify_line(s)
    return cls


def _verification_struct(v: Optional[Dict[str, object]]) -> Optional[Dict[str, object]]:
    if v is None:
        return None
    return {
        "passed": v["passed"],
        "status": v["status"],
        "message": v["message"],
        "debit_match": v["debit_match"],
        "credit_match": v["credit_match"],
        "total_debit_extracted": v["total_debit_extracted"],
        "total_debit_calculated": v["total_debit_calculated"],
        "debit_discrepancy": v["debit_discrepancy"],
        "total_credit_extracted": v["total_credit_extracted"],
        "total_credit_calculated": v["total_credit_calculated"],
        "credit_discrepancy": v["credit_discrepancy"],
    }


class Extractor:
    """Actor-pool batch extractor: documents(spans) → extracted records.

    Use with ``ds.map_batches(Extractor, batch_format="pyarrow",
    batch_size=B, concurrency=(m, n))``.  ``strategy`` is taken from an
    optional per-row ``strategy`` column (the reference's parser registry,
    ``batch.py:47-52``), falling back to the constructor default.
    """

    def __init__(self, default_strategy: str = "column", verify: bool = True):
        self.default_strategy = default_strategy
        self.verify = verify
        # Touch the kernel's compiled patterns so compile cost is paid here,
        # once per actor, not inside the first batch.
        kernel.RX_TXN_DATE_ANCHOR.match("")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").combine_chunks()
        if isinstance(spans_col, pa.ChunkedArray):  # single-chunk guarantee
            spans_col = spans_col.chunk(0)
        flat = spans_col.flatten()
        import pyarrow.compute as pc

        kind_arr = flat.field("kind")
        text_flat = flat.field("text")
        is_text = pc.equal(kind_arr, "text").to_numpy(zero_copy_only=False)
        # span texts are single lines in the span model; if any embeds a
        # newline, fall back to join+split so line semantics match rendering
        texts_are_lines = not pc.any(pc.match_substring(text_flat, "\n")).as_py()
        offsets = flat.field("offset").to_numpy(zero_copy_only=False)
        row_offsets = spans_col.offsets.to_numpy(zero_copy_only=False)

        strategies = (
            batch.column("strategy").to_pylist()
            if "strategy" in batch.column_names
            else [self.default_strategy] * n
        )

        all_sorted = bool(np.all(offsets[1:] >= offsets[:-1])) if len(offsets) else True

        # Per-document text assembly in Arrow C, not Python: filter the flat
        # text spans, regroup with prefix-sum offsets, join with \n — one
        # materialized string per DOCUMENT instead of one per span (the
        # per-span to_pylist + per-row join/strip was as expensive as the
        # parse itself).  The stripped variant feeds the kernel's line list
        # via one C split per row.
        text_mask = pa.array(is_text)
        text_counts_prefix = np.concatenate(
            ([0], np.cumsum(is_text, dtype=np.int64))
        )[row_offsets]
        kept_text = text_flat.filter(text_mask)
        raw_rows = pa.ListArray.from_arrays(
            pa.array(text_counts_prefix, type=pa.int32()), kept_text
        )
        full_texts = pc.binary_join(raw_rows, "\n").to_pylist()
        stripped_flat = pc.utf8_trim_whitespace(kept_text)
        stripped_rows = pa.ListArray.from_arrays(
            pa.array(text_counts_prefix, type=pa.int32()), stripped_flat
        )
        stripped_texts = pc.binary_join(stripped_rows, "\n").to_pylist()
        # per-line class bitmask for the WHOLE batch in 2 Arrow passes —
        # replaces the per-line Python re.match calls of the kernel state
        # machine's every-line scans (anchor + description-break); one
        # tolist so the per-row handoff is a cheap list slice
        line_cls_flat = _classify_lines(stripped_flat).tolist()

        texts: Optional[List] = None  # per-span list, built only if needed

        metadata_out: List[Optional[Dict]] = []
        txns_out: List[Optional[List[Dict]]] = []
        valid_out: List[bool] = []
        verify_out: List[Optional[Dict]] = []
        n_spans_out: List[int] = []
        n_chars_out: List[int] = []
        error_out: List[Optional[str]] = []
        rebuilt_spans: Optional[List] = None  # only allocated on unsorted input

        for i in range(n):
            lo, hi = int(row_offsets[i]), int(row_offsets[i + 1])
            row_sorted = all_sorted or bool(
                np.all(offsets[lo + 1 : hi] >= offsets[lo : hi - 1])
            )
            if row_sorted:
                text = full_texts[i]
                row_lines = stripped_texts[i].split("\n") if text else []
            else:
                if texts is None:
                    texts = text_flat.to_pylist()
                order = lo + np.argsort(offsets[lo:hi], kind="stable")
                line_idx = [int(j) for j in order if is_text[j]]
                text = "\n".join(texts[j] for j in line_idx)
                row_lines = (
                    [texts[j].strip() for j in line_idx] if texts_are_lines else []
                )
                if rebuilt_spans is None:
                    rebuilt_spans = [None] * n
                rebuilt_spans[i] = [
                    {
                        "kind": kind_arr[j].as_py(),
                        "text": texts[j],
                        "media_ref": flat.field("media_ref")[j].as_py(),
                        "offset": int(offsets[j]),
                    }
                    for j in (int(j) for j in order)
                ]
            n_spans_out.append(hi - lo)
            try:
                n_chars_out.append(len(text))
                use_lines = texts_are_lines or not text
                res = kernel.parse_document(
                    doc_ids[i],
                    text,
                    strategy=strategies[i],
                    verify=self.verify,
                    # span texts ARE the lines — skip the kernel's re-split
                    lines=row_lines if use_lines else None,
                    # the flat mask aligns with row_lines only on the sorted
                    # path with a non-empty text (row_lines == flat slice)
                    line_cls=(
                        line_cls_flat[
                            text_counts_prefix[i]:text_counts_prefix[i + 1]
                        ]
                        if (row_sorted and use_lines and text)
                        else None
                    ),
                )
                md = dict(_EMPTY_METADATA)
                md.update(res["metadata"])
                metadata_out.append(md)
                txns_out.append(res["transactions"])
                valid_out.append(bool(res["is_valid"]))
                verify_out.append(_verification_struct(res.get("verification")))
                error_out.append(None)
            except Exception as exc:  # poison document → error row
                if len(n_chars_out) < len(n_spans_out):
                    n_chars_out.append(0)
                metadata_out.append(None)
                txns_out.append(None)
                valid_out.append(False)
                verify_out.append(None)
                error_out.append(f"{type(exc).__name__}: {exc}")

        if rebuilt_spans is None:
            out_spans = spans_col.cast(pa.list_(SPAN_TYPE))
        else:
            base = spans_col.to_pylist()
            merged = [
                rebuilt_spans[i] if rebuilt_spans[i] is not None else base[i]
                for i in range(n)
            ]
            out_spans = pa.array(merged, type=pa.list_(SPAN_TYPE))

        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(metadata_out, type=METADATA_TYPE),
                pa.array(txns_out, type=pa.list_(TRANSACTION_TYPE)),
                pa.array(valid_out, type=pa.bool_()),
                pa.array(verify_out, type=VERIFICATION_TYPE),
                out_spans,
                pa.array(n_spans_out, type=pa.int32()),
                pa.array(n_chars_out, type=pa.int64()),
                pa.array(error_out, type=pa.string()),
            ],
            schema=EXTRACTED_SCHEMA,
        )


class TextExtractor:
    """Extraction over a plain ``text`` column (no spans) — the shape of the
    driver testdata ``documents`` table and of any corpus whose text layer is
    already rendered.  Same kernel, same output minus span columns."""

    def __init__(self, default_strategy: str = "column", verify: bool = True):
        self.default_strategy = default_strategy
        self.verify = verify

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        n_chars = pc.cast(
            pc.fill_null(pc.utf8_length(batch.column("text")), 0), pa.int64()
        )
        strategies = (
            batch.column("strategy").to_pylist()
            if "strategy" in batch.column_names
            else [self.default_strategy] * batch.num_rows
        )
        metadata_out, txns_out, valid_out, verify_out, error_out = [], [], [], [], []
        for doc_id, text, strategy in zip(doc_ids, texts, strategies):
            try:
                res = kernel.parse_document(
                    doc_id, text or "", strategy=strategy, verify=self.verify
                )
                md = dict(_EMPTY_METADATA)
                md.update(res["metadata"])
                metadata_out.append(md)
                txns_out.append(res["transactions"])
                valid_out.append(bool(res["is_valid"]))
                verify_out.append(_verification_struct(res.get("verification")))
                error_out.append(None)
            except Exception as exc:
                metadata_out.append(None)
                txns_out.append(None)
                valid_out.append(False)
                verify_out.append(None)
                error_out.append(f"{type(exc).__name__}: {exc}")
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(metadata_out, type=METADATA_TYPE),
                pa.array(txns_out, type=pa.list_(TRANSACTION_TYPE)),
                pa.array(valid_out, type=pa.bool_()),
                pa.array(verify_out, type=VERIFICATION_TYPE),
                n_chars,
                pa.array(error_out, type=pa.string()),
            ],
            names=["doc_id", "metadata", "transactions", "is_valid",
                   "verification", "n_chars", "error"],
        )
