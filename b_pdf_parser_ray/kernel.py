"""Pure-Python extraction kernel: the reference's bank-statement semantics.

This module is the single behavioral core of the engine. It has NO Ray
dependency — it operates on plain strings and returns plain Python values —
so it can be unit/property-tested exhaustively and then wrapped into Ray Data
``map_batches`` stages (see ``stages/extract.py``).

Semantics reproduced from the reference (``/root/reference/``), re-implemented
from scratch:

* metadata label/value extraction ......... ``pdfparser/utils.py:144-234``
* column-format transaction state machine . ``pdfparser/utils.py:237-360``
* inline transaction extraction ........... ``pdfparser/pdfplumber_parser.py:85-142``
* Indonesian-label metadata variant ....... ``pdfparser/pdfplumber_parser.py:33-82``
* summary-totals positional zip ........... ``pdfparser/utils.py:551-649``
* number normalization .................... ``pdfparser/utils.py:363-425, 527-548``
* validity predicate ...................... ``pdfparser/utils.py:484-509``
* turnover reconciliation ................. ``pdfparser/utils.py:652-775``
* filename account-number fallback ........ ``pdfparser/pymupdf_parser.py:60-71``
* summary→metadata merge .................. ``pdfparser/pymupdf_parser.py:80-89``

All patterns are compiled once at import time; each Ray worker process pays
the compile cost exactly once (the reference's T1 state, ``utils.py:18-93``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

# ---------------------------------------------------------------------------
# Compiled patterns (the regexes ARE the spec — see reference utils.py:23-93)
# ---------------------------------------------------------------------------

RX_ACCOUNT_NO = re.compile(
    r"No\.?\s*Rekening\s*\n(?:Account\s+No\s*\n)?\s*:?\s*([0-9]+)", re.IGNORECASE
)
RX_BUSINESS_UNIT = re.compile(
    r"(?:Unit\s+Kerja\s*\n)?Business\s+Unit\s*\n\s*:\s*\n\s*([^\n]+)", re.IGNORECASE
)
RX_PRODUCT_NAME = re.compile(
    r"(?:Nama\s+Produk\s*\n)?Product\s+Name\s*[:\s]*"
    r"([A-Za-z0-9]+(?:\s+[A-Za-z0-9]+)*(?:\.[A-Za-z]+)?)",
    re.IGNORECASE,
)
RX_STATEMENT_DATE = re.compile(r"Statement\s+Date\s*[:\s]*([^\n]+)", re.IGNORECASE)
RX_VALUTA = re.compile(
    r"(?:Valuta|Currency)\s*\n(?:Currency|Valuta)?\s*\n\s*:?\s*([A-Z]{3})", re.IGNORECASE
)
RX_TXN_PERIOD = re.compile(
    r"(?:Periode\s+Transaksi|Transaction\s+Period)\s*\n"
    r"(?:Transaction\s+Periode|Transaction\s+Period)?\s*\n\s*:\s*\n\s*([^\n]+)",
    re.IGNORECASE,
)
RX_UNIT_ADDRESS = re.compile(
    r"(?:Alamat\s+Unit\s+Kerja|Business\s+Unit\s+Address)\s*\n\s*:\s*\n"
    r"\s*([A-Za-z][^\n]*(?:\s+[A-Za-z][^\n]*)?)",
    re.IGNORECASE,
)

# Transaction anchors / field classifiers (reference utils.py:47-75)
RX_TXN_DATE_ANCHOR = re.compile(r"^\d{2}/\d{2}/\d{2}\s+\d{2}:\d{2}:\d{2}")
RX_DATE_PREFIX = re.compile(r"^(\d{2}/\d{2}/\d{2})")
RX_TXN_INLINE = re.compile(
    r"^(\d{2}/\d{2}/\d{2})\s+(.+?)\s+(\w+)\s+([\d,.]+)?\s+([\d,.]+)?\s+([\d,.]+)"
)
RX_WS = re.compile(r"\s+")
RX_NUMERIC_LINE = re.compile(r"^[\d,.]+\s*$")
RX_NUMERIC_ONLY = re.compile(r"^[\d,.]*$")
RX_AMOUNT = re.compile(r"^[\d,]+\.\d{2}$")
RX_USER_ID = re.compile(r"^\d{6,8}$")

# Summary labels — exact-line, bilingual (reference utils.py:78-93)
RX_OPENING = re.compile(r"^Saldo\s+Awal$|^Opening\s+Balance$", re.IGNORECASE)
RX_TOTAL_DEBIT = re.compile(
    r"^Total\s+Transaksi\s+Debet$|^Total\s+Debit\s+Transaction$", re.IGNORECASE
)
RX_TOTAL_CREDIT = re.compile(
    r"^Total\s+Transaksi\s+Kredit$|^Total\s+Credit\s+Transaction$", re.IGNORECASE
)
RX_CLOSING = re.compile(r"^Saldo\s+Akhir$|^Closing\s+Balance$", re.IGNORECASE)
SUMMARY_LABELS = (
    (RX_OPENING, "opening_balance"),
    (RX_TOTAL_DEBIT, "total_debit"),
    (RX_TOTAL_CREDIT, "total_credit"),
    (RX_CLOSING, "closing_balance"),
)

# Inline summary fallbacks (reference utils.py:57-68) — debit/credit only.
RX_INLINE_DEBIT = (
    re.compile(r"Total\s+Transaksi\s+Debet\s*[:\s]*([\d\.,]+)", re.IGNORECASE),
    re.compile(r"Total\s+Debit\s+Transaction\s*[:\s]*([\d\.,]+)", re.IGNORECASE),
)
RX_INLINE_CREDIT = (
    re.compile(r"Total\s+Transaksi\s+Kredit\s*[:\s]*([\d\.,]+)", re.IGNORECASE),
    re.compile(r"Total\s+Credit\s+Transaction\s*[:\s]*([\d\.,]+)", re.IGNORECASE),
)

# Indonesian single-line metadata variant (reference pdfplumber_parser.py:27-30)
RX_ID_ACCOUNT = re.compile(r"No\.\s*Rekening\s*:\s*([^\n]+)", re.IGNORECASE)
RX_ID_BUSINESS = re.compile(r"Unit\s*Kerja\s*:\s*([^\n]+)", re.IGNORECASE)
RX_ID_PRODUCT = re.compile(r"Nama\s*Produk\s*:\s*([^\n]+)", re.IGNORECASE)
RX_ID_DATE = re.compile(r"Tanggal\s*Laporan\s*:\s*([^\n]+)", re.IGNORECASE)

RX_FILENAME_ACCT = re.compile(r"(\d{10,16})")
RX_DATE_SHAPED = re.compile(r"^\d{4}-\d{2}-\d{2}$")

# Phrases that mark a captured value as "actually a label" (utils.py:156-183)
LABEL_PHRASES = frozenset(
    {
        "unit kerja",
        "nama produk",
        "alamat unit",
        "valuta",
        "currency",
        "tanggal transaksi",
        "uraian transaksi",
        "teller",
        "user id",
        "debet",
        "kredit",
        "saldo",
        "transaction date",
        "transaction description",
    }
)

METADATA_KEYS = (
    "account_no",
    "business_unit",
    "product_name",
    "statement_date",
    "valuta",
    "unit_address",
    "transaction_period",
)
SUMMARY_KEYS = ("total_debit", "total_credit", "opening_balance", "closing_balance")
TXN_KEYS = ("date", "description", "user", "debit", "credit", "balance")


def _looks_like_label(value: str) -> bool:
    return value.lower().strip() in LABEL_PHRASES


# ---------------------------------------------------------------------------
# Metadata
# ---------------------------------------------------------------------------


def extract_metadata(text: str) -> Dict[str, str]:
    """Header metadata: 7 fixed fields, '' when absent (utils.py:144-234).

    The label-likeness filter applies to account_no, product_name and
    unit_address only; unit_address is whitespace-squeezed; product_name has
    a trailing ``-IDR`` stripped.
    """
    m = RX_ACCOUNT_NO.search(text)
    account_no = m.group(1).strip() if m else ""
    if _looks_like_label(account_no):
        account_no = ""

    m = RX_BUSINESS_UNIT.search(text)
    business_unit = m.group(1).strip() if m else ""

    m = RX_PRODUCT_NAME.search(text)
    product_name = m.group(1).strip() if m else ""
    if _looks_like_label(product_name):
        product_name = ""
    if product_name.endswith("-IDR"):
        product_name = product_name[:-4]

    m = RX_STATEMENT_DATE.search(text)
    statement_date = m.group(1).strip() if m else ""

    m = RX_VALUTA.search(text)
    valuta = m.group(1).strip() if m else ""

    m = RX_UNIT_ADDRESS.search(text)
    if m:
        unit_address = RX_WS.sub(" ", m.group(1).strip())
        if _looks_like_label(unit_address):
            unit_address = ""
    else:
        unit_address = ""

    m = RX_TXN_PERIOD.search(text)
    transaction_period = m.group(1).strip() if m else ""

    return {
        "account_no": account_no,
        "business_unit": business_unit,
        "product_name": product_name,
        "statement_date": statement_date,
        "valuta": valuta,
        "unit_address": unit_address,
        "transaction_period": transaction_period,
    }


def extract_metadata_indonesian(text: str) -> Dict[str, str]:
    """Single-line Indonesian-label variant (pdfplumber_parser.py:33-82).

    Returns the 4-field subset; merges English values for still-empty keys
    when fewer than 2 Indonesian fields were found.
    """
    out = {
        "account_no": "",
        "business_unit": "",
        "product_name": "",
        "statement_date": "",
    }
    for key, rx in (
        ("account_no", RX_ID_ACCOUNT),
        ("business_unit", RX_ID_BUSINESS),
        ("product_name", RX_ID_PRODUCT),
        ("statement_date", RX_ID_DATE),
    ):
        m = rx.search(text)
        if m:
            out[key] = m.group(1).strip()

    if sum(1 for v in out.values() if v) < 2:
        english = extract_metadata(text)
        for key in out:
            if not out[key] and english.get(key):
                out[key] = english[key]
    return out


def account_no_from_name(stem: str) -> str:
    """Filename fallback: first 10-16 digit run, unless date-shaped
    (pymupdf_parser.py:60-71)."""
    m = RX_FILENAME_ACCT.search(stem)
    if m and not RX_DATE_SHAPED.match(m.group(1)):
        return m.group(1)
    return ""


# ---------------------------------------------------------------------------
# Transactions — column-format state machine
# ---------------------------------------------------------------------------


def _stripped_lines(text: str) -> List[str]:
    """One shared split+strip pass — every line-oriented extractor strips
    every line anyway, so parse_document computes this once per document."""
    return [l.strip() for l in text.split("\n")]


# Per-line class bitmask for the transaction state machine's EVERY-LINE
# scans (anchor detection + description-break).  Only these two classes are
# evaluated on every line, so only they are worth batch-vectorizing; the
# rare per-field classifiers (user-id/amount, ≤2 per transaction) stay as
# lazy re.match calls.  The extractor stage computes the mask over every
# line of a batch in one Arrow RE2 pass per pattern; non-ASCII lines are
# reclassified with this Python function because RE2's \d/\s are
# ASCII-only while re's are Unicode-aware — so the mask is bit-identical
# to per-line re.match everywhere.
CLS_ANCHOR, CLS_NUMERIC = 1, 2


def classify_line(line: str) -> int:
    """Ground-truth (Python ``re``) line classification; first-char
    prechecks only skip regexes that cannot match (both patterns require
    a leading ``\\d`` / ``[\\d,.]``, subsets of the precheck classes)."""
    if not line:
        return 0
    c0 = line[0]
    c = 0
    digit = c0.isdigit()
    if digit and RX_TXN_DATE_ANCHOR.match(line):
        c |= CLS_ANCHOR
    if (digit or c0 in ",.") and RX_NUMERIC_LINE.match(line):
        c |= CLS_NUMERIC
    return c


def extract_transactions(
    text: str = "",
    lines: Optional[List[str]] = None,
    cls=None,
) -> List[Dict[str, str]]:
    """Line-oriented transaction state machine (utils.py:237-360).
    ``lines``, when given, must be the pre-stripped line list
    (``_stripped_lines``); ``text`` is then ignored.  ``cls``, when given,
    must be the per-line ``classify_line`` bitmask aligned to ``lines``
    (the extractor stage precomputes it batch-vectorized).

    Behavioral contract (fidelity cases, see FIXTURES.md §2.3):
      * a row is anchored by ``DD/MM/YY HH:MM:SS`` at line start; the whole
        stripped line (date+time) is kept as ``date``
      * description lines accumulate until the next date anchor or a
        numeric-only line; blanks are dropped, parts joined with " "
      * EOF immediately after the description drops the partial row
      * the field after the description is classified user-id
        (``^\\d{6,8}$``) before amount (``^[\\d,]+\\.\\d{2}$``); an 8-digit
        integer therefore reads as a user id — intentional fidelity
      * the fallback branch (neither class) keeps the field as ``user`` and
        leaves debit/credit/balance empty, without consuming the line
      * subsequent debit/credit/balance are the next non-blank lines taken
        verbatim, '' at EOF
    """
    slines = _stripped_lines(text) if lines is None else lines
    n = len(slines)
    if cls is None:
        cls = [classify_line(s) for s in slines]
    elif not isinstance(cls, list):
        cls = cls.tolist()  # numpy slice → list (scalar indexing is faster)
    rows: List[Dict[str, str]] = []
    i = 0

    def skip_blank(j: int) -> int:
        while j < n and not slines[j]:
            j += 1
        return j

    while i < n:
        if not (cls[i] & CLS_ANCHOR):
            i += 1
            continue
        if not RX_DATE_PREFIX.match(slines[i]):  # anchor lines only (rare)
            i += 1
            continue
        date = slines[i]

        i += 1
        desc_parts: List[str] = []
        while i < n:
            if cls[i] & (CLS_ANCHOR | CLS_NUMERIC):
                break
            nxt = slines[i]
            if nxt:
                desc_parts.append(nxt)
            i += 1
        description = " ".join(desc_parts)

        i = skip_blank(i)
        if i >= n:
            break  # truncated document: partial row is dropped (utils.py:300-301)

        field = slines[i]
        if RX_USER_ID.match(field):
            user = field
            i = skip_blank(i + 1)
            debit = slines[i] if i < n else ""
            i = skip_blank(i + 1)
            credit = slines[i] if i < n else ""
            i = skip_blank(i + 1)
            balance = slines[i] if i < n else ""
        elif RX_AMOUNT.match(field):
            user = ""
            debit = field
            i = skip_blank(i + 1)
            credit = slines[i] if i < n else ""
            i = skip_blank(i + 1)
            balance = slines[i] if i < n else ""
        else:
            user = field
            debit = credit = balance = ""
            # deliberately do not consume `field`; outer loop re-examines it

        rows.append(
            {
                "date": date,
                "description": description,
                "user": user,
                "debit": debit,
                "credit": credit,
                "balance": balance,
            }
        )

    return rows


def extract_transactions_inline(
    text: str = "", lines: Optional[List[str]] = None
) -> List[Dict[str, str]]:
    """One-line transaction rows (pdfplumber_parser.py:85-142).

    Header/summary lines are skipped by substring blacklist before matching.
    """
    rows: List[Dict[str, str]] = []
    for line in (_stripped_lines(text) if lines is None else lines):
        if not line:
            continue
        if (
            "Tanggal Transaksi" in line
            or "Transaction Date" in line
            or "Uraian Transaksi" in line
            or "Transaction Description" in line
            or "Teller" in line
            or "User ID" in line
            or "Debet" in line
            or "Debit" in line
            or "Kredit" in line
            or "Credit" in line
            or "Saldo" in line
            or "Balance" in line
            or "Total Transaksi" in line
            or "Opening Balance" in line
        ):
            continue
        m = RX_TXN_INLINE.match(line)
        if m:
            date, description, user, debit, credit, balance = m.groups()
            rows.append(
                {
                    "date": date.strip(),
                    "description": description.strip(),
                    "user": user.strip(),
                    "debit": debit.strip() if debit else "",
                    "credit": credit.strip() if credit else "",
                    "balance": balance.strip(),
                }
            )
    return rows


def extract_transactions_table(
    text: str = "", lines: Optional[List[str]] = None
) -> List[Dict[str, str]]:
    """Cell-row transaction converter (pdfplumber_parser.py:145-178, M4).

    Input representation: one line per table row, cells TAB-separated; a
    blank line ends the current table; the first row of each table is its
    header and is skipped.  Reference semantics preserved: a data row needs
    ≥6 cells and a date-anchor match on cell 0; cells are None→''-cleaned
    and stripped.
    """
    rows: List[Dict[str, str]] = []
    slines = _stripped_lines(text) if lines is None else lines
    in_table = False  # has the current table's header row been consumed?
    for line in slines:
        if not line:
            in_table = False
            continue
        if not in_table:
            in_table = True  # header row of a new table — skip
            continue
        cells = line.split("\t")
        if len(cells) >= 6 and RX_TXN_DATE_ANCHOR.match(cells[0].strip()):
            rows.append(
                {
                    "date": cells[0].strip(),
                    "description": cells[1].strip(),
                    "user": cells[2].strip(),
                    "debit": cells[3].strip(),
                    "credit": cells[4].strip(),
                    "balance": cells[5].strip(),
                }
            )
    return rows


# Strategy registry — the engine analogue of the reference's PARSERS
# name→fn dispatch table (batch.py:47-52, §2.12).
TRANSACTION_STRATEGIES: Dict[str, object] = {
    "column": extract_transactions,
    "inline": extract_transactions_inline,
    "indonesian": extract_transactions,  # differs in metadata only
    "table": extract_transactions_table,
}


# ---------------------------------------------------------------------------
# Summary totals
# ---------------------------------------------------------------------------


def extract_summary_totals(
    text: str, lines: Optional[List[str]] = None
) -> Dict[str, Optional[str]]:
    """Bilingual summary block via positional label→value zip
    (utils.py:551-649).  ``lines``: optional pre-stripped line list
    (``text`` is still used for the inline regex fallbacks).

    Order-sensitive contract: labels dedup by type keeping first occurrence;
    values are the consecutive numeric-only lines scanned from the first
    label, stopping at a non-numeric line once ≥2 values are held; zip is
    label[i]→value[i] when there are enough values, else each label takes
    the first value below it.  Inline ``Label: value`` fallbacks exist for
    the two totals only.
    """
    result: Dict[str, Optional[str]] = {
        "total_debit": None,
        "total_credit": None,
        "opening_balance": None,
        "closing_balance": None,
    }
    slines = _stripped_lines(text) if lines is None else lines
    n = len(slines)

    found = set()
    labels: List[tuple] = []  # (label_type, line_index) in scan order
    for idx in range(n):
        stripped = slines[idx]
        # All summary labels start with S/T/O/C ("Saldo…", "Total…",
        # "Opening…", "Closing…") — this one-char guard skips the 4-regex
        # attempt on ~95% of lines (summary scan was 60% of kernel time).
        if not stripped or stripped[0] not in "SsTtOoCc":
            continue
        for rx, label_type in SUMMARY_LABELS:
            if rx.match(stripped):
                if label_type not in found:
                    labels.append((label_type, idx))
                    found.add(label_type)
                break

    if labels:
        start = min(pos for _, pos in labels)
        values: List[tuple] = []  # (line_index, text)
        for idx in range(start, n):
            stripped = slines[idx]
            if stripped and (stripped[0].isdigit() or stripped[0] in ",."):
                if RX_NUMERIC_LINE.match(stripped):
                    values.append((idx, stripped))
                elif len(values) >= 2:
                    break
            elif stripped and len(values) >= 2:
                break

        if values and len(values) >= len(labels):
            for (label_type, _), (_, val) in zip(labels, values):
                result[label_type] = val
        elif values:
            for label_type, label_idx in labels:
                for val_idx, val in values:
                    if val_idx > label_idx:
                        result[label_type] = val
                        break

    if result["total_debit"] is None:
        for rx in RX_INLINE_DEBIT:
            m = rx.search(text)
            if m:
                result["total_debit"] = m.group(1).strip()
                break
    if result["total_credit"] is None:
        for rx in RX_INLINE_CREDIT:
            m = rx.search(text)
            if m:
                result["total_credit"] = m.group(1).strip()
                break
    return result


# ---------------------------------------------------------------------------
# Numbers
# ---------------------------------------------------------------------------


def parse_indonesian_number(value: str) -> float:
    """'.'-thousands / ','-decimal → float; malformed → 0.0 (utils.py:527-548).

    (float() itself tolerates surrounding whitespace and rejects
    whitespace-only, so no explicit strip is needed — same semantics,
    one less allocation on the per-transaction hot path.)"""
    if not value:
        return 0.0
    try:
        return float(value.replace(".", "").replace(",", "."))
    except ValueError:
        return 0.0


def format_number_for_csv(value: str) -> str:
    """Canonicalize Indonesian/US number strings; non-numbers pass through
    (utils.py:363-425). Decimal separator = whichever of ','/'.' occurs last."""
    if not value or not value.strip():
        return ""
    if not any(c.isdigit() for c in value):
        return value
    original = value.strip()

    if "," in original and "." in original:
        if original.rfind(",") > original.rfind("."):
            parsed = parse_indonesian_number(original)
        else:
            try:
                parsed = float(original.replace(",", ""))
            except ValueError:
                return original
    elif "," in original:
        try:
            parsed = float(original.replace(",", ""))
        except ValueError:
            return original
    else:
        try:
            parsed = float(original)
        except ValueError:
            return original

    out = f"{parsed:.2f}"
    return out[:-3] if out.endswith(".00") else out


# ---------------------------------------------------------------------------
# Validation & reconciliation
# ---------------------------------------------------------------------------


def is_valid_parse(metadata: Dict[str, str], transactions: List[Dict[str, str]]) -> bool:
    """≥2 non-empty metadata fields AND ≥1 txn AND every txn has date+balance
    (utils.py:484-509)."""
    if sum(1 for v in metadata.values() if v and v.strip()) < 2:
        return False
    if not transactions:
        return False
    for txn in transactions:
        if not txn.get("date") or not txn.get("balance"):
            return False
    return True


def debit_sum(transactions: List[Dict[str, str]]) -> float:
    """Σ parse_indonesian_number(debit) (utils.py:652-666)."""
    return sum(parse_indonesian_number(t.get("debit", "")) for t in transactions)


def credit_sum(transactions: List[Dict[str, str]]) -> float:
    """Σ parse_indonesian_number(credit) (utils.py:669-683)."""
    return sum(parse_indonesian_number(t.get("credit", "")) for t in transactions)


def verify_turnover(
    transactions: List[Dict[str, str]],
    tolerance: float = 0.01,
    summary_text: str = "",
    totals: Optional[Dict[str, Optional[str]]] = None,
) -> Dict[str, object]:
    """Reconcile extracted summary totals vs transaction sums
    (utils.py:686-775). Status ∈ {passed, failed, not_available}.

    Pass ``totals`` when the summary block is already extracted (as
    ``parse_document`` does) to avoid a second full-text scan."""
    if totals is None:
        totals = extract_summary_totals(summary_text)
    calc_debit = debit_sum(transactions)
    calc_credit = credit_sum(transactions)

    ext_debit = (
        parse_indonesian_number(totals["total_debit"]) if totals["total_debit"] else None
    )
    ext_credit = (
        parse_indonesian_number(totals["total_credit"]) if totals["total_credit"] else None
    )

    debit_match = False
    debit_disc = 0.0
    if ext_debit is not None:
        debit_disc = abs(ext_debit - calc_debit)
        debit_match = debit_disc <= tolerance

    credit_match = False
    credit_disc = 0.0
    if ext_credit is not None:
        credit_disc = abs(ext_credit - calc_credit)
        credit_match = credit_disc <= tolerance

    if totals["total_debit"] is None and totals["total_credit"] is None:
        status = "not_available"
        message = "Summary totals not found in PDF - verification not applicable"
    elif debit_match and credit_match:
        status = "passed"
        message = "All turnover totals match within tolerance"
    else:
        status = "failed"
        parts = []
        if ext_debit is not None and not debit_match:
            parts.append(f"debit discrepancy: {debit_disc:,.2f}")
        if ext_credit is not None and not credit_match:
            parts.append(f"credit discrepancy: {credit_disc:,.2f}")
        message = f"Turnover mismatch - {', '.join(parts)}"

    return {
        "passed": status == "passed",
        "debit_match": debit_match,
        "credit_match": credit_match,
        "total_debit_extracted": totals["total_debit"],
        "total_debit_calculated": calc_debit,
        "debit_discrepancy": debit_disc,
        "total_credit_extracted": totals["total_credit"],
        "total_credit_calculated": calc_credit,
        "credit_discrepancy": credit_disc,
        "status": status,
        "message": message,
    }


# ---------------------------------------------------------------------------
# Whole-document parse (the per-row kernel the Ray stage calls)
# ---------------------------------------------------------------------------


def parse_document(
    doc_id: str,
    text: str,
    strategy: str = "column",
    verify: bool = True,
    lines: Optional[List[str]] = None,
    line_cls=None,
) -> Dict[str, object]:
    """Parse one document's rendered text layer end-to-end.

    Mirrors the reference per-file flow (pymupdf_parser.py:50-91 +
    __init__.py:153-163): metadata from text, filename/doc_id account
    fallback, transactions by strategy, summary merge, validity, optional
    turnover verification.  ``strategy`` ∈ {'column', 'inline',
    'indonesian'} maps the reference's backend registry (batch.py:47-52).
    """
    if strategy == "indonesian":
        metadata = dict.fromkeys(METADATA_KEYS, "")
        metadata.update(extract_metadata_indonesian(text))
    else:
        metadata = extract_metadata(text)

    if not metadata.get("account_no"):
        fallback = account_no_from_name(doc_id)
        if fallback:
            metadata["account_no"] = fallback

    slines = _stripped_lines(text) if lines is None else lines
    txn_fn = TRANSACTION_STRATEGIES.get(strategy, extract_transactions)
    if txn_fn is extract_transactions:
        # the batch-vectorized line classes apply to the column state
        # machine only (inline/table use their own patterns)
        transactions = txn_fn(lines=slines, cls=line_cls if lines is not None else None)
    else:
        transactions = txn_fn(lines=slines)

    summary = extract_summary_totals(text, lines=slines)
    for key in SUMMARY_KEYS:
        if summary.get(key):
            metadata[key] = summary[key]

    result: Dict[str, object] = {
        "metadata": metadata,
        "transactions": transactions,
        "is_valid": is_valid_parse(metadata, transactions),
    }
    if verify:
        result["verification"] = verify_turnover(transactions, totals=summary)
    return result
