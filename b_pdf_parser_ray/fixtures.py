"""Deterministic synthetic statement corpus as interleaved span tables.

Reproduces the reference's synthetic-corpus generator behaviorally
(``/root/reference/generate_test_pdfs.py:99-347``) but emits span sequences
(FIXTURES.md §2) instead of PDFs, is fully seeded (the reference embeds
``datetime.now()`` — ``generate_test_pdfs.py:156-157, 237, 328``), and scales
via Ray for large corpora.

Families (FIXTURES.md §2.3-2.4), chosen per-doc from a seeded RNG:

* ``standard``   — column-format rows (user-id / no-user-id mix, multiline
                   descriptions), matching summary block → status ``passed``
* ``heavy``      — standard but 100-500 txns (skew tail for the size-bucketed
                   repartition path)
* ``no_summary`` — no summary block → ``not_available``
* ``mismatch``   — summary totals perturbed → ``failed``
* ``inline``     — one-line rows (strategy ``inline``), inline totals
* ``indonesian`` — single-line ``No. Rekening:``-style header
                   (strategy ``indonesian``)
* ``truncated``  — document ends mid-transaction (``utils.py:300-301`` path)
* ``ambiguous``  — an 8-digit integer amount that classifies as a user id
                   (``utils.py:303-310`` fidelity case)

Amounts are generated so the reference's ``parse_indonesian_number``-based
turnover arithmetic (``utils.py:686-775``) is exactly linear: every amount
and every total is formatted ``X,XXX.XX`` with exactly one comma group
(value in [1,000.00 .. 999,999.99]), so extracted and calculated sides scale
identically and ``passed`` families verify.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

import pyarrow as pa

from .model import DOCUMENTS_SCHEMA, SPAN_TYPE

BUSINESS_UNITS = ["KC Kalimalang", "KC Jakarta Pusat", "KCP Bekasi Timur", "KC Surabaya Darmo", "KCP Bandung Dago"]
PRODUCTS = ["Giro Umum-IDR", "Britama", "Simpedes", "Giro Bisnis", "Tabungan Haji"]
ADDRESSES = [
    "Jl. Kalimalang Blok C3 No.6",
    "Jl. Jend Sudirman Kav 44",
    "Jl. Ahmad Yani No.12 Bekasi",
    "Jl. Raya Darmo No.105",
    "Jl. Ir H Juanda No.78",
]
DESCRIPTIONS = [
    "NBMB UJANG SUMARWAN TRSF",
    "ESB PAYMENT GATEWAY",
    "QRIS MERCHANT PURCHASE",
    "SETORAN TUNAI CABANG",
    "TRANSFER MASUK BI FAST",
    "PEMBAYARAN LISTRIK PLN",
    "TOPUP EWALLET OVO",
    "BIAYA ADMIN BULANAN",
    "PEMBELIAN PULSA TELKOMSEL",
    "GAJI KARYAWAN PT MAJU",
]
DESCRIPTION_CONT = [
    "ESB NBMB ref FA sixty",
    "ke rek tujuan an BUDI",
    "via channel mobile apps",
    "berita bayar tagihan",
]

FAMILIES = [
    ("standard", 50),
    ("heavy", 5),
    ("no_summary", 10),
    ("mismatch", 10),
    ("inline", 10),
    ("indonesian", 5),
    ("truncated", 5),
    ("ambiguous", 5),
]
_FAMILY_CUM: List[Tuple[int, str]] = []
_acc = 0
for _name, _w in FAMILIES:
    _acc += _w
    _FAMILY_CUM.append((_acc, _name))


def _amount(rng: random.Random, max_cents: int = 999_999) -> int:
    """Amount in integer cents, value in [1,000.00 .. max]. One comma group."""
    return rng.randint(100_000, max_cents * 100 if max_cents < 10_000 else 999_999)


def _fmt(cents: int) -> str:
    return f"{cents / 100:,.2f}"


def _account_no(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789") for _ in range(13))


def _header_lines(rng: random.Random, account_no: str, omit_account: bool) -> List[str]:
    """Bilingual stacked header block (FIXTURES.md §2.1, utils.py:23-44)."""
    lines: List[str] = []
    if not omit_account:
        lines += ["No. Rekening", "Account No", f": {account_no}"]
    lines += ["Unit Kerja", "Business Unit", ":", rng.choice(BUSINESS_UNITS)]
    lines += ["Nama Produk", f"Product Name : {rng.choice(PRODUCTS)}"]
    d, m, y = rng.randint(1, 28), rng.randint(1, 12), rng.randint(20, 25)
    lines += [f"Statement Date : {d:02d}/{m:02d}/{y:02d}"]
    lines += ["Valuta", "Currency", ": IDR"]
    lines += ["Periode Transaksi", "Transaction Period", ":",
              f"01/{m:02d}/{y:02d} - 28/{m:02d}/{y:02d}"]
    lines += ["Alamat Unit Kerja", ":", rng.choice(ADDRESSES)]
    return lines


def _header_lines_indonesian(rng: random.Random, account_no: str) -> List[str]:
    """Single-line Indonesian-label header (pdfplumber_parser.py:27-30)."""
    d, m, y = rng.randint(1, 28), rng.randint(1, 12), rng.randint(20, 25)
    return [
        f"No. Rekening : {account_no}",
        f"Unit Kerja : {rng.choice(BUSINESS_UNITS)}",
        f"Nama Produk : {rng.choice(PRODUCTS)}",
        f"Tanggal Laporan : {d:02d}/{m:02d}/{y:02d}",
    ]


TABLE_HEADER = [
    "Tanggal Transaksi", "Uraian Transaksi", "Teller", "Debet", "Kredit", "Saldo",
    "Transaction Date", "Transaction Description", "User ID", "Debit", "Credit", "Balance",
]


def _txn_date(rng: random.Random) -> str:
    return (
        f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.randint(20, 25):02d} "
        f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
    )


def _make_txns(
    rng: random.Random, n_txns: int, family: str
) -> Tuple[List[str], int, int]:
    """Column-format transaction lines; returns (lines, debit_cents, credit_cents).

    Per-amount cap keeps each doc's totals under 999,999.99 so totals format
    with one comma group (see module docstring).
    """
    cap = max(100_001, min(999_999, (99_899_999 // max(n_txns, 1))))
    lines: List[str] = []
    total_debit = 0
    total_credit = 0
    for t in range(n_txns):
        lines.append(_txn_date(rng))
        lines.append(rng.choice(DESCRIPTIONS))
        if rng.random() < 0.3:
            lines.append(rng.choice(DESCRIPTION_CONT))
        amt = rng.randint(100_000, cap)
        is_debit = rng.random() < 0.5
        if t == 0:
            is_debit = True
        elif t == 1:
            is_debit = False
        debit = amt if is_debit else 0
        credit = 0 if is_debit else amt
        total_debit += debit
        total_credit += credit

        shape = rng.random()
        if family == "ambiguous" and t == n_txns // 2:
            # no-user row whose 8-digit integer debit classifies as a user id
            # (utils.py:303-310): the state machine shifts fields by one —
            # intentional fidelity case, verification goes 'failed'
            lines.append("12345678")
            lines.append(_fmt(credit) if credit else "0.00")
            lines.append(_fmt(rng.randint(100_000, 99_999_999)))
        elif shape < 0.7:
            # with-user-id row (utils.py:311-326)
            lines.append(str(rng.randint(100_000, 9_999_999)))  # 6-7 digit user id
            lines.append(_fmt(debit) if debit else "0.00")
            lines.append(_fmt(credit) if credit else "0.00")
            lines.append(_fmt(rng.randint(100_000, 99_999_999)))
        else:
            # no-user-id row: date → desc → amounts directly (utils.py:327-338)
            lines.append(_fmt(debit) if debit else "0.00")
            lines.append(_fmt(credit) if credit else "0.00")
            lines.append(_fmt(rng.randint(100_000, 99_999_999)))
        if rng.random() < 0.2:
            lines.append("")  # blank line between rows (utils.py:269-271 skip path)
    return lines, total_debit, total_credit


def _make_txns_inline(
    rng: random.Random, n_txns: int
) -> Tuple[List[str], int, int]:
    """One-line rows for TRANSACTION_LINE_PATTERN (pdfplumber_parser.py:85-142)."""
    lines: List[str] = []
    total_debit = 0
    total_credit = 0
    for t in range(n_txns):
        amt = rng.randint(100_000, 999_999)
        is_debit = rng.random() < 0.5 if t > 1 else (t == 0)
        debit = amt if is_debit else 0
        credit = 0 if is_debit else amt
        total_debit += debit
        total_credit += credit
        desc = rng.choice(DESCRIPTIONS)
        user = str(rng.randint(100_000, 9_999_999))
        bal = rng.randint(100_000, 99_999_999)
        lines.append(
            f"{_txn_date(rng)} {desc} {user} "
            f"{_fmt(debit) if debit else '0.00'} "
            f"{_fmt(credit) if credit else '0.00'} {_fmt(bal)}"
        )
    return lines, total_debit, total_credit


def _summary_lines(debit_cents: int, credit_cents: int, rng: random.Random,
                   perturb: bool = False) -> List[str]:
    """Block summary: 4 ID labels, 4 EN labels, 4 value lines (FIXTURES.md §2.4)."""
    opening = rng.randint(100_000, 99_999_999)
    closing = opening + credit_cents - debit_cents
    if closing < 100_000:
        closing = opening + credit_cents + debit_cents
    if perturb:
        debit_cents += 10_000  # +100.00 keeps one-comma shape
    return [
        "Saldo Awal",
        "Total Transaksi Debet",
        "Total Transaksi Kredit",
        "Saldo Akhir",
        "Opening Balance",
        "Total Debit Transaction",
        "Total Credit Transaction",
        "Closing Balance",
        _fmt(opening),
        _fmt(debit_cents),
        _fmt(credit_cents),
        _fmt(closing),
    ]


def family_of(index: int, seed: int = 42) -> str:
    rng = random.Random(f"fam:{seed}:{index}")
    pick = rng.randint(1, _FAMILY_CUM[-1][0])
    for cum, name in _FAMILY_CUM:
        if pick <= cum:
            return name
    return "standard"


def make_document(index: int, seed: int = 42) -> Dict[str, object]:
    """Build one deterministic document row: {doc_id, spans, strategy, family}.

    Seeding is per-document (``Random(f"{seed}:{index}")``) so generation is
    order-independent and parallelizable across Ray tasks.
    """
    family = family_of(index, seed)
    rng = random.Random(f"doc:{seed}:{index}")
    account = _account_no(rng)

    # 20% of docs omit the header account line and carry it in doc_id instead,
    # exercising the filename fallback (pymupdf_parser.py:60-71).
    omit_account = rng.random() < 0.2 and family not in ("indonesian",)
    doc_id = f"stmt_{account}_{index:07d}" if omit_account else f"stmt_{index:07d}"

    if family == "heavy":
        n_txns = rng.randint(100, 500)
    elif family == "inline":
        n_txns = rng.randint(5, 40)
    else:
        n_txns = rng.randint(5, 50)

    strategy = {"inline": "inline", "indonesian": "indonesian"}.get(family, "column")

    if family == "indonesian":
        lines = _header_lines_indonesian(rng, account)
    else:
        lines = _header_lines(rng, account, omit_account)
    lines += TABLE_HEADER

    if family == "inline":
        txn_lines, _, _ = _make_txns_inline(rng, n_txns)
        lines += txn_lines
        # Totals are written to match what the inline regex actually captures
        # (its greedy/backtracking split differs from the visual columns —
        # reference TRANSACTION_LINE_PATTERN fidelity), in Indonesian decimal
        # format so parse_indonesian_number round-trips them exactly.
        from . import kernel as _k

        parsed = _k.extract_transactions_inline("\n".join(txn_lines))
        d_sum = _k.debit_sum(parsed)
        c_sum = _k.credit_sum(parsed)
        lines += [
            f"Total Transaksi Debet: {d_sum:.5f}".replace(".", ","),
            f"Total Transaksi Kredit: {c_sum:.5f}".replace(".", ","),
        ]
    else:
        txn_lines, d_cents, c_cents = _make_txns(rng, n_txns, family)
        lines += txn_lines
        if family == "truncated":
            # cut mid-row after the debit field: the row lands with empty
            # balance → is_valid False (utils.py:318-326 EOF guards)
            lines += [
                _txn_date(rng),
                rng.choice(DESCRIPTIONS),
                str(rng.randint(100_000, 9_999_999)),
                _fmt(rng.randint(100_000, 999_999)),
            ]
        elif family == "no_summary":
            pass
        else:
            lines += _summary_lines(d_cents, c_cents, rng, perturb=(family == "mismatch"))

    # Interleave media spans (image XObjects analogue, FIXTURES.md §2.5):
    # a few before the header, one roughly every ~40 text lines (page tiles),
    # and a trailing logo block.
    spans: List[Dict[str, object]] = []
    offset = 0
    media_i = 0
    for _ in range(rng.randint(1, 3)):
        spans.append({"kind": "media", "text": "", "media_ref": f"Im{media_i}", "offset": offset})
        media_i += 1
        offset += 1
    for li, line in enumerate(lines):
        spans.append({"kind": "text", "text": line, "media_ref": "", "offset": offset})
        offset += 1
        if li % 40 == 39:
            spans.append({"kind": "media", "text": "", "media_ref": f"Im{media_i}", "offset": offset})
            media_i += 1
            offset += 1
    spans.append({"kind": "media", "text": "", "media_ref": f"Im{media_i}", "offset": offset})

    return {"doc_id": doc_id, "spans": spans, "strategy": strategy, "family": family}


def make_table_document(index: int, seed: int = 42) -> Dict[str, object]:
    """One deterministic table-strategy document (kernel M4 path): rows are
    TAB-separated cell lines under a header row, summary block after a blank
    line.  Amounts use the same one-comma-group trick as column docs so the
    turnover check passes (module docstring).  Kept out of the seeded
    ``family_of`` mix so existing corpus-derived fixtures stay stable."""
    rng = random.Random(f"tbl:{seed}:{index}")
    account = _account_no(rng)
    n_txns = rng.randint(5, 40)
    lines = _header_lines(rng, account, omit_account=False)
    lines.append("Tanggal Transaksi\tUraian Transaksi\tTeller\tDebet\tKredit\tSaldo")
    cap = max(100_001, min(999_999, (99_899_999 // max(n_txns, 1))))
    total_debit = 0
    total_credit = 0
    for t in range(n_txns):
        amt = rng.randint(100_000, cap)
        is_debit = rng.random() < 0.5 if t > 1 else (t == 0)
        debit = amt if is_debit else 0
        credit = 0 if is_debit else amt
        total_debit += debit
        total_credit += credit
        lines.append(
            "\t".join(
                [
                    _txn_date(rng),
                    rng.choice(DESCRIPTIONS),
                    str(rng.randint(100_000, 9_999_999)),
                    _fmt(debit) if debit else "0.00",
                    _fmt(credit) if credit else "0.00",
                    _fmt(rng.randint(100_000, 99_999_999)),
                ]
            )
        )
    lines.append("")  # blank line ends the table before the summary block
    lines += _summary_lines(total_debit, total_credit, rng)
    spans = [
        {"kind": "text", "text": line, "media_ref": "", "offset": i}
        for i, line in enumerate(lines)
    ]
    return {
        "doc_id": f"tbl_{index:07d}",
        "spans": spans,
        "strategy": "table",
        "family": "table",
    }


CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("strategy", pa.string()),
        ("family", pa.string()),
    ]
)


def corpus_table(num_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Pure-Python corpus builder (tests, small scales)."""
    docs = [make_document(i, seed) for i in range(start, start + num_docs)]
    return pa.Table.from_pylist(docs, schema=CORPUS_SCHEMA)


def write_corpus(path: str, num_docs: int, seed: int = 42, docs_per_file: int = 2000) -> None:
    """Write a corpus to partitioned Parquet via Ray (bench scales).

    One file per ~docs_per_file documents; generation is a map over the doc
    index range, so it parallelizes and never materializes the corpus in one
    process.  (Production target: ``write_lance`` — same call shape.)
    """
    import ray.data

    n_blocks = max(1, num_docs // docs_per_file)

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.Table.from_pylist(
            [make_document(i, seed) for i in ids], schema=CORPUS_SCHEMA
        )

    (
        ray.data.range(num_docs, override_num_blocks=n_blocks)
        .map_batches(build, batch_format="pyarrow", batch_size=docs_per_file)
        # uncompressed: the extraction benchmark is CPU-bound and snappy
        # decode measurably flattens its CPU-scaling curve (4→16 CPU
        # efficiency 0.77 → 0.85); a real 100 TB corpus would instead pick
        # zstd and pay the decode for the storage/IO savings.
        .write_parquet(path, compression="none")
    )


# ---------------------------------------------------------------------------
# Documents-table corpus (the driver testdata `documents` shape) at bench /
# larger-than-object-store scales, with PLANTED duplicate clusters so the
# near-dedup pipelines have known structure to find.
# ---------------------------------------------------------------------------

_DOC_VOCAB = [
    f"w{i:04d}" for i in range(4096)
]  # synthetic vocabulary: shingle/minhash behavior only needs token identity
_DOC_LANGS = ["en", "fr", "es", "de", "id"]
_DOC_SOURCES = ["web", "books", "news", "wiki", "forum", "code"]


def make_text_document(index: int, seed: int = 42) -> dict:
    """One deterministic documents-table row.  Duplicate structure per
    decade of ids (index >= 10): ``index % 10 == 8`` is an EXACT copy of
    the decade base (``index - 8``); ``index % 10 == 7`` is a NEAR copy of
    the base with ~5% of tokens mutated — so ~10% exact dups, ~10% near
    dups, cluster size 3, all derivable in closed form for assertions."""
    import numpy as np

    base = index - (index % 10)
    kind = index % 10
    src = base if (kind in (7, 8) and index >= 10) else index
    rng = np.random.RandomState((seed * 1_000_003 + src) % (2**31 - 1))
    n_tokens = int(rng.randint(500, 900))
    toks = rng.randint(0, len(_DOC_VOCAB), size=n_tokens)
    if kind == 7 and index >= 10:  # near-dup: mutate ~5% of tokens
        mut = np.random.RandomState((seed * 7_000_003 + index) % (2**31 - 1))
        pos = mut.choice(n_tokens, size=max(1, n_tokens // 20), replace=False)
        toks = toks.copy()
        toks[pos] = mut.randint(0, len(_DOC_VOCAB), size=len(pos))
    text = " ".join(_DOC_VOCAB[t] for t in toks)
    return {
        "doc_id": index,
        "text": text,
        "lang": _DOC_LANGS[src % len(_DOC_LANGS)],
        "source": _DOC_SOURCES[(src // 7) % len(_DOC_SOURCES)],
        "n_chars": len(text),
    }


DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def write_documents_corpus(
    path: str, num_docs: int, seed: int = 42, docs_per_file: int = 25_000
) -> None:
    """Write a ``documents``-shaped corpus (same schema as the driver
    testdata table) as a parquet fragment DIRECTORY named
    ``<path>/documents.parquet/`` — the layout ``sources.tables`` already
    reads — via a parallel Ray generation map that never materializes the
    corpus in one process.  Deterministic: same args → same rows."""
    import os

    import ray.data

    n_blocks = max(1, num_docs // docs_per_file)

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.Table.from_pylist(
            [make_text_document(i, seed) for i in ids], schema=DOCUMENTS_SCHEMA
        )

    (
        ray.data.range(num_docs, override_num_blocks=n_blocks)
        .map_batches(build, batch_format="pyarrow", batch_size=docs_per_file)
        # uncompressed like write_corpus: the dedup benches are CPU-bound
        # and the on-disk footprint should equal the streaming footprint
        # for larger-than-object-store evidence runs (a production corpus
        # would pick zstd; the synthetic vocab compresses ~3.3x)
        .write_parquet(os.path.join(path, "documents.parquet"), compression="none")
    )
