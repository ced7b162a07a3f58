"""Differential fuzz: the kernel vs the ACTUAL reference implementation on
randomly composed statement-shaped text.

The fixed-fixture differential tests (test_kernel.py) cover the designed
families; this file samples the input space around them — random mixes of
transaction lines, summary labels, Indonesian/plain numbers, labels that
look like values, truncation mid-line — and asserts field-for-field
equality of every shared extraction function.  Any divergence between
``kernel`` and ``/root/reference/pdfparser/utils.py`` on ANY generated
document fails here with the text that produced it.
"""

from __future__ import annotations

import random

import pytest

from b_pdf_parser_ray import kernel

DATES = ["01/02", "15/07", "31/12", "05/11"]
DESCS = ["TRSF E-BANKING CR", "BI-FAST CR", "PAYMENT QR", "TARIKAN ATM",
         "BIAYA ADM", "SETORAN TUNAI", "KR OTOMATIS", "TRANSFER DB"]
USERS = ["0501", "9942", "12345678", ""]
AMOUNTS = ["1,000.00", "250,000.00", "1,234,567.89", "50.25", "0.00",
           "12.345,67", "999", "10,000"]
LABELS = ["Saldo Awal", "Mutasi Kredit", "Mutasi Debet", "Saldo Akhir",
          "Total Transaksi Debet", "Total Transaksi Kredit"]
HEADER_LINES = [
    "No. Rekening : 1234567890",
    "Nama Produk : TABUNGAN BATARA",
    "Valuta : IDR",
    "Tanggal Laporan : 31/12/2024",
    "Periode Transaksi : 01/12/2024 - 31/12/2024",
    "Unit Kerja : KC JAKARTA",
]
NOISE = ["", "   ", "LAPORAN TRANSAKSI", "Halaman 1 dari 2", "----", "...",
         "Tanggal Keterangan Debet Kredit Saldo"]


def _statement(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randrange(0, 4)):
        lines.append(rng.choice(HEADER_LINES + NOISE))
    for _ in range(rng.randrange(0, 8)):
        kind = rng.random()
        if kind < 0.55:
            # transaction-ish block: date line, desc, maybe user, amounts
            lines.append(rng.choice(DATES))
            lines.append(rng.choice(DESCS))
            if rng.random() < 0.5:
                lines.append(rng.choice(USERS))
            for _ in range(rng.randrange(0, 3)):
                lines.append(rng.choice(AMOUNTS))
        elif kind < 0.8:
            lines.append(rng.choice(LABELS))
            if rng.random() < 0.7:
                lines.append(rng.choice(AMOUNTS))
        else:
            lines.append(rng.choice(NOISE))
    text = "\n".join(lines)
    if rng.random() < 0.15 and text:
        text = text[: rng.randrange(1, len(text) + 1)]  # mid-line truncation
    return text


@pytest.mark.parametrize("seed", range(8))
def test_kernel_matches_reference_on_random_statements(reference, seed):
    rng = random.Random(seed)
    for case in range(150):
        text = _statement(rng)
        ctx = f"seed={seed} case={case} text={text!r}"

        got_md = kernel.extract_metadata(text)
        want_md = reference.utils.extract_metadata(text)
        assert got_md == want_md, f"metadata diverged: {ctx}"

        got_tx = kernel.extract_transactions(text)
        want_tx = reference.utils.extract_transactions(text)
        assert got_tx == want_tx, f"transactions diverged: {ctx}"

        got_sum = kernel.extract_summary_totals(text)
        want_sum = reference.utils.extract_summary_totals(text)
        assert got_sum == want_sum, f"summary diverged: {ctx}"

        assert kernel.is_valid_parse(got_md, got_tx) == \
            reference.utils.is_valid_parse(want_md, want_tx), ctx

        got_v = kernel.verify_turnover(got_tx, summary_text=text)
        want_v = reference.utils.verify_turnover(want_tx, summary_text=text)
        assert got_v == want_v, f"verification diverged: {ctx}"


@pytest.mark.parametrize("seed", range(4))
def test_number_functions_match_reference(reference, seed):
    rng = random.Random(100 + seed)
    pieces = ["1", "12", "123", ",", ".", "00", "5", "-", " ", "Rp", "x"]
    for _ in range(400):
        s = "".join(rng.choice(pieces) for _ in range(rng.randrange(0, 10)))
        assert kernel.parse_indonesian_number(s) == pytest.approx(
            reference.utils.parse_indonesian_number(s)
        ), repr(s)
        assert kernel.format_number_for_csv(s) == \
            reference.utils._format_number_for_csv(s), repr(s)
