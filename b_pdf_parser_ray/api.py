"""User-facing compatibility API — the reference's public surface,
re-expressed over the Ray Data engine.

A user of the reference drives it three ways (``/root/reference``):

* ``PDFParser(parser=..., verify_turnover=...).parse(path)``
  (``pdfparser/__init__.py:41-109``) → :class:`DocumentParser`
* ``parse_pdf(path, parser=..., verify_turnover=...)``
  (``__init__.py:112-163``) → :func:`parse`
* ``batch_parse(paths, ...)`` / ``batch_parse_from_directory(dir, ...)``
  (``batch.py:254-465``) → :func:`batch_parse` /
  :func:`batch_parse_from_directory`, returning the same counter dict
  shape (``batch.py:404-414``) with Ray Data doing the fan-out.

The unit of input is a *document* (doc_id + span sequence, or plain
rendered text) instead of a PDF path, and the backend registry holds
extraction *strategies* instead of PDF libraries — everything else keeps
the reference's shapes so pipelines port mechanically.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Union

from . import kernel
from .model import render_text

VALID_STRATEGIES = tuple(kernel.TRANSACTION_STRATEGIES)


def parse(
    document: Union[Dict, str],
    doc_id: str = "",
    strategy: str = "column",
    verify_turnover: bool = True,
) -> Dict[str, object]:
    """Parse one document — the reference's ``parse_pdf`` (``__init__.py:112-163``).

    ``document`` is a dict with ``doc_id`` + ``spans`` (the engine's input
    row) or an already-rendered text string.  Returns
    ``{'metadata', 'transactions', 'is_valid'[, 'verification']}`` — the
    reference's result dict (``full_text`` is never attached, matching the
    reference popping it before return, ``__init__.py:160-161``).
    """
    if strategy not in VALID_STRATEGIES:
        raise ValueError(
            f"Invalid strategy: {strategy}. Choose from: {', '.join(VALID_STRATEGIES)}"
        )
    if isinstance(document, dict):
        doc_id = str(document.get("doc_id", doc_id))
        text = render_text(document["spans"])
        strategy = str(document.get("strategy") or strategy)
    else:
        text = document
    res = kernel.parse_document(doc_id, text, strategy=strategy, verify=verify_turnover)
    if not verify_turnover:
        res.pop("verification", None)
    return res


class DocumentParser:
    """Class form of :func:`parse` — the reference's ``PDFParser``
    (``__init__.py:41-109``): configuration held once, ``parse()`` per doc."""

    VALID_STRATEGIES = VALID_STRATEGIES

    def __init__(self, strategy: str = "column", verify_turnover: bool = True):
        if strategy not in self.VALID_STRATEGIES:
            raise ValueError(
                f"Invalid strategy: {strategy}. "
                f"Choose from: {', '.join(self.VALID_STRATEGIES)}"
            )
        self.strategy = strategy
        self.verify_turnover = verify_turnover

    def parse(self, document: Union[Dict, str], doc_id: str = "") -> Dict[str, object]:
        return parse(
            document,
            doc_id=doc_id,
            strategy=self.strategy,
            verify_turnover=self.verify_turnover,
        )

    def __repr__(self) -> str:
        return (
            f"DocumentParser(strategy='{self.strategy}', "
            f"verify_turnover={self.verify_turnover})"
        )


def batch_parse(
    source,
    strategy: str = "column",
    verify_turnover: bool = True,
    output_dir: Optional[str] = None,
    batch_size: Optional[int] = None,
) -> Dict[str, object]:
    """Corpus-scale parse — the reference's ``batch_parse`` (``batch.py:254-414``).

    ``source``: a ``ray.data.Dataset`` of documents, a ``pyarrow.Table``,
    or a parquet path/dir.  Optionally writes extracted records to
    ``output_dir`` (from the tasks — the reference serialized CSV on the
    driver, its own documented bottleneck).  Returns the reference's
    counter dict shape (``batch.py:404-414``); ``memory_peak_mb`` and
    ``worker_overhead_percent`` — vestigial/always-0 fields in the
    reference (SURVEY.md §4) — are reported from Ray where meaningful.
    """
    import pyarrow as pa
    import ray.data

    from .pipelines.flagship import DEFAULT_BATCH_SIZE, extract_documents, summarize

    if strategy not in VALID_STRATEGIES:
        raise ValueError(f"Invalid strategy: {strategy}")

    if isinstance(source, str):
        ds = ray.data.read_parquet(source)
    elif isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
    else:
        ds = source

    t0 = time.time()
    extracted = extract_documents(
        ds,
        verify=verify_turnover,
        default_strategy=strategy,
        batch_size=batch_size or DEFAULT_BATCH_SIZE,
    )
    if output_dir is not None:
        # stream to the sink, then summarize from the written output —
        # never materialize the full corpus (unbounded input)
        extracted.write_parquet(output_dir, compression="none")
        metrics = summarize(ray.data.read_parquet(output_dir))
    else:
        metrics = summarize(extracted)
    duration = time.time() - t0
    total = metrics["total"]
    return {
        "total": total,
        "successful": metrics["valid"],
        "failed": metrics["failed"],
        "errors": metrics["errors"],
        "success_rate": metrics["success_rate"],
        "duration": duration,
        "throughput": (total / duration) if duration > 0 else 0.0,
        "transactions": metrics["transactions"],
        "output_dir": output_dir,
    }


def batch_parse_from_directory(
    directory: str,
    strategy: str = "column",
    verify_turnover: bool = True,
    output_dir: Optional[str] = None,
    max_files: Optional[int] = None,
) -> Dict[str, object]:
    """Directory form (``batch.py:444-465``): deterministic sorted listing
    of parquet fragments, optional ``max_files`` cut (``benchmark.py:119``)."""
    files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {directory!r}")
    if max_files is not None:
        files = files[:max_files]
    import ray.data

    return batch_parse(
        ray.data.read_parquet(files),
        strategy=strategy,
        verify_turnover=verify_turnover,
        output_dir=output_dir,
    )
