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
VALID_INIT_STRATEGIES = ("per-file", "per-worker")


def load_config(env_file: str = ".env") -> Dict[str, str]:
    """S6: ``.env``-backed configuration — the reference's ``load_config``
    (``utils.py:114-136``), stdlib-only (no python-dotenv in this stack).

    Lines of ``KEY=VALUE`` in ``env_file`` (if present) are loaded into the
    environment without overriding variables already set (dotenv default),
    then the reference's four keys are returned with its defaults.
    """
    if os.path.exists(env_file):
        with open(env_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, value = line.partition("=")
                key, value = key.strip(), value.strip().strip("'\"")
                if key and key not in os.environ:
                    os.environ[key] = value
    return {
        "source_pdf_dir": os.getenv("SOURCE_PDF_DIR", "source-pdf"),
        "output_dir": os.getenv("OUTPUT_DIR", "output"),
        "test_pdfs_dir": os.getenv("TEST_PDFS_DIR", "test-pdfs"),
        "verify_turnover": os.getenv("VERIFY_TURNOVER", "false"),
    }


def validate_batch_params(
    strategy: str,
    max_workers: Optional[int] = None,
    chunk_size: int = 10,
    init_strategy: str = "per-worker",
) -> None:
    """F8: the reference's ``validate_batch_params`` contract
    (``batch.py:222-251``) — same ranges, same error shapes."""
    if strategy not in VALID_STRATEGIES:
        raise ValueError(
            f"Invalid strategy: {strategy}. Choose from: {', '.join(VALID_STRATEGIES)}"
        )
    if max_workers is not None:
        if not isinstance(max_workers, int) or max_workers < 1 or max_workers > 32:
            raise ValueError(f"max_workers must be between 1 and 32, got: {max_workers}")
    if chunk_size < 1 or chunk_size > 500:
        raise ValueError(f"chunk_size must be between 1 and 500, got: {chunk_size}")
    if init_strategy not in VALID_INIT_STRATEGIES:
        raise ValueError(
            f"init_strategy must be 'per-file' or 'per-worker', got: {init_strategy}"
        )


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
        # a document-embedded strategy must pass the same gate as the
        # argument (the reference raises on unknown parser names)
        if strategy not in VALID_STRATEGIES:
            raise ValueError(
                f"Invalid strategy: {strategy}. "
                f"Choose from: {', '.join(VALID_STRATEGIES)}"
            )
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
    max_workers: Optional[int] = None,
    chunk_size: Optional[int] = None,
    init_strategy: str = "per-worker",
    memory_limit_mb: Optional[int] = None,
) -> Dict[str, object]:
    """Corpus-scale parse — the reference's ``batch_parse`` (``batch.py:254-414``).

    ``source``: a ``ray.data.Dataset`` of documents, a ``pyarrow.Table``,
    a parquet path/dir, or a LIST of parquet paths — missing/non-file list
    entries are warned about and skipped, and an all-invalid list returns
    the reference's zero-counter dict (``batch.py:321-343``).  Optionally
    writes extracted records to ``output_dir`` (from the tasks — the
    reference serialized CSV on the driver, its own documented bottleneck).

    Returns the reference's counter dict shape (``batch.py:404-414``):
    ``successful`` counts documents that parsed WITHOUT ERROR (the
    reference's ``result["success"]``), whether or not they passed
    validation; the engine's validity count is the extra ``valid`` key.
    ``memory_peak_mb`` is the driver's peak RSS; ``worker_overhead_percent``
    is 0.0 (Ray has no pool warm-up phase to measure — the field is kept
    for dict-shape parity).

    The reference's tuning knobs (``batch.py:254-268``) map onto the Ray
    physical plan: ``chunk_size`` (files per worker batch) is the
    ``batch_size`` analog (documents per Arrow batch); ``init_strategy``
    ``'per-worker'`` → task mode with module-level warm state (the
    reference's recommended mode), ``'per-file'`` → an explicit actor pool
    (state isolation per pool actor), sized by ``max_workers``.  All three
    are validated with the reference's ranges.  ``memory_limit_mb``
    (reference ``batch.py:69``, accepted but never enforced there) is
    ENFORCED here: it becomes the Ray ``memory`` resource of each extract
    worker, so the scheduler's admission control caps concurrent memory
    instead of hoping (see ``pipelines.flagship.extract_documents``).
    """
    import warnings

    import pyarrow as pa
    import ray.data

    from .pipelines.flagship import DEFAULT_BATCH_SIZE, extract_documents, summarize

    validate_batch_params(
        strategy, max_workers, chunk_size if chunk_size is not None else 10,
        init_strategy,
    )
    if batch_size is None and chunk_size is not None:
        batch_size = chunk_size

    def _zero(failed: int) -> Dict[str, object]:
        return {
            "total": 0, "successful": 0, "failed": failed, "valid": 0,
            "errors": 0, "success_rate": 0.0, "duration": 0.0,
            "throughput": 0.0, "memory_peak_mb": 0.0,
            "worker_overhead_percent": 0.0, "transactions": 0,
            "output_dir": output_dir,
        }

    if isinstance(source, (list, tuple)):
        # F6: warn-and-skip path validation (reference batch.py:321-343)
        valid_paths = []
        for p in source:
            if not os.path.exists(p):
                warnings.warn(f"File not found, skipping: {p}")
                continue
            if not os.path.isfile(p):
                warnings.warn(f"Not a file, skipping: {p}")
                continue
            valid_paths.append(p)
        if not valid_paths:
            return _zero(failed=len(source))
        ds = ray.data.read_parquet(valid_paths)
    elif isinstance(source, str):
        ds = ray.data.read_parquet(source)
    elif isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
    else:
        ds = source

    t0 = time.time()
    extract_kwargs: Dict[str, object] = {}
    if init_strategy == "per-file":
        extract_kwargs["compute"] = "actors"
        if max_workers is not None:
            extract_kwargs["concurrency"] = (1, max_workers)
    if memory_limit_mb is not None:
        if memory_limit_mb <= 0:
            raise ValueError("memory_limit_mb must be positive")
        extract_kwargs["memory_limit_mb"] = memory_limit_mb
    extracted = extract_documents(
        ds,
        verify=verify_turnover,
        default_strategy=strategy,
        batch_size=batch_size or DEFAULT_BATCH_SIZE,
        **extract_kwargs,
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
    errors = metrics["errors"]
    successful = total - errors

    import resource

    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    return {
        "total": total,
        "successful": successful,
        "failed": errors,
        "valid": metrics["valid"],
        "errors": errors,
        "success_rate": (successful / total * 100.0) if total else 0.0,
        "duration": duration,
        "throughput": (total / duration) if duration > 0 else 0.0,
        "memory_peak_mb": peak_mb,
        "worker_overhead_percent": 0.0,
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
