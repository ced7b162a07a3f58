#!/usr/bin/env python
"""Hardware-scaling calibration for the extraction kernel (BASELINE.md).

Runs the pure-Python parse kernel (no Ray, no Arrow, no shared data) under
plain multiprocessing at several process counts and reports per-process and
total docs/s.  This separates the engine's scaling behavior from the host's:
if per-process rate is flat to K processes, throughput losses below K in the
Ray pipeline are engine overheads; losses beyond K are the machine's shared
memory bus / frequency ceiling, which a real multi-node cluster does not
share.

Usage:  python scripts/calibrate_scaling.py [proc_counts ...]
"""

from __future__ import annotations

import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(seed: int) -> float:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from b_pdf_parser_ray import fixtures, kernel, model

    docs = [fixtures.make_document(i + seed * 1000) for i in range(100)]
    texts = [(d["doc_id"], model.render_text(d["spans"]), d["strategy"]) for d in docs]
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 6.0:
        for doc_id, text, strategy in texts:
            kernel.parse_document(doc_id, text, strategy=strategy, verify=True)
            n += 1
    return n / (time.perf_counter() - t0)


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1, 3, 6, 12, 24]
    base = None
    for k in counts:
        with Pool(k) as p:
            rates = p.map(_work, range(k))
        per = sum(rates) / len(rates)
        total = sum(rates)
        if base is None:
            base = per
        print(
            f"procs={k:3d}  per-proc={per:8.0f} docs/s  total={total:9.0f}  "
            f"per-proc vs 1-proc: {per / base:.2f}"
        )


if __name__ == "__main__":
    main()
