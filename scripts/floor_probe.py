#!/usr/bin/env python
"""Measure the per-query streaming-executor floor on this machine.

The 143-query catalog's total is dominated by a FIXED per-execution cost,
not by kernels: every Ray Data execution (any pipeline that actually runs
tasks — `count()` on a bare read answers from metadata and skips it) pays
executor topology build + task-wave dispatch + `ray.wait` round-trips +
teardown.  This probe times the smallest real pipeline (single-file
parquet read → no-op map_batches → count) and a driver-side thread-stack
sample attributes the wall: ~60% blocked in `ray.wait` (the task
round-trip itself), ~15% task submission, the rest output plumbing — all
inside Ray's executor, none in this repo's code.

Multiply the floor by the catalog size to get the irreducible catalog
total on this box (e.g. 0.55 s × 143 ≈ 79 s of the ~190-210 s catalog).

Owns its Ray session (scripts own Ray; the library never calls ray.init).
"""
from __future__ import annotations

import collections
import json
import os
import sys
import threading
import time
import traceback

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    import ray.data

    path = os.path.join(SF_DIR, "nation.parquet")

    def run():
        return (
            ray.data.read_parquet(path)
            .map_batches(lambda b: b, batch_format="pyarrow")
            .count()
        )

    run()  # warm the workers / function export path once

    samples: collections.Counter = collections.Counter()
    stop = False
    main_id = threading.get_ident()

    def sampler():
        while not stop:
            for tid, frame in sys._current_frames().items():
                if tid in (threading.get_ident(), main_id):
                    continue
                st = traceback.extract_stack(frame)
                samples[st[-1].name] += 1
            time.sleep(0.002)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    stop = True
    th.join()
    times.sort()
    total = sum(samples.values()) or 1
    top = {
        name: round(100.0 * n / total, 1)
        for name, n in samples.most_common(8)
    }
    print(json.dumps({
        "metric": "per_query_executor_floor_sec",
        "median": round(times[len(times) // 2], 3),
        "min": round(times[0], 3),
        "runs": [round(t, 3) for t in times],
        "driver_thread_leaf_pct": top,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
