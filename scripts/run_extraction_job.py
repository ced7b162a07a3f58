#!/usr/bin/env python
"""Cluster job entrypoint for the flagship extraction pipeline.

This is the script a fixed-size multi-node run submits:

    ray job submit --working-dir . -- \
        python scripts/run_extraction_job.py \
            --input  /data/corpus        \
            --output /data/extracted     \
            --max-inflight-shards 4

The driver process it runs in already belongs to the cluster (`ray job
submit` sets RAY_ADDRESS), so `ray.init()` here attaches rather than
starts a cluster; standalone invocations fall back to a local session.
Resume semantics: shards whose manifest says ``done`` are skipped, so
re-submitting the identical job after any failure completes only the
remainder (state/manifest.py).

Prints one JSON line with the aggregate manifest metrics.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus dir (parquet shards)")
    ap.add_argument("--output", required=True, help="output dir (shard=*/ + manifests)")
    ap.add_argument("--strategy", default="column")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--max-inflight-shards", type=int, default=2)
    ap.add_argument("--on-error", choices=["raise", "record"], default="record",
                    help="record: corrupt shards get a failed manifest and the "
                         "job continues (retried on resubmit)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from b_pdf_parser_ray.pipelines.flagship import DEFAULT_BATCH_SIZE, run_resumable

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        # PDF corpus: each file is one resumable shard (file-grain resume is
        # the natural unit for byte-stream inputs)
        files = sorted(glob.glob(os.path.join(args.input, "*.pdf")))
    if not files:
        raise SystemExit(f"no parquet or pdf shards under {args.input!r}")
    records = run_resumable(
        files,
        args.output,
        verify=not args.no_verify,
        batch_size=args.batch_size or DEFAULT_BATCH_SIZE,
        max_inflight_shards=args.max_inflight_shards,
        on_error=args.on_error,
    )
    done = [r for r in records if r.get("status") == "done"]
    failed = [r for r in records if r.get("status") == "failed"]
    print(json.dumps({
        "shards": len(records),
        "skipped_shards": sum(1 for r in records if r["skipped"]),
        "failed_shards": len(failed),
        "total": sum(r["total"] for r in done),
        "valid": sum(r["valid"] for r in done),
        "transactions": sum(r["transactions"] for r in done),
        "wall_sec_sum": round(sum(r.get("duration_sec", 0.0) for r in done), 2),
        "output": args.output,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
