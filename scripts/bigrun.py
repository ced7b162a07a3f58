"""Larger-than-object-store evidence run (round-4 verdict task 1).

Two phases, each owning a fresh Ray session, sized so the streamed corpus
is a small multiple of the session's object store — proving the engine's
two headline pipelines stream with bounded memory (spill, never OOM) at
the largest scale this sandbox's disk allows:

* ``flagship`` — generate an N-doc span corpus (uncompressed parquet,
  ~5.1 GB / 1M docs), run the resumable extract→sink job over every shard
  (zstd output), re-run to prove the manifest skip, record wall / docs/s /
  object-store spill counters, then DELETE corpus+output to free disk for
  phase 2.
* ``dedup`` — generate an N-doc ``documents``-shaped corpus with planted
  duplicate clusters (~4.3 GB / 1M docs uncompressed), cap the object
  store at OBJ_STORE_GB, run the full near-dedup keep pipeline
  (``dedup_near_keep``: MinHash-LSH pairs → connected components → keep
  min doc_id → anti-join) writing the keep list to parquet, and check the
  kept count against the planted structure's closed form (80% + the
  dup-free first decade, minus LSH near-miss stragglers).

Spill counters come from a filesystem watcher over the session's spill
directory (peak bytes/files — memory_summary needs grpc, absent here).

Usage: ``python scripts/bigrun.py <phase> [num_docs]``; prints one JSON
line per phase.  Owns its Ray sessions (scripts may; the library must
not).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/bigrun"
OBJ_STORE_GB = 12


def du_gb(path: str) -> float:
    return round(
        sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
            if os.path.isfile(f)
        )
        / 1e9,
        2,
    )


class SpillWatcher:
    """Samples the Ray session's object-spill directory every 2 s and
    records the PEAK spilled bytes (spill files are deleted as objects are
    freed, so an end-of-run du would understate).  memory_summary needs
    grpc, absent in this sandbox — the filesystem is the ground truth the
    raylet spills to anyway."""

    def __init__(self):
        import threading

        self.peak = 0
        self.files_seen = 0
        self._stop = False
        self._th = threading.Thread(target=self._run, daemon=True)
        self._th.start()

    def _dirs(self):
        import ray

        sess = ray._private.worker._global_node.get_session_dir_path()
        return [
            d
            for pat in ("*spill*", "ray_spilled_objects*")
            for d in glob.glob(os.path.join(sess, pat))
        ]

    def _run(self):
        while not self._stop:
            total, nfiles = 0, 0
            for d in self._dirs():
                for f in glob.glob(os.path.join(d, "**", "*"), recursive=True):
                    try:
                        if os.path.isfile(f):
                            total += os.path.getsize(f)
                            nfiles += 1
                    except OSError:
                        pass
            self.peak = max(self.peak, total)
            self.files_seen = max(self.files_seen, nfiles)
            time.sleep(2)

    def stop(self) -> dict:
        self._stop = True
        self._th.join(timeout=5)
        return {
            "spill_peak_gb": round(self.peak / 1e9, 3),
            "spill_files_peak": self.files_seen,
        }


def phase_flagship(num_docs: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data.context import DataContext

    DataContext.get_current().enable_operator_progress_bars = False
    from b_pdf_parser_ray.fixtures import write_corpus
    from b_pdf_parser_ray.pipelines.flagship import run_resumable

    corpus = os.path.join(BASE, "span_corpus")
    out = os.path.join(BASE, "extracted")
    rec: dict = {"metric": "bigrun_flagship", "num_docs": num_docs}

    t0 = time.time()
    if not os.path.exists(corpus + "._DONE"):
        shutil.rmtree(corpus, ignore_errors=True)
        write_corpus(corpus, num_docs, docs_per_file=25_000)
        open(corpus + "._DONE", "w").write(str(num_docs))
    rec["gen_sec"] = round(time.time() - t0, 1)
    rec["corpus_gb"] = du_gb(corpus)

    shards = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    rec["n_shards"] = len(shards)
    watcher = SpillWatcher()
    t0 = time.time()
    recs = run_resumable(shards, out, max_inflight_shards=6,
                         sink_compression="zstd")
    rec["extract_sec"] = round(time.time() - t0, 1)
    rec["docs_per_sec"] = round(num_docs / (time.time() - t0))
    rec["docs_total"] = sum(r.get("total", 0) for r in recs)
    rec["docs_valid"] = sum(r.get("valid", 0) for r in recs)
    rec["failed_shards"] = sum(1 for r in recs if r.get("status") == "failed")
    rec["output_gb"] = du_gb(out)

    # resume proof: a second run must skip every shard via its manifest
    t0 = time.time()
    recs2 = run_resumable(shards, out, max_inflight_shards=6,
                          sink_compression="zstd")
    rec["resume_sec"] = round(time.time() - t0, 1)
    rec["resume_all_skipped"] = all(r["skipped"] for r in recs2)

    rec.update(watcher.stop())
    ray.shutdown()
    # free the disk for the dedup phase (corpus + output ≈ the whole disk)
    shutil.rmtree(corpus, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.remove(corpus + "._DONE")
    return rec


def phase_dedup(num_docs: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False,
             object_store_memory=OBJ_STORE_GB * 1024**3)
    from ray.data.context import DataContext

    DataContext.get_current().enable_operator_progress_bars = False
    from b_pdf_parser_ray.fixtures import write_documents_corpus
    from b_pdf_parser_ray.queries import QUERIES

    corpus = os.path.join(BASE, "doc_corpus")
    keep_out = os.path.join(BASE, "keep_list")
    rec: dict = {
        "metric": "bigrun_dedup",
        "num_docs": num_docs,
        "object_store_gb": OBJ_STORE_GB,
    }

    t0 = time.time()
    if not os.path.exists(corpus + "._DONE"):
        shutil.rmtree(corpus, ignore_errors=True)
        write_documents_corpus(corpus, num_docs)
        open(corpus + "._DONE", "w").write(str(num_docs))
    rec["gen_sec"] = round(time.time() - t0, 1)
    rec["corpus_gb"] = du_gb(corpus)

    watcher = SpillWatcher()
    t0 = time.time()
    kept_ds = QUERIES["dedup_near_keep"](corpus)
    shutil.rmtree(keep_out, ignore_errors=True)
    kept_ds.write_parquet(keep_out)  # streaming consumption, bounded driver
    rec["dedup_sec"] = round(time.time() - t0, 1)
    rec["docs_per_sec"] = round(num_docs / (time.time() - t0))

    import pyarrow.parquet as pq

    kept = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(keep_out, "*.parquet"))
    )
    rec["kept"] = kept
    # planted structure: decades >= 10 keep 8 of 10 (exact copy + near copy
    # dropped); the first decade has no dups (ids 7, 8 are their own base).
    expected = num_docs - 2 * (num_docs // 10 - 1)
    rec["expected_kept"] = expected
    # LSH near-miss stragglers (mutated docs under the similarity
    # threshold) may survive: kept may exceed expected by a small margin
    rec["straggler_rate"] = round((kept - expected) / num_docs, 6)
    rec["kept_ok"] = 0 <= kept - expected <= num_docs * 0.005

    rec.update(watcher.stop())
    ray.shutdown()
    shutil.rmtree(keep_out, ignore_errors=True)
    return rec


def main() -> int:
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    num_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 9_000_000
    os.makedirs(BASE, exist_ok=True)
    ok = True
    if phase in ("flagship", "all"):
        rec = phase_flagship(num_docs)
        print(json.dumps(rec), flush=True)
        ok &= rec["resume_all_skipped"] and rec["failed_shards"] == 0
    if phase in ("dedup", "all"):
        rec = phase_dedup(num_docs)
        print(json.dumps(rec), flush=True)
        ok &= rec["kept_ok"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
