"""Driver-gate simulation: run every queries() entry at sf0.01 and compare
with its oracle_sql() twin the way the driver does (rows, schema, values
after sorting columns by name).  Rows-only entries (no oracle) just have to
run and return a well-formed frame — they are NOT value-sorted (list/vector
columns are unsortable, which is a sim artifact, not an operator failure).

Usage:  python scripts/gate_sim.py [sf_dir] [out_json]
        python scripts/gate_sim.py --hash-shuffle [sf_dir] [out_json]
Owns its Ray session (one session per box — never run concurrently with
pytest or bench.py).

``--hash-shuffle`` sweeps the ENTIRE catalog under the multi-node cluster
profile's execution strategy (HASH_SHUFFLE + sized aggregator reservations,
single node): every groupby/sort exchange takes the partitioned-aggregator
path a 100-TB fleet would use, so any latent empty-partition /
schema-broadcast / reservation defect (the class scripts/multinode_sim.py
first surfaced) shows up here as a per-query FAIL instead of in production.
Slower than the default sweep — the hash plan pays an actor-pool spinup per
exchange that the catalog's sort plans avoid at local sizes; this mode is a
correctness gate, not a benchmark.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import ray
import ray.data

args = [a for a in sys.argv[1:] if a != "--hash-shuffle"]
HASH_SHUFFLE = "--hash-shuffle" in sys.argv[1:]
SF = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT = args[1] if len(args) > 1 else "/tmp/gate_sim_result.json"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pd(r):
    if isinstance(r, ray.data.Dataset):
        return r.to_pandas()
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data.context import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_operator_progress_bars = False
    if HASH_SHUFFLE:
        # the multi-node strategy on one node: same plans, same defects
        from ray.data.context import ShuffleStrategy

        from b_pdf_parser_ray import rayfix
        from b_pdf_parser_ray.cluster import cluster_profile

        rayfix.apply()
        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        v = cluster_profile(4, 8).aggregator_cpus_per_partition
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = v
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = v
        ctx.join_operator_actor_num_cpus_per_partition_override = v
        print(f"# HASH_SHUFFLE sweep, aggregator cpus/partition={v}", flush=True)
    import __ray_entry__ as e

    Q, O = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    res = {}
    for name in sorted(Q):
        t0 = time.time()
        try:
            got = to_pd(Q[name](SF))
            el = round(time.time() - t0, 2)
            if name in O:
                got = norm(got)
                want = norm(con.sql(O[name]).df())
                ok_rows = len(got) == len(want)
                ok_schema = list(got.columns) == list(want.columns)
                ok_vals = False
                if ok_rows and ok_schema:
                    try:
                        pd.testing.assert_frame_equal(
                            got, want, check_dtype=False,
                            check_exact=False, rtol=0, atol=1e-9,
                        )
                        ok_vals = True
                    except AssertionError:
                        ok_vals = False
                res[name] = {
                    "ok": ok_rows and ok_schema and ok_vals,
                    "rows": len(got), "oracle_rows": len(want), "sec": el,
                }
            else:
                res[name] = {
                    "ok": len(got) >= 0, "rows": len(got),
                    "oracle_rows": None, "sec": el, "rows_only": True,
                }
        except Exception as ex:  # noqa: BLE001 — per-query containment
            res[name] = {
                "ok": False, "err": f"{type(ex).__name__}: {ex}",
                "sec": round(time.time() - t0, 2),
            }
            traceback.print_exc()
        status = "PASS" if res[name]["ok"] else "FAIL"
        print(f"{status} {name} {res[name]['sec']}s", flush=True)

    bad = {k: v for k, v in res.items() if not v["ok"]}
    print(json.dumps({
        "total": len(res), "pass": len(res) - len(bad), "fail": sorted(bad),
    }, indent=1))
    json.dump(res, open(OUT, "w"), indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
