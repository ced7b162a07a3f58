"""Fault-tolerance evidence: kill a worker NODE mid-query on a simulated
4-node cluster and verify the driver still produces the oracle-exact answer
— across the three plan phases that matter (round-4 verdict task 4):

* ``map_phase`` — kill lands early (40 % of warm wall) in
  ``events_sessionize``'s read/map stage.
* ``sort_exchange`` — kill lands late (75 % of warm wall), inside the
  sort exchange + ``map_groups`` tail of the same plan.
* ``hash_shuffle_join`` — ``cluster_profile(4)`` applied (HASH_SHUFFLE +
  sized aggregator reservations + rayfix) and the join forced above the
  broadcast gate (cap=0), kill lands mid-run (60 %) while the partitioned
  hash exchange — aggregator ACTORS, not just tasks — is in flight.

What this demonstrates (and what it honestly doesn't):

* Ray's task lineage re-executes lost map/reduce tasks and reconstructs
  lost object-store blocks (`Attempting to recover N lost objects by
  resubmitting their tasks` in the raylet log), so a streaming task-based
  pipeline — every catalog query's plan under the local SORT_SHUFFLE
  strategy — can survive the loss of a whole node's tasks and blocks.
* Ray Data's session-internal actors (`_StatsActor`,
  `AutoscalingRequester`) and HASH_SHUFFLE's per-stage aggregator actors
  are placed on arbitrary nodes; if THEY were on the killed node, the
  in-flight execution fails with `Failed to submit task to actor` /
  `ActorDiedError` and the production answer is a DRIVER-LEVEL RETRY (the
  same new-execution path any 100-TB job driver needs anyway, cf.
  `pipelines/flagship.py:run_resumable`'s shard-manifest skip).  Each case
  makes up to 3 attempts and records how many the run took — both outcomes
  (transparent lineage recovery, attempts=1; retry after actor loss,
  attempts>1) are green runs.  A case where all 3 attempts fail, or the
  runner thread exceeds its 300 s timeout, FAILS the script with the
  captured infra errors printed (no bare KeyError).
* Queries that ride session-cached MATERIALIZED datasets
  (`queries._cached_frame` family) are intentionally NOT used here: a
  materialized block's owner dying is unrecoverable by design (Ray
  ownership model); the cache is a single-driver bench optimization, and
  its failure mode is "re-run the query", i.e. the same driver-level
  retry.

Usage: ``python scripts/fault_sim.py [sf_dir] [case ...]`` — prints one
JSON line per case.  Owns its Ray session (a fresh simulated cluster per
case: a killed node must not leak into the next case's topology).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_NODES = 4
CPUS_PER_NODE = 8
OBJ_STORE = 2 * 1024**3

# (case name, query, kill point as fraction of warm wall, force hash plan)
# kill timing is warm-wall-relative and the faulted run's wall is ±30%
# noisy, so a case whose kill lands after completion is RERUN (fresh
# cluster) up to MAX_CASE_TRIES times rather than failed outright
CASES = [
    ("map_phase", "events_sessionize", 0.4, False),
    ("sort_exchange", "events_sessionize", 0.55, False),
    ("hash_shuffle_join", "q5_nation_revenue", 0.6, True),
]
MAX_CASE_TRIES = 3


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def run_case(name: str, query: str, kill_frac: float, hash_plan: bool) -> dict:
    import duckdb
    import pandas as pd
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": CPUS_PER_NODE,
                        "object_store_memory": OBJ_STORE},
    )
    workers = [
        cluster.add_node(num_cpus=CPUS_PER_NODE, object_store_memory=OBJ_STORE)
        for _ in range(N_NODES - 1)
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ray.init(address=cluster.address, include_dashboard=False,
             log_to_driver=False,
             runtime_env={"env_vars": {"PYTHONPATH": repo}})
    try:
        cluster.wait_for_nodes()
        from ray.data.context import DataContext

        DataContext.get_current().enable_operator_progress_bars = False
        from b_pdf_parser_ray.functions import joins
        from b_pdf_parser_ray.queries import ORACLE_SQL, QUERIES
        from b_pdf_parser_ray.sources.tables import TABLES

        saved_cap = joins.BROADCAST_MAX_SOURCE_ROWS
        if hash_plan:
            from b_pdf_parser_ray.cluster import (
                apply_cluster_profile,
                cluster_profile,
            )

            apply_cluster_profile(cluster_profile(N_NODES, CPUS_PER_NODE))
            joins.BROADCAST_MAX_SOURCE_ROWS = 0  # force the partitioned join

        try:
            def run():
                df = QUERIES[query](SF_DIR)
                return df.to_pandas() if not isinstance(df, pd.DataFrame) else df

            run()  # cold (worker spinup, read cache)
            t0 = time.time()
            run()
            warm = time.time() - t0

            result: dict = {}

            def runner():
                t1 = time.time()
                for attempt in range(1, 4):  # up to 3 attempts
                    try:
                        result["df"] = run()
                        result["attempts"] = attempt
                        break
                    except Exception as ex:  # noqa: BLE001 — infra failures
                        result.setdefault("errors", []).append(
                            f"{type(ex).__name__}: {str(ex)[:140]}"
                        )
                result["sec"] = round(time.time() - t1, 2)

            th = threading.Thread(target=runner, daemon=True)
            th.start()
            time.sleep(warm * kill_frac)
            killed_mid_flight = "df" not in result and "errors" not in result
            cluster.remove_node(workers[1])
            th.join(timeout=300)

            rec = {
                "metric": "fault_sim",
                "case": name,
                "query": query,
                "plan": "hash_shuffle" if hash_plan else "sort_shuffle",
                "sf_dir": SF_DIR,
                "warm_sec": round(warm, 2),
                "kill_at_frac": kill_frac,
                "killed_mid_flight": killed_mid_flight,
                "attempts": result.get("attempts"),
                "infra_errors_caught": result.get("errors", []),
                "with_failure_sec": result.get("sec"),
            }
            if th.is_alive():
                rec.update(oracle_green=False,
                           fail="runner exceeded 300s join timeout")
                return rec
            if "df" not in result:
                rec.update(oracle_green=False,
                           fail="all 3 attempts failed (see infra_errors)")
                return rec

            con = duckdb.connect()
            for t in TABLES:
                p = os.path.join(SF_DIR, f"{t}.parquet")
                if os.path.exists(p):
                    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{p}')")
            want = con.sql(ORACLE_SQL[query]).df()
            pd.testing.assert_frame_equal(
                _normalize(result["df"]), _normalize(want),
                check_dtype=False, check_exact=False, rtol=0, atol=1e-9,
            )
            rec["oracle_green"] = True
            if not killed_mid_flight:
                rec["fail"] = "node kill landed after completion; rerun"
            return rec
        finally:
            joins.BROADCAST_MAX_SOURCE_ROWS = saved_cap
    finally:
        ray.shutdown()
        cluster.shutdown()


def main() -> int:
    wanted = set(sys.argv[2:])
    rc = 0
    for name, query, frac, hash_plan in CASES:
        if wanted and name not in wanted:
            continue
        for attempt in range(MAX_CASE_TRIES):
            rec = run_case(name, query, frac, hash_plan)
            if rec.get("fail") == "node kill landed after completion; rerun":
                continue  # timing noise, not a verdict — fresh cluster retry
            break
        print(json.dumps(rec))
        if rec.get("fail") or not rec.get("oracle_green"):
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
