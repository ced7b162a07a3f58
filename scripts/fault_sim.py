"""Fault-tolerance evidence: kill a worker NODE mid-query on a simulated
4-node cluster and verify the driver still produces the oracle-exact answer.

What this demonstrates (and what it honestly doesn't):

* Ray's task lineage re-executes lost map/reduce tasks and reconstructs
  lost object-store blocks (`Attempting to recover N lost objects by
  resubmitting their tasks` in the raylet log), so a streaming task-based
  pipeline — every catalog query's plan under the local SORT_SHUFFLE
  strategy — can survive the loss of a whole node's tasks and blocks.
* Ray Data's session-internal actors (`_StatsActor`,
  `AutoscalingRequester`) are placed on an arbitrary node at first dataset
  execution; if THEY were on the killed node, the in-flight execution
  fails with `Failed to submit task to actor` and the production answer is
  a DRIVER-LEVEL RETRY (the same new-execution path any 100-TB job driver
  needs anyway, cf. `pipelines/flagship.py:run_resumable`'s shard-manifest
  skip).  The script retries up to 2 times and records how many attempts
  the run took — both outcomes (transparent lineage recovery, attempt=1;
  retry after internal-actor loss, attempt=2) are green runs.
* Queries that ride session-cached MATERIALIZED datasets
  (`queries._cached_frame` family) are intentionally NOT used here: a
  materialized block's owner dying is unrecoverable by design (Ray
  ownership model); the cache is a single-driver bench optimization, and
  its failure mode is "re-run the query", i.e. the same driver-level
  retry.

Usage: ``python scripts/fault_sim.py [sf_dir]`` — prints one JSON line.
Owns its Ray session.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERY = "events_sessionize"  # pure streaming plan: read -> map -> sort
TABLE = "events"             # exchange -> map_groups; no cached materialization


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    import duckdb
    import pandas as pd
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 8, "object_store_memory": 2 * 1024**3},
    )
    workers = [
        cluster.add_node(num_cpus=8, object_store_memory=2 * 1024**3)
        for _ in range(3)
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ray.init(address=cluster.address, include_dashboard=False,
             log_to_driver=False,
             runtime_env={"env_vars": {"PYTHONPATH": repo}})
    try:
        cluster.wait_for_nodes()
        from ray.data.context import DataContext

        DataContext.get_current().enable_operator_progress_bars = False
        from b_pdf_parser_ray.queries import ORACLE_SQL, QUERIES

        def run():
            df = QUERIES[QUERY](SF_DIR)
            return df.to_pandas() if not isinstance(df, pd.DataFrame) else df

        run()  # cold (worker spinup, read cache)
        t0 = time.time()
        run()
        warm = time.time() - t0

        result: dict = {}

        def runner():
            t1 = time.time()
            for attempt in range(1, 4):
                try:
                    result["df"] = run()
                    result["attempts"] = attempt
                    break
                except Exception as ex:  # noqa: BLE001 — infra failure path
                    result.setdefault("errors", []).append(
                        f"{type(ex).__name__}: {str(ex)[:140]}"
                    )
            result["sec"] = round(time.time() - t1, 2)

        th = threading.Thread(target=runner)
        th.start()
        time.sleep(warm * 0.4)
        killed_mid_flight = "df" not in result and "errors" not in result
        cluster.remove_node(workers[1])
        th.join(timeout=300)

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW {TABLE} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{TABLE}.parquet')"
        )
        want = con.sql(ORACLE_SQL[QUERY]).df()
        pd.testing.assert_frame_equal(
            _normalize(result["df"]), _normalize(want),
            check_dtype=False, check_exact=False, rtol=0, atol=1e-9,
        )
        print(json.dumps({
            "metric": "fault_sim",
            "query": QUERY,
            "sf_dir": SF_DIR,
            "warm_sec": round(warm, 2),
            "killed_mid_flight": killed_mid_flight,
            "attempts": result.get("attempts"),
            "infra_errors_caught": result.get("errors", []),
            "with_failure_sec": result["sec"],
            "oracle_green": True,
        }))
        assert killed_mid_flight, "node kill landed after completion; rerun"
        return 0
    finally:
        ray.shutdown()
        cluster.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
