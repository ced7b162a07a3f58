"""Query catalog: named Ray Data pipelines + matching DuckDB oracle SQL.

Each entry is a callable ``(sf_dir) -> Dataset | pandas.DataFrame |
pyarrow.Table`` and, where the semantics are SQL-expressible, an ANSI-SQL
string producing the identical result (same column names, float columns
rounded on both sides) over the same parquet tables.  This is the driver's
correctness gate (CORRECTNESS_r{N}.json).

Scale discipline per query is noted inline: what is broadcast, what is
pre-aggregated, where the one shuffle is.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .functions.agg import grouped_agg, range_partitioned_agg, top_k
from .functions.numeric import sql_round
from .functions.ann import topk_cosine
from .functions.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .functions.textstats import (
    fingerprint_batch,
    lang_id_batch,
    quality_score_batch,
    term_freq_batch,
    token_stats_batch,
)
from .sources.tables import read_arrow, read_arrow_filtered, read_table
from .stages.extract import TextExtractor

def _hash_join_partitions(sf_dir: str, table: str) -> int:
    """Derived ``num_partitions`` for a query's hash-join plans: the
    ``functions.joins.join_partitions`` clamp on the query's LARGEST join
    side's parquet-footer row count, so one aggregator's share of the
    exchange stays worker-sized at any corpus.  The floor (=8) keeps
    fixture-scale runs on the partition count the forced-gate oracle
    tests pin."""
    from .functions.joins import join_partitions
    from .sources.tables import table_rows

    return join_partitions(table_rows(sf_dir, table))


# ---------------------------------------------------------------------------
# TPC-H-flavored relational pipelines
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Pricing summary (TPC-H Q1 shape), derived from the shared
    ``_lineitem_stats_frame`` execution (round-5 family fold): filter the
    le_cutoff grain flag, fold int counts + raw float sums to flag/status
    grain, avg = Σqty/Σn, per-member rounding last."""
    frame = _lineitem_stats_frame(sf_dir)
    f = frame[frame["le_cutoff"]]
    g = f.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("sum_qty", "sum"),
        sum_base_price=("sum_base_price", "sum"),
        sum_disc_price=("sum_disc_price", "sum"),
        count_order=("n", "sum"),
    )
    g["avg_qty"] = g["sum_qty"] / g["count_order"]
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        g[c] = sql_round(g[c], 2)
    g["count_order"] = g["count_order"].astype("int64")
    return g[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_qty", "count_order"]
    ]


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       round(avg(l_quantity), 2)                          AS avg_qty,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue_orders(sf_dir: str, num_partitions: int = None):
    """Revenue of BUILDING-segment orders (TPC-H Q3 shape).

    Join strategy — size-gated planner (``functions.joins``): orders
    (filtered) SEMI customer(BUILDING) on custkey, then per-batch lineitem
    revenue partials SEMI the surviving orderkeys.  Each semi-join runs as
    a broadcast ``is_in`` filter while the key side's SOURCE table (footer
    metadata, provable bound) is under the broadcast cap, and as a
    hash-partitioned ``left_semi Dataset.join`` above it — nothing
    fact-table-derived ever reaches the driver at scale.  In the broadcast
    regime the lineitem leg upgrades further: the semi filter + groupby
    fold into the exchange-free range-partitioned aggregate (see
    ``functions.agg.range_partitioned_agg``)."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import BROADCAST_MAX_SOURCE_ROWS, _collect_keys, semi_join
    from .sources.tables import table_rows

    cutoff = pa.scalar(pd.Timestamp("1998-01-01"), type=pa.timestamp("us"))

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cutoff)).select(
            ["o_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
    )
    def driver_order_keys() -> pa.Table:
        """BUILDING-segment orderkeys computed entirely on the driver —
        valid only under the broadcast gate (orders footer rows ≤ cap,
        the same bound that lets the Ray plan collect them), where it
        replaces two streaming executions with two footer-pruned reads."""
        bkeys = pc.drop_null(pc.unique(
            read_arrow_filtered(
                sf_dir, "customer", columns=["c_custkey"],
                filters=[("c_mktsegment", "==", "BUILDING")],
            ).column("c_custkey").combine_chunks()
        ))
        ot = read_arrow_filtered(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
            filters=[("o_orderdate", "<", pd.Timestamp("1998-01-01"))],
        )
        return ot.filter(
            pc.is_in(ot.column("o_custkey"), value_set=bkeys)
        ).select(["o_orderkey"])

    def order_keys_ds():
        return semi_join(
            orders, cust, "o_custkey", "c_custkey",
            right_source_rows=table_rows(sf_dir, "customer"),
            num_partitions=num_partitions,
        ).select_columns(["o_orderkey"])

    def revenue_cols(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.Table.from_arrays(
            [batch.column("l_orderkey"), rev], names=["l_orderkey", "revenue"]
        )

    agg = None
    if table_rows(sf_dir, "orders") <= BROADCAST_MAX_SOURCE_ROWS:
        # broadcast regime (same gate as the semi join): the surviving
        # orderkeys fit one array, so the lineitem semi + groupby can fold
        # into the exchange-free range-partitioned aggregate — lineitem
        # arrives ordered by orderkey, footer statistics prove it, and the
        # is_in filter runs inside each range task
        import os

        import ray

        from .functions.broadcast import get_cached

        from .functions.joins import _driver_keys

        keys_ref = ray.put(_driver_keys(driver_order_keys(), "o_orderkey"))

        def pre(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t.column("l_orderkey"), value_set=get_cached(keys_ref))
            return revenue_cols(t.filter(mask))

        agg = range_partitioned_agg(
            os.path.join(sf_dir, "lineitem.parquet"),
            ["l_orderkey"],
            [("revenue", "sum", "revenue")],
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
            pre=pre,
        )
        if agg is not None:
            agg = agg.rename_columns({"l_orderkey": "o_orderkey"})
    if agg is None:
        # exchange plan: per-batch revenue partials SEMI the surviving
        # orderkeys (size-gated), one orderkey-grain exchange
        from ray.data.aggregate import Sum

        li = read_table(
            sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
        )

        def revenue_partial(batch: pa.Table) -> pa.Table:
            t = revenue_cols(batch)
            out = t.group_by(["l_orderkey"], use_threads=False).aggregate(
                [("revenue", "sum")]
            )
            return out.rename_columns(["l_orderkey", "revenue"])

        agg = (
            semi_join(
                li.map_batches(revenue_partial, batch_format="pyarrow"),
                order_keys_ds(), "l_orderkey", "o_orderkey",
                right_source_rows=table_rows(sf_dir, "orders"),
                num_partitions=num_partitions,
                keys_driver=driver_order_keys,
            )
            .groupby("l_orderkey")
            .aggregate(Sum("revenue", alias_name="revenue"))
            .rename_columns({"l_orderkey": "o_orderkey"})
        )

    def round_rev(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = sql_round(b["revenue"], 2)
        return b

    # per-block select_k + fold instead of a global sort exchange
    return top_k(
        agg.map_batches(round_rev, batch_format="pandas"),
        10, [("revenue", "descending"), ("o_orderkey", "ascending")],
    )


Q3_SQL = """
SELECT l_orderkey AS o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_nation_revenue(sf_dir: str, num_partitions: int = None):
    """Revenue by customer nation: BOTH equi-joins go through the size-gated
    ``lookup_join`` (``functions.joins``) — lineitem revenue partials pick
    up ``o_custkey`` from orders, then custkey partials pick up
    ``c_nationkey`` from customer.  Under the cap each is a broadcast
    ``index_in``+``take``; above it the identical query text runs both as
    hash-partitioned ``Dataset.join`` exchanges (the forced-hash test pins
    that plan oracle-green — never a driver-built Python map).  Nation
    (25 rows, a true dimension) is broadcast with a vectorized lookup."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    import ray

    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    nation = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nation_ref = ray.put(nation.combine_chunks())

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), rev], names=["l_orderkey", "revenue"]
        )
        out = t.group_by(["l_orderkey"], use_threads=False).aggregate([("revenue", "sum")])
        return out.rename_columns(["l_orderkey", "revenue"])

    # The per-batch partials join directly — no intermediate
    # groupby(l_orderkey): orders-side keys are unique, so one joined row
    # per partial still sums correctly in the final nation groupby
    # (skipping the orderkey pre-shuffle halved the query in round 1).
    joined = lookup_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders, "l_orderkey", "o_orderkey", ["o_custkey"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        # broadcast plan: skip the collect execution — plain projection
        right_driver=lambda: read_arrow(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
    )

    # pre-aggregate by custkey per batch before the customer exchange — the
    # second join then moves one partial row per (custkey, batch)
    def cust_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["o_custkey", "revenue"])
        out = t.group_by(["o_custkey"], use_threads=False).aggregate([("revenue", "sum")])
        return out.rename_columns(["o_custkey", "revenue"])

    with_nation = lookup_join(
        joined.map_batches(cust_partial, batch_format="pyarrow"),
        cust, "o_custkey", "c_custkey", ["c_nationkey"],
        right_source_rows=table_rows(sf_dir, "customer"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
    )

    from .functions.broadcast import get_cached

    def to_nation(batch: pa.Table) -> pa.Table:
        nat = get_cached(nation_ref)
        idx = pc.index_in(
            batch.column("c_nationkey"), value_set=nat.column("n_nationkey")
        )
        names = pc.take(nat.column("n_name"), idx)
        return pa.Table.from_arrays(
            [names, batch.column("revenue")], names=["n_name", "revenue"]
        )

    out = grouped_agg(
        with_nation.map_batches(to_nation, batch_format="pyarrow"),
        ["n_name"],
        [("revenue", "sum", "revenue")],
        max_groups=64,  # nation dimension
    )

    def round_rev(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = sql_round(b["revenue"], 2)
        return b

    return out.map_batches(round_rev, batch_format="pandas")


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM nation
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY n_name
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape, derived from the shared ``_lineitem_stats_frame``
    execution: the 1996 ∩ discount-band ∩ qty<24 cells' Σ(extprice·disc)
    fold.  The grain keys carry the raw distinct discount values, so the
    BETWEEN filter here selects exactly the rows the per-row plan would
    (same float compare semantics)."""
    frame = _lineitem_stats_frame(sf_dir)
    f = frame[
        (frame["ship_year"] == 1996)
        & (frame["l_discount"] >= 0.05)
        & (frame["l_discount"] <= 0.07)
        & frame["qty_lt_24"]
    ]
    total = sql_round(pd.Series([f["sum_disc_rev"].sum()]), 2)
    return pa.Table.from_pydict({"revenue": pa.array(total, type=pa.float64())})


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q4_order_priority(sf_dir: str, num_partitions: int = None):
    """TPC-H Q4 shape (EXISTS semi-join): orders with at least one returned
    lineitem (the testdata schema has no commit/receipt dates, so the
    predicate is l_returnflag='R'), counted by priority.

    The EXISTS is a size-gated semi-join (``functions.joins``): lineitem
    ships per-batch-distinct qualifying orderkeys (map-side dedup shrinks
    either plan; semi-join semantics make a global dedup unnecessary).
    Broadcast ``is_in`` under the cap, hash-partitioned ``left_semi``
    exchange above it — no unbounded driver-side key collection."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import semi_join
    from .sources.tables import table_rows

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def late_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("l_returnflag"), "R")
        return pa.Table.from_arrays(
            [pc.unique(batch.filter(m).column("l_orderkey"))], names=["l_orderkey"]
        )

    late = li.map_batches(late_keys, batch_format="pyarrow")

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    lo = pa.scalar(pd.Timestamp("1995-07-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1995-10-01"), type=pa.timestamp("us"))

    def filt(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch.column("o_orderdate"), lo),
            pc.less(batch.column("o_orderdate"), hi),
        )
        return batch.filter(m).select(["o_orderkey", "o_orderpriority"])

    kept = semi_join(
        orders.map_batches(filt, batch_format="pyarrow"),
        late, "o_orderkey", "l_orderkey",
        right_source_rows=table_rows(sf_dir, "lineitem"),
        num_partitions=num_partitions,
        keys_driver=lambda: read_arrow_filtered(
            sf_dir, "lineitem", columns=["l_orderkey"],
            filters=[("l_returnflag", "==", "R")]),
    )
    return grouped_agg(
        kept.select_columns(["o_orderpriority"]),
        ["o_orderpriority"],
        [(None, "count", "order_count")],
        max_groups=64,  # priority enum
    ).sort("o_orderpriority")


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


PRICE_BANDS = [
    ("budget", 0.0, 500.0),
    ("mid", 500.0, 1200.0),
    ("premium", 1200.0, 1800.0),
    ("luxury", 1800.0, 10**9),
]


def parts_price_band_join(sf_dir: str):
    """Range join: parts against price-interval bands.

    The band table is tiny → broadcast interval lookup via one vectorized
    ``np.searchsorted`` over the sorted band edges per batch (the range-join
    analogue of a broadcast hash join; a big-big range join would instead
    bucket both sides by range and join per bucket).  Aggregates per band."""
    edges = np.array([b[1] for b in PRICE_BANDS][1:], dtype=np.float64)
    names = np.array([b[0] for b in PRICE_BANDS])
    ds = read_table(sf_dir, "part", columns=["p_retailprice"])

    def band(batch: pa.Table) -> pa.Table:
        prices = batch.column("p_retailprice").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, prices, side="right")
        return pa.Table.from_arrays(
            [pa.array(names[idx]), batch.column("p_retailprice")],
            names=["band", "p_retailprice"],
        )

    out = grouped_agg(
        ds.map_batches(band, batch_format="pyarrow"),
        ["band"],
        [(None, "count", "n_parts"), ("p_retailprice", "mean", "avg_price")],
        max_groups=64,  # fixed band list
    )

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b["avg_price"] = sql_round(b["avg_price"], 2)
        return b

    return out.map_batches(fin, batch_format="pandas").sort("band")


PARTS_BAND_SQL = """
SELECT b.band, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
FROM part
JOIN (VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0),
             ('premium', 1200.0, 1800.0), ('luxury', 1800.0, 1000000000.0))
     AS b(band, lo, hi)
  ON p_retailprice >= b.lo AND p_retailprice < b.hi
GROUP BY b.band
ORDER BY b.band
"""


# footer-rows bound under which the KMV sketch runs exact (k = rows+1); the
# driver fold is then ≤ |blocks|·(per-block distinct) ≈ rows×8 B ≤ 16 MB
APPROX_DISTINCT_EXACT_CAP = 2_000_000

# same gate for the hash-sample quantile sketch: k = rows keeps the whole
# population in the sample, so the empirical quantiles are exact
QUANTILES_EXACT_CAP = 2_000_000


def approx_distinct_orders(sf_dir: str, k: int = None):
    """KMV (k-minimum-values) distinct-count sketch over lineitem orderkeys.

    Pure sketch path: each batch emits its ≤k smallest 64-bit key hashes (a
    mergeable sketch), a tree-combine ``map_batches`` level merges many
    block partials back down to ≤k rows each, and the driver folds the few
    surviving partials into the final estimate D ≈ (k-1)/kth_min.  Nothing
    larger than a k-sized sketch is ever materialized anywhere.

    Exact-path gate: when the table's footer row count is ≤
    ``APPROX_DISTINCT_EXACT_CAP``, k grows to rows+1 so the sketch provably
    holds every distinct hash and the KMV "saw everything" branch returns
    the EXACT distinct count (modulo 64-bit hash collisions, ~n²/2⁶⁵ —
    negligible at the cap) — which is what makes the DuckDB oracle twin
    valid at fixture scales.  Above the cap the sketch path is unchanged
    and accuracy (rel error ≤ ~2/√k) is asserted in pytest, never faked.
    An EXPLICIT ``k`` opts out of the gate (the sketch-path tests pin the
    pure-sketch behavior with a deliberately small k)."""
    from .sources.tables import table_rows

    if k is None:
        k = 1024
        rows = table_rows(sf_dir, "lineitem")
        if rows <= APPROX_DISTINCT_EXACT_CAP:
            k = max(k, rows + 1)
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            hashed = keys * np.uint64(0x9E3779B97F4A7C15)
            hashed ^= hashed >> np.uint64(29)
            hashed *= np.uint64(0xBF58476D1CE4E5B9)
            hashed ^= hashed >> np.uint64(32)
        uniq = np.unique(hashed)
        return pa.Table.from_arrays(
            [pa.array(uniq[:k].view(np.int64))], names=["kmv"]
        )

    def combine(batch: pa.Table) -> pa.Table:
        merged = np.unique(
            batch.column("kmv").to_numpy(zero_copy_only=False).view(np.uint64)
        )[:k]
        return pa.Table.from_arrays([pa.array(merged.view(np.int64))], names=["kmv"])

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        # tree level: each combine task folds ~32 block sketches into one
        .map_batches(combine, batch_format="pyarrow", batch_size=32 * k)
        .to_pandas()
    )
    merged = np.unique(parts["kmv"].to_numpy().view(np.uint64))[:k]
    if len(merged) < k:
        estimate = float(len(merged))  # saw everything
    else:
        kth = float(merged[-1]) / float(2**64)
        estimate = (k - 1) / kth
    return pa.Table.from_pydict(
        {"estimated_distinct": [int(round(estimate))], "sketch_k": [k]}
    )


# valid at fixture scales because the exact-path gate (rows ≤
# APPROX_DISTINCT_EXACT_CAP → k = max(1024, rows+1)) makes the sketch exact;
# the SQL reproduces the gated k so sketch_k matches too
APPROX_DISTINCT_SQL = """
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS estimated_distinct,
       CAST(greatest(1024, count(*) + 1) AS BIGINT) AS sketch_k
FROM lineitem
"""

# valid at fixture scales via the exact-path gate (rows ≤ QUANTILES_EXACT_CAP
# → k = rows, the sample IS the population); the SQL mirrors the query's
# 1-based ceil(q·n) rank over the sorted column
ORDERS_QUANTILES_APPROX_SQL = """
WITH s AS (
  SELECT list_sort(list(o_totalprice)) AS v, count(*) AS n FROM orders
)
SELECT CAST(n AS BIGINT) AS sample_k,
       ROUND(v[LEAST(GREATEST(CAST(ceil(0.25 * n) AS BIGINT), 1), n)], 2) AS p25,
       ROUND(v[LEAST(GREATEST(CAST(ceil(0.50 * n) AS BIGINT), 1), n)], 2) AS p50,
       ROUND(v[LEAST(GREATEST(CAST(ceil(0.75 * n) AS BIGINT), 1), n)], 2) AS p75,
       ROUND(v[LEAST(GREATEST(CAST(ceil(0.90 * n) AS BIGINT), 1), n)], 2) AS p90,
       ROUND(v[LEAST(GREATEST(CAST(ceil(0.99 * n) AS BIGINT), 1), n)], 2) AS p99
FROM s
"""


def customers_without_orders(sf_dir: str, num_partitions: int = None):
    """Anti-join shape: customers with no orders — size-gated
    (``functions.joins``): broadcast NOT-``is_in`` filter while the orders
    table is under the cap, hash-partitioned ``left_anti Dataset.join``
    above it (customer-cardinality key sets aren't broadcastable at
    100 TB).  The orders side ships per-batch-distinct custkeys either way."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "orders")
    from .functions.joins import anti_join
    from .sources.tables import table_rows

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def keys(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.unique(batch.column("o_custkey"))], names=["o_custkey"]
        )

    have = orders.map_batches(keys, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    df = (
        anti_join(
            cust, have, "c_custkey", "o_custkey",
            right_source_rows=table_rows(sf_dir, "orders"),
            num_partitions=num_partitions,
            # broadcast plan: the key set is a plain orders projection
            keys_driver=lambda: read_arrow(
                sf_dir, "orders", columns=["o_custkey"]),
        )
        # no sort: customer-table-sized output; the driver compare is
        # row-order-insensitive
        .to_pandas()
    )
    if df.empty:
        # Ray's to_pandas drops schema on an empty Dataset; keep it typed so
        # the oracle comparison sees the columns (this testdata has no
        # order-less customers — matching the oracle's empty result exactly
        # is the assertion)
        return pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.string())],
            names=["c_custkey", "c_name"],
        )
    return pa.Table.from_pandas(df, preserve_index=False)


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def doc_embedding_join(sf_dir: str):
    """Equality enrich join across tables: documents ⋈ embeddings on
    doc_id = vec_id, then a vectorized norm on the embedding — the
    doc↔sidecar-metadata enrichment shape (SURVEY.md §2.6 J3).  Routed
    through the size-gated ``lookup_join`` planner like every other
    catalog join: broadcast `(vec_id, l2_norm)` under the 5M-row cap,
    hash-partitioned ``Dataset.join`` above it (the round-2/3 bench
    drift on this query was the hash plan's fixed actor-spinup floor
    paid even on tiny inputs — the gate removes it exactly where the
    exchange isn't worth it)."""
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norm(batch: pa.Table) -> pa.Table:
        from .functions.ann import embedding_matrix

        mat = embedding_matrix(batch.column("embedding"))
        return pa.Table.from_arrays(
            [
                batch.column("vec_id"),
                pa.array(sql_round(np.linalg.norm(mat, axis=1), 4)),
            ],
            names=["vec_id", "l2_norm"],
        )

    # project the vector payload down to its feature BEFORE the join —
    # whichever plan wins, it moves 8 bytes/row instead of the embedding
    # (and Arrow's hash join doesn't carry list columns at all)
    joined = lookup_join(
        docs,
        # LAZY: the hash plan's side is constructed only above the gate
        lambda: emb.map_batches(norm, batch_format="pyarrow"),
        "doc_id",
        "vec_id",
        ["l2_norm"],
        right_source_rows=table_rows(sf_dir, "embeddings"),
        # broadcast plan: the same norm kernel over a footer-pruned driver
        # read replaces the ~0.4s-floor Ray collect (thunk MUST replicate
        # the Dataset side exactly — same sql_round, same projection;
        # pinned by the dual normal + forced-gate oracle tests)
        right_driver=lambda: norm(
            read_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        ),
    )
    # no final sort: the output is corpus-sized and the driver's value-hash
    # compare is row-order-insensitive — a global sort here would be a pure
    # presentation all-to-all at 100 TB
    return joined.select_columns(["doc_id", "n_chars", "l2_norm"])


DOC_EMB_JOIN_SQL = """
SELECT doc_id, n_chars,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm
FROM documents JOIN embeddings ON doc_id = vec_id
"""


def orders_priority_counts(sf_dir: str):
    """Per-priority order counts — exact integer fold of the shared
    ``_orders_month_frame`` execution over its month dimension."""
    frame = _orders_month_frame(sf_dir)
    return frame.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum")
    )


ORDERS_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders FROM orders GROUP BY o_orderpriority
"""


def customer_nation_rollup(sf_dir: str):
    """Broadcast dimension join shape — since the shared-frame rewrite the
    (nationkey, segment) statistics come from the one ``_customer_dim_frame``
    execution and the 25-row nation dimension maps in on the driver (the
    in-batch ``index_in`` lookup join lives on in ``nation_party_mix`` and
    the q-suite)."""
    nation = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    names = dict(
        zip(nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist())
    )
    frame = _customer_dim_frame(sf_dir)
    out = (
        frame.assign(n_name=frame["c_nationkey"].map(names))
        .groupby("n_name", as_index=False)
        .agg(n_customers=("n_customers", "sum"),
             total_acctbal=("total_acctbal", "sum"))
    )
    out["n_customers"] = out["n_customers"].astype("int64")
    out["total_acctbal"] = sql_round(out["total_acctbal"], 2)
    return out


CUSTOMER_NATION_SQL = """
SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def top_parts_by_retail(sf_dir: str):
    """ORDER BY retail DESC LIMIT 10 via per-block select_k partials — a
    global sort exchange for a top-10 would move every part row."""
    return top_k(
        read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]),
        10, [("p_retailprice", "descending"), ("p_partkey", "ascending")],
    )


TOP_PARTS_SQL = """
SELECT p_partkey, p_name, p_retailprice FROM part
ORDER BY p_retailprice DESC, p_partkey LIMIT 10
"""


def _customer_dim_frame(sf_dir: str) -> pd.DataFrame:
    """(c_nationkey, c_mktsegment) counts + acctbal sums — one small-plan
    execution shared by ``distinct_segments`` and ``customer_nation_rollup``
    (both exact folds of this ≤|nations|×|segments| frame)."""

    def compute() -> pd.DataFrame:
        return grouped_agg(
            read_table(
                sf_dir, "customer",
                columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
            ),
            ["c_nationkey", "c_mktsegment"],
            [(None, "count", "n_customers"), ("c_acctbal", "sum", "total_acctbal")],
            max_groups=4096,  # nation dim x segment enum
        ).to_pandas()

    return _cached_frame("customer_dim", sf_dir, "customer", compute)


def distinct_segments(sf_dir: str):
    vals = sorted(_customer_dim_frame(sf_dir)["c_mktsegment"].unique())
    return pa.Table.from_arrays([pa.array(vals, type=pa.string())], names=["c_mktsegment"])


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


# ---------------------------------------------------------------------------
# Events (stream-shaped)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Shared events calendar frame: ONE execution for the whole family
# ---------------------------------------------------------------------------
#
# Seven catalog queries (hourly windows, moving average, anomaly z-scores,
# per-type stats, daily pivot, CUBE grouping sets, value×hour correlation)
# are all exact functions of the same (event_type, hour)-grain sufficient
# statistics.  Run separately they cost 7 scans + 7 exchanges + 7× the
# ~0.5 s per-execution streaming-executor floor (scripts/floor_probe.py);
# the shared frame runs ONE scan + ONE bounded exchange and each query
# derives its result from the ≤|types|×|hours| row frame on the driver —
# calendar-bounded (≤50k rows declared), never corpus-sized, so the
# derivations are scale-free.  Cached per (sf_dir, table-file fingerprint):
# a catalog/bench/gate session calls many family members over the same
# corpus back to back.

_SHARED_FRAME_CACHE: Dict = {}
# the whole-catalog session legitimately holds one entry per family frame +
# materialized shared pass (~15 in round 5); the old bound of 8 CLEARED the
# cache mid-catalog and siblings silently rebuilt their frames (measured:
# dedup_near_keep 0.8 s warm → 3.8 s after a clear).  64 still bounds a
# corpora-hopping test session; entries are value-domain frames or
# object-store ref handles, never corpus bytes.
_SHARED_FRAME_CACHE_MAX = 64


def _table_fingerprint(sf_dir: str, table: str):
    """Cheap cache key for a table's on-disk state: (path, mtime_ns, size)
    over the single file or every fragment file of a directory layout."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        parts = tuple(
            (f, os.stat(os.path.join(path, f)).st_mtime_ns,
             os.stat(os.path.join(path, f)).st_size)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
        return (path, parts)
    st = os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


def _events_calendar_frame(sf_dir: str) -> pd.DataFrame:
    """The family's sufficient statistics at (event_type, hour) grain:
    ``n_events`` (count), ``sum_value``/``sum_value_sq`` (raw float sums —
    each derivation applies its OWN output rounding), ``min_value``/
    ``max_value``.  One ``grouped_agg`` small-plan execution."""
    key = ("events_calendar", _table_fingerprint(sf_dir, "events"))
    hit = _SHARED_FRAME_CACHE.get(key)
    if hit is not None:
        return hit

    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_hour(batch: pa.Table) -> pa.Table:
        hour = pc.strftime(
            pc.floor_temporal(batch.column("ts"), unit="hour"),
            format="%Y-%m-%d %H:00:00",
        )
        value_sq = pc.multiply(batch.column("value"), batch.column("value"))
        return (
            batch.drop_columns(["ts"])
            .append_column("hour", hour)
            .append_column("value_sq", value_sq)
        )

    frame = grouped_agg(
        ds.map_batches(add_hour, batch_format="pyarrow"),
        ["event_type", "hour"],
        [
            (None, "count", "n_events"),
            ("value", "sum", "sum_value"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
            ("value_sq", "sum", "sum_value_sq"),
        ],
        max_groups=50_000,  # calendar-bounded: |types| x hourly buckets (~9k/type/yr)
    ).to_pandas()
    if len(_SHARED_FRAME_CACHE) > _SHARED_FRAME_CACHE_MAX:
        _SHARED_FRAME_CACHE.clear()  # bound: a test session hops corpora
    _SHARED_FRAME_CACHE[key] = frame
    return frame


def _cached_frame(key_name: str, sf_dir: str, table: str, compute):
    """Shared-frame memo: compute() once per (family, table on-disk state,
    Ray session); derivations across a catalog/bench/gate session then cost
    zero executions.  Results are identical to standalone runs by
    construction (each member applies its own finishing/rounding to the
    raw frame).  The Ray job id is part of the key because some entries
    are MATERIALIZED Datasets whose object-store blocks die with their
    session — a process that re-inits Ray must recompute, never hand back
    dead refs."""
    import ray

    job = (
        ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    )
    key = (key_name, job, _table_fingerprint(sf_dir, table))
    hit = _SHARED_FRAME_CACHE.get(key)
    if hit is not None:
        return hit
    frame = compute()
    if len(_SHARED_FRAME_CACHE) > _SHARED_FRAME_CACHE_MAX:
        _SHARED_FRAME_CACHE.clear()  # bound: a test session hops corpora
    _SHARED_FRAME_CACHE[key] = frame
    return frame


def _doc_length_frame(sf_dir: str) -> pd.DataFrame:
    """(lang, n_tokens) whitespace-token-length histogram of the corpus —
    ONE scan + one exchange shared by ``doc_length_histogram``,
    ``doc_length_quantiles``/``_cont`` and ``doc_lang_length_quantiles``.
    The frame is bounded by |langs| × |distinct lengths| (value-domain,
    never corpus) rows; null texts are dropped (no member counts them)."""

    def compute() -> pd.DataFrame:
        from ray.data.aggregate import Sum

        ds = read_table(sf_dir, "documents", columns=["lang", "text"])

        def partial(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch.column("text")))
            n_tokens = pc.cast(
                pc.add(pc.count_substring(batch.column("text"), " "), 1),
                pa.int64(),
            )
            t = pa.Table.from_arrays(
                [batch.column("lang"), n_tokens], names=["lang", "n_tokens"]
            )
            out = t.group_by(["lang", "n_tokens"], use_threads=False).aggregate(
                [([], "count_all")]
            )
            return out.rename_columns(["lang", "n_tokens", "n"])

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "n_tokens"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values(["lang", "n_tokens"], ignore_index=True)
        )

    return _cached_frame("doc_length", sf_dir, "documents", compute)


def _doc_enum_frame(sf_dir: str) -> pd.DataFrame:
    """(lang, source) counts + n_chars sums — one small-plan execution
    shared by ``lang_counts`` and ``top_sources_by_chars`` (both are exact
    integer folds of this ≤|langs|×|sources| frame)."""

    def compute() -> pd.DataFrame:
        return grouped_agg(
            read_table(sf_dir, "documents", columns=["lang", "source", "n_chars"]),
            ["lang", "source"],
            [(None, "count", "n_docs"), ("n_chars", "sum", "total_chars")],
            max_groups=4096,  # lang enum x source enum
        ).to_pandas()

    return _cached_frame("doc_enum", sf_dir, "documents", compute)


def _orders_month_frame(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, month) counts + o_totalprice sums — one small-plan
    execution shared by ``orders_priority_counts`` (fold months, exact int)
    and ``orders_monthly_trend`` (fold priorities)."""

    def compute() -> pd.DataFrame:
        ds = read_table(
            sf_dir, "orders", columns=["o_orderpriority", "o_orderdate", "o_totalprice"]
        )

        def add_month(batch: pa.Table) -> pa.Table:
            month = pc.strftime(batch.column("o_orderdate"), format="%Y-%m")
            return pa.Table.from_arrays(
                [batch.column("o_orderpriority"), month,
                 batch.column("o_totalprice")],
                names=["o_orderpriority", "month", "o_totalprice"],
            )

        return grouped_agg(
            ds.map_batches(add_month, batch_format="pyarrow"),
            ["o_orderpriority", "month"],
            [(None, "count", "n_orders"), ("o_totalprice", "sum", "revenue")],
            max_groups=32_768,  # priority enum x calendar months
        ).to_pandas()

    return _cached_frame("orders_month", sf_dir, "orders", compute)


def _lineitem_stats_frame(sf_dir: str) -> pd.DataFrame:
    """Lineitem sufficient statistics at (l_returnflag, l_linestatus,
    ship_year, l_discount, qty_lt_24, le_cutoff) grain — ONE scan + one
    bounded exchange shared by ``q1_pricing_summary`` (fold le_cutoff=True
    rows to flag/status grain; avg = Σqty/Σn) and ``q6_forecast_revenue``
    (fold the 1996 ∩ discount-band ∩ qty<24 cell's Σ extprice·discount).
    Grain is value-domain-bounded: flag(3) × status(2) × years(~7) ×
    distinct discounts(~11) × 2 × 2 ≈ 1.8k rows.  The two filter flags
    bake the members' CONSTANTS into the grain (q1's 1998-12-01 ship
    cutoff needs sub-year resolution; q6's qty<24): int count + raw float
    sums, each member applies its own output rounding — the same exact-
    fold contract as ``_events_calendar_frame``."""

    def compute() -> pd.DataFrame:
        ds = read_table(
            sf_dir,
            "lineitem",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate",
            ],
        )
        cutoff = pa.scalar(pd.Timestamp("1998-12-01"), type=pa.timestamp("us"))

        def prep(batch: pa.Table) -> pa.Table:
            disc = batch.column("l_discount")
            price = batch.column("l_extendedprice")
            return pa.Table.from_arrays(
                [
                    batch.column("l_returnflag"),
                    batch.column("l_linestatus"),
                    pc.cast(pc.year(batch.column("l_shipdate")), pa.int32()),
                    disc,
                    pc.less(batch.column("l_quantity"), 24),
                    pc.less_equal(batch.column("l_shipdate"), cutoff),
                    batch.column("l_quantity"),
                    price,
                    pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                    pc.multiply(price, disc),
                ],
                names=[
                    "l_returnflag", "l_linestatus", "ship_year", "l_discount",
                    "qty_lt_24", "le_cutoff", "l_quantity", "l_extendedprice",
                    "disc_price", "disc_rev",
                ],
            )

        return grouped_agg(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus", "ship_year", "l_discount",
             "qty_lt_24", "le_cutoff"],
            [
                (None, "count", "n"),
                ("l_quantity", "sum", "sum_qty"),
                ("l_extendedprice", "sum", "sum_base_price"),
                ("disc_price", "sum", "sum_disc_price"),
                ("disc_rev", "sum", "sum_disc_rev"),
            ],
            max_groups=16_384,  # enum x enum x years x distinct discounts x 2 x 2
        ).to_pandas()

    return _cached_frame("lineitem_stats", sf_dir, "lineitem", compute)


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window counts/sums per event type.

    Windows are assigned inside map_batches (no shuffle), then pre-aggregated
    partials shuffle to a (type × hour)-cardinality groupby — the shared
    ``_events_calendar_frame`` execution (one scan + one bounded exchange
    for the whole events calendar family)."""
    frame = _events_calendar_frame(sf_dir)
    out = frame[["event_type", "hour", "n_events"]].copy()
    out["sum_value"] = sql_round(frame["sum_value"], 2)
    return out


EVENTS_HOURLY_SQL = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def events_type_stats(sf_dir: str):
    """Per-type count/sum/min/max — an exact fold of the shared
    ``_events_calendar_frame`` (count and sum add over hour buckets, min of
    bucket mins / max of bucket maxes are the global min/max)."""
    frame = _events_calendar_frame(sf_dir)
    out = (
        frame.groupby("event_type", as_index=False)
        .agg(
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        )
    )
    out["sum_value"] = sql_round(out["sum_value"], 2)
    return out


EVENTS_TYPE_SQL = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def events_sessionize(sf_dir: str, gap_minutes: int = 30, num_partitions: int = None):
    """Session counts per user: salted groupby(user_id % P) shuffle, then a
    pandas per-user pass inside each partition — one Ray group per coarse
    partition instead of one per user (per-group machinery dominates at
    millions of users; same pattern as the dedup operators).  P scales with
    the events-table row count so one partition-group stays worker-sized.
    Ordering assumption: within one user's rows only — enforced by the
    in-group sort, never by block order (ray_guide.md 'Streaming-shaped')."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "events"))
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), num_partitions - 1), pa.int32()
        )
        return batch.append_column("part", part)

    gap_ns = np.timedelta64(gap_minutes * 60 * 1_000_000_000, "ns")

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: one (user, ts) sort, break detection by diff,
        # per-user reduction via reduceat — no per-user Python (measured
        # ~100× the naive per-user loop at 200k users)
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy(dtype="datetime64[ns]")
        if len(uid) == 0:
            return pd.DataFrame({"user_id": [], "n_events": [], "n_sessions": []})
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap_ns]
        breaks = (gap_break & ~new_user).astype(np.int64)
        starts = np.nonzero(new_user)[0]
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": np.diff(np.r_[starts, len(uid)]),
                "n_sessions": np.add.reduceat(breaks, starts) + 1,
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: sessions_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )


EVENTS_SESSIONIZE_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(CASE WHEN gap > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events
) t
GROUP BY user_id
"""


def events_hourly_moving_avg(sf_dir: str):
    """Sliding-window aggregate: 3-row moving average of hourly event-value
    sums per type.  Hourly sums come from the partial-agg path; the window
    runs per type (5 groups — no salting needed) as a sorted pandas rolling
    pass, matching SQL ROWS BETWEEN 2 PRECEDING AND CURRENT ROW.  Hourly
    sums come from the shared ``_events_calendar_frame`` execution; the
    rolling window runs over that calendar-bounded frame on the driver."""
    frame = _events_calendar_frame(sf_dir)

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour")
        g["moving_avg"] = sql_round(
            g["sum_value"].rolling(3, min_periods=1).mean(), 2
        )
        g["sum_value"] = sql_round(g["sum_value"], 2)
        return g

    return (
        frame[["event_type", "hour", "sum_value"]]
        .groupby("event_type", group_keys=False)[
            ["event_type", "hour", "sum_value"]
        ]
        .apply(window)
        .reset_index(drop=True)
    )


EVENTS_MOVING_AVG_SQL = """
SELECT event_type, hour, round(sum_value, 2) AS sum_value,
       round(avg(sum_value) OVER (PARTITION BY event_type ORDER BY hour
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
         AS moving_avg
FROM (
  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         sum(value) AS sum_value
  FROM events GROUP BY event_type, date_trunc('hour', ts)
) t
"""


def events_asof_attribution(sf_dir: str, num_partitions: int = None):
    """As-of join (backward): for every 'purchase' event, the same user's
    most recent 'click' at or before it — click→purchase attribution.

    Shape: one salted shuffle on user_id (both event roles carry the same
    key, so each partition holds every row it needs), then a per-partition
    ``pd.merge_asof(by=user_id)`` — vectorized, no per-user Python.  The
    partitioning assumption this operator relies on: the as-of key (user)
    must be entirely within one partition; the salt guarantees it.  P
    scales with the events row count (footer metadata)."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "events"))
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array(["purchase", "click"]),
        )
        batch = batch.filter(keep)
        part = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), num_partitions - 1), pa.int32()
        )
        return batch.append_column("part", part)

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        purchases = g[g["event_type"] == "purchase"].sort_values("ts")
        clicks = (
            g[g["event_type"] == "click"][["user_id", "ts"]]
            .rename(columns={"ts": "click_ts"})
            .sort_values("click_ts")
        )
        if purchases.empty:
            return pd.DataFrame({"user_id": [], "purchase_us": [], "click_us": []})
        m = pd.merge_asof(
            purchases[["user_id", "ts"]],
            clicks,
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
        )
        click = m["click_ts"].astype("datetime64[us]")
        # float64 with NaN for "no prior click": a nullable BIGINT lands as
        # float64 on the oracle side too, so the value-hash comparison sees
        # identical dtypes (epoch µs < 2^53 → float64 is exact)
        click_us = click.astype("int64").astype("float64").to_numpy()
        click_us[click.isna().to_numpy()] = np.nan
        return pd.DataFrame(
            {
                "user_id": m["user_id"],
                "purchase_us": m["ts"].astype("datetime64[us]").astype("int64"),
                "click_us": click_us,
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: asof(g.drop(columns=["part"])), batch_format="pandas")
    )


EVENTS_ASOF_SQL = """
SELECT p.user_id,
       epoch_us(p.ts) AS purchase_us,
       -- CAST keeps the oracle float64 even on a corpus where every purchase
       -- has a prior click (no NULL → DuckDB would emit int64; the Ray side
       -- is always float64 for the NaN case)
       CAST((SELECT epoch_us(max(c.ts)) FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
            AS DOUBLE) AS click_us
FROM events p WHERE p.event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Documents: text analysis + dedup + extraction
# ---------------------------------------------------------------------------


def events_daily_top_user(sf_dir: str, num_partitions: int = None):
    """Windowed top-1: highest-volume user per day, bounded-memory at any
    user cardinality via the salted-partition pattern (one exchange, like
    sessionize — an exact ``groupby((day,user)).aggregate(Sum)`` variant
    measured ~2× slower in a matched A/B, see BASELINE.md):

    1. in-batch (day,user) pre-reduce (Arrow C group-by) — the exchange
       carries one partial row per (day, user, block);
    2. salted shuffle on ``user_id % P`` (P from the events row count):
       all partials of one user land in one partition, so per-user daily
       sums are exact there; each partition group holds ≤ |partials|/P
       rows — never |active users|×|blocks| in one group (the round-2
       shape, unbounded at 10⁹ users/day);
    3. per-partition top-1 per day → ≤ |days|·P candidate rows total;
    4. final per-day argmax in ONE task over the ≤ |days|·P candidates
       (``repartition(1)`` — a groupby(day) here costs a full sort-shuffle
       stage for a tiny input, measured +0.8 s at sf0.1)."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "events"))
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def day_user_partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        t = pa.Table.from_arrays(
            [day, b.column("user_id"), b.column("value")],
            names=["day", "user_id", "total_value"],
        )
        out = t.group_by(["day", "user_id"], use_threads=False).aggregate(
            [("total_value", "sum")]
        ).rename_columns(["day", "user_id", "total_value"])
        part = pc.cast(
            pc.bit_wise_and(out.column("user_id"), num_partitions - 1), pa.int32()
        )
        return out.append_column("part", part)

    def top1_per_day(df: pd.DataFrame) -> pd.DataFrame:
        # argmax per day (ties → min user): one multi-key sort, first per day
        df = df.sort_values(
            ["day", "total_value", "user_id"], ascending=[True, False, True]
        )
        return df.drop_duplicates("day", keep="first")

    def part_top(g: pd.DataFrame) -> pd.DataFrame:
        # exact per-user daily sums (every partial of a user is in this
        # partition), then this partition's daily winners
        s = g.groupby(["day", "user_id"], sort=False, as_index=False)[
            "total_value"
        ].sum()
        return top1_per_day(s)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = top1_per_day(g)
        g["total_value"] = sql_round(g["total_value"], 2)
        return g[["day", "user_id", "total_value"]]

    return (
        ds.map_batches(day_user_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: part_top(g.drop(columns=["part"])), batch_format="pandas"
        )
        .repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
    )


EVENTS_DAILY_TOP_SQL = """
SELECT day, user_id, total_value FROM (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id,
         round(sum(value), 2) AS total_value,
         row_number() OVER (PARTITION BY date_trunc('day', ts)
                            ORDER BY sum(value) DESC, user_id) AS rn
  FROM events GROUP BY date_trunc('day', ts), user_id
) t WHERE rn = 1
"""


def _sample_hash_u64(ids: np.ndarray) -> np.ndarray:
    """THE engine-wide key hash: (id·A + B) mod 2⁶⁴ as uint64.

    Single definition — the HUGEINT oracle twin `(CAST(id AS HUGEINT) *
    {_SAMPLE_A} + {_SAMPLE_B}) % 18446744073709551616` must mirror this
    arithmetic exactly, so every sampling/sketch operator hashes through
    here rather than re-rolling the constants."""
    with np.errstate(over="ignore"):
        return ids.astype(np.uint64) * np.uint64(_SAMPLE_A) + np.uint64(_SAMPLE_B)


def _rev_e4(batch: pa.Table) -> "pa.Array":
    """Lineitem revenue in EXACT integer ten-thousandths: price has 2
    decimal digits and discount 2, so price_cents × (100 − disc_pct)
    carries no float error — group sums are exact integers on both
    engines and 2-dp rounding can never flip on a summation-order
    half-cent boundary (a double sum does: 615184.595… rounds differently
    per accumulation order).  SQL twin:
    ``CAST(round(l_extendedprice*100) AS BIGINT) *
    CAST(round((1-l_discount)*100) AS BIGINT)`` summed as BIGINT, then
    ``/10000.0``."""
    return pc.multiply(
        pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))),
            pa.int64(),
        ),
        pc.cast(
            pc.round(
                pc.multiply(
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        ),
    )


_SAMPLE_A = 0x9E3779B97F4A7C15  # 64-bit golden-ratio multiplier (Weyl sequence)
_SAMPLE_B = 1442695040888963407


def doc_sample_hash(sf_dir: str):
    """Deterministic 25% sample by content-independent key hash — the
    stable-sampling pattern (same rows every run, any cluster size, no
    coordination).  Keep iff (doc_id·A + B) mod 2⁶⁴ < 2⁶², computed as one
    vectorized numpy expression per batch (the round-1 version looped a
    Python ``hashlib.md5`` per row); the oracle reproduces the identical
    uint64 arithmetic in HUGEINT."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(ids)
        return batch.filter(pa.array(h < np.uint64(1 << 62)))

    return ds.map_batches(pick, batch_format="pyarrow")


DOC_SAMPLE_SQL = f"""
SELECT doc_id, n_chars FROM documents
WHERE (CAST(doc_id AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B}) % 18446744073709551616
      < 4611686018427387904
"""


def doc_token_stats(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )


DOC_TOKEN_SQL = """
SELECT doc_id,
       array_length(string_split(text, ' '))                 AS n_tokens,
       array_length(list_distinct(string_split(text, ' ')))  AS n_unique_tokens,
       round(array_length(list_distinct(string_split(text, ' ')))
             / CAST(array_length(string_split(text, ' ')) AS DOUBLE), 4) AS uniq_ratio
FROM documents
"""


def doc_bpe_tokens(sf_dir: str):
    """BPE-ish token counting (TOKEN_RX: words/numbers/symbols).  DuckDB's
    RE2 agrees with Python re on this alternation, so the query is
    oracle-checked (promoted from rows-only in round 2)."""
    from .functions.textstats import bpe_token_stats_batch

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        bpe_token_stats_batch, batch_format="pyarrow"
    )


DOC_BPE_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
         AS n_unique_bpe
FROM documents
"""


def doc_term_freq(sf_dir: str, term: str = "data"):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda b: term_freq_batch(b, term), batch_format="pyarrow"
    )


DOC_TERM_SQL = """
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'data', ''))) / 4 AS BIGINT) AS n_hits
FROM documents
WHERE length(text) - length(replace(text, 'data', '')) > 0
"""


def lang_counts(sf_dir: str):
    """Per-language doc counts — exact integer fold of the shared
    ``_doc_enum_frame`` execution over its source dimension."""
    frame = _doc_enum_frame(sf_dir)
    return frame.groupby("lang", as_index=False).agg(n_docs=("n_docs", "sum"))


LANG_COUNTS_SQL = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"


def top_sources_by_chars(sf_dir: str):
    """Top sources by total chars — exact integer fold of the shared
    ``_doc_enum_frame`` execution over its lang dimension."""
    frame = _doc_enum_frame(sf_dir)
    out = (
        frame.groupby("source", as_index=False)
        .agg(total_chars=("total_chars", "sum"), n_docs=("n_docs", "sum"))
        .sort_values(["total_chars", "source"], ascending=[False, True],
                     ignore_index=True)
        .head(5)
    )
    return out[["source", "total_chars", "n_docs"]]


TOP_SOURCES_SQL = """
SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
FROM documents GROUP BY source
ORDER BY total_chars DESC, source LIMIT 5
"""


def _exact_reps_materialized(sf_dir: str):
    """(doc_id, n_copies) representatives of the exact dedup — ONE salted
    hash-grain exchange shared by ``dedup_exact_docs`` and
    ``dedup_exact_keep`` (materialized Dataset: object-store blocks,
    bounded by |documents| rows of two int64s)."""
    from .sources.tables import table_rows

    def compute():
        return exact_dedup(
            read_table(sf_dir, "documents", columns=["doc_id", "text"]),
            source_rows=table_rows(sf_dir, "documents"),
        ).materialize()

    return _cached_frame("exact_reps", sf_dir, "documents", compute)


def dedup_exact_docs(sf_dir: str):
    return _exact_reps_materialized(sf_dir)


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text
"""


def extract_docs(sf_dir: str):
    """Flagship extraction kernel over arbitrary rendered text (the driver's
    documents table): per-doc validity / txn count / verification status.
    (Statement-shaped corpora are exercised by pytest fixtures and bench.py;
    this proves the engine is well-behaved on non-statement text.)"""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # task mode: fuses with the read; compiled patterns live at kernel
    # module level in reused workers (see flagship._extract_batch)
    extracted = ds.map_batches(
        lambda b: TextExtractor()(b),
        batch_format="pyarrow",
        batch_size=256,
    )

    def project(batch: pa.Table) -> pa.Table:
        status = pc.struct_field(batch.column("verification"), "status")
        n_txns = pc.list_value_length(batch.column("transactions"))
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.int64()),
                batch.column("is_valid"),
                pc.cast(n_txns, pa.int64()),
                status,
                batch.column("n_chars"),
            ],
            names=["doc_id", "is_valid", "n_txns", "status", "n_chars"],
        )

    return extracted.map_batches(project, batch_format="pyarrow")


# n_chars is the text-derived column that makes this oracle non-constant;
# the extraction-status columns are constant on this corpus because the
# driver documents are not statement-shaped (statement corpora are covered
# by the fixture-based differential tests)
EXTRACT_DOCS_SQL = """
SELECT doc_id, CAST(false AS BOOLEAN) AS is_valid, CAST(0 AS BIGINT) AS n_txns,
       'not_available' AS status, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def doc_lang_id(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow"
    )


def _lang_sql() -> str:
    """Oracle for the stopword-vote language ID: per-language distinct-token
    intersections, argmax with Python-max tie-break order (en,fr,es,de,id),
    'und' when every score is zero — promoted from rows-only in round 2."""
    from .functions.textstats import _LANG_STOPWORDS

    langs = list(_LANG_STOPWORDS)
    scores = ", ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
        + f"])) AS s_{lang}"
        for lang in langs
    )
    greatest = ", ".join(f"s_{lang}" for lang in langs)
    cases = []
    for i, lang in enumerate(langs):
        rest = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cond = " AND ".join(rest) if rest else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks FROM documents
), s AS (
  SELECT doc_id, {scores} FROM t
)
SELECT doc_id,
  CASE WHEN greatest({greatest}) = 0 THEN 'und'
       {' '.join(cases)}
       END AS lang_pred
FROM s
"""


DOC_LANG_SQL = _lang_sql()


def doc_quality(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pyarrow"
    )


# Same arithmetic as quality_score_batch, term for term (C4/Gopher-style
# rules are all length/ratio bands → plain SQL) — promoted from rows-only.
DOC_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_unique
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, n_unique,
         CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) / greatest(n_tokens, 1)
              ELSE 0 END AS mean_wl,
         least(n_tokens / 50.0, 1.0) AS len_score
  FROM t
)
SELECT doc_id,
       round(0.4 * len_score
             + 0.2 * (CASE WHEN mean_wl >= 2 AND mean_wl <= 12 THEN 1.0 ELSE 0.3 END)
             + 0.4 * (CASE WHEN n_tokens > 0 THEN n_unique / greatest(n_tokens, 1) ELSE 0 END),
             4) AS quality
FROM s
"""


def doc_fingerprints(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def _doc_salt_partitions(sf_dir: str, table: str, rows_per_doc: int) -> int:
    """P for the banded dedup shuffles: the exchanged rows are band rows
    (``rows_per_doc`` per document), so size P to the band-row count."""
    from .sources.tables import salted_partitions, table_rows

    return salted_partitions(table_rows(sf_dir, table) * rows_per_doc)


def _minhash_pairs_materialized(sf_dir: str):
    """MinHash-LSH candidate pairs at the family threshold (0.5) as a
    MATERIALIZED Dataset — ONE LSH pass (signatures → band explode →
    salted bucket shuffle) shared by ``dedup_minhash``,
    ``dedup_near_keep`` and ``dedup_ngram_verify``.  The cache holds
    object-store block refs (spillable), never driver memory, so it is
    scale-safe at any pair count; the pair set is partition-count
    invariant (a band bucket lives wholly inside one salt partition)."""

    def compute():
        return minhash_lsh_pairs(
            read_table(sf_dir, "documents", columns=["doc_id", "text"]),
            threshold=0.5,
            num_partitions=_doc_salt_partitions(sf_dir, "documents", 16),  # 16 bands
        ).materialize()

    return _cached_frame("minhash_pairs_05", sf_dir, "documents", compute)


def dedup_minhash(sf_dir: str):
    return _minhash_pairs_materialized(sf_dir)


def dedup_simhash(sf_dir: str):
    return simhash_pairs(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        max_hamming=3,
        num_partitions=_doc_salt_partitions(sf_dir, "documents", 4),  # 4 bands
    )


def dedup_embeddings(sf_dir: str):
    return embedding_near_dups(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.9,
        num_partitions=_doc_salt_partitions(sf_dir, "embeddings", 4),  # 4 tables
    )


def html_main_content(sf_dir: str):
    """HTML boilerplate strip (north-star §7.8), self-validating: each doc's
    text is wrapped in a deterministic boilerplate page, stripped back via
    the DOM-heuristic stage, and compared to the original.  Oracle checks
    recovered body length + media count per document."""
    from .stages.boilerplate import BoilerplateStripper, recovered_body, synth_page

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        ids = [str(d) for d in batch.column("doc_id").to_pylist()]
        htmls = [synth_page(i, t) for i, t in zip(ids, batch.column("text").to_pylist())]
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.string()), pa.array(htmls, type=pa.string())],
            names=["doc_id", "html"],
        )

    stripped = ds.map_batches(wrap, batch_format="pyarrow").map_batches(
        lambda b: BoilerplateStripper()(b), batch_format="pyarrow", batch_size=64
    )

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        bodies = [
            recovered_body(t, i)
            for t, i in zip(batch.column("main_text").to_pylist(), ids)
        ]
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.int64()),
                pa.array([len(b) for b in bodies], type=pa.int64()),
                pc.cast(batch.column("n_media"), pa.int64()),
            ],
            names=["doc_id", "body_chars", "n_media"],
        )

    return stripped.map_batches(project, batch_format="pyarrow")


HTML_MAIN_SQL = """
SELECT doc_id,
       length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS body_chars,
       CAST(1 AS BIGINT) AS n_media
FROM documents
"""


# Candidate-TEXT broadcast cap: unlike the joins planner's 8-byte-key cap,
# each broadcast row here carries a full document body, so the cap is in
# documents, not keys (100k docs × ~4 KB ≈ 400 MB object-store entry, read
# zero-copy by every verify task).  Above it the verification switches to
# two hash-partitioned Dataset.joins — unbounded scale.
NGRAM_VERIFY_BROADCAST_MAX_DOCS = 100_000


def dedup_ngram_verify(
    sf_dir: str,
    threshold: float = 0.5,
    max_broadcast_docs: int = None,
    num_partitions: int = None,
):
    """Exact n-gram Jaccard verification of MinHash-LSH candidate pairs —
    the verification itself runs DISTRIBUTED over the pair Dataset.

    Size-gated like ``functions.joins``, but on an EXACT bound: the pair
    list is materialized (it is consumed twice anyway), so |candidate docs|
    ≤ 2·|pairs| is known, not assumed.  Under the cap the candidate texts
    are fetched with a pushed-down filtered read (only row groups holding
    candidate ids are decoded — ``pq.read_table`` accepts a single file or
    a fragment directory) and broadcast once; above it — the dup-heavy
    corpus where candidates ≈ corpus — texts are attached to the pairs with
    two hash-partitioned ``Dataset.join``s (pairs⋈documents on ``a``, then
    on ``b``) and verified inside the joined batches, so nothing
    corpus-sized ever reaches the driver."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "documents")
    import ray

    from .functions.broadcast import get_cached
    from .functions.dedup import minhash_lsh_pairs, ngram_jaccard

    if max_broadcast_docs is None:
        max_broadcast_docs = NGRAM_VERIFY_BROADCAST_MAX_DOCS

    # pairs are consumed twice (count/keys + verification); the family
    # threshold rides the shared materialized LSH pass
    pairs_ds = (
        _minhash_pairs_materialized(sf_dir)
        if threshold == 0.5
        else minhash_lsh_pairs(
            read_table(sf_dir, "documents", columns=["doc_id", "text"]),
            threshold=threshold,
        ).materialize()
    )
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.float64())],
            names=["doc_a", "doc_b", "jaccard"],
        )

    def verify_texts(b: pa.Table, a_text, b_text) -> pa.Table:
        jac = pa.array(
            [round(ngram_jaccard(x, y), 5) for x, y in zip(a_text, b_text)],
            type=pa.float64(),
        )
        out = pa.Table.from_arrays(
            [b.column("a"), b.column("b"), jac], names=["doc_a", "doc_b", "jaccard"]
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    if 2 * n_pairs > max_broadcast_docs:
        # hash plan: attach text_a / text_b via two partitioned exchanges
        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        # Normalize the pair projection: Ray's groupby emits ZERO-COLUMN
        # empty blocks for empty partitions, which crash the hash-join's
        # per-partition pa.Table.join ("no match for FieldRef a") — rebuild
        # each block with the fixed (a, b) schema instead of select_columns.
        def pair_proj(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "a" not in b.column_names:
                return pa.Table.from_arrays(
                    [pa.array([], type=pa.int64()), pa.array([], type=pa.int64())],
                    names=["a", "b"],
                )
            return b.select(["a", "b"])

        # The repartition is load-bearing, not cosmetic: Ray skips the map
        # UDF on empty blocks, so zero-column PANDAS empties from the
        # upstream groupby survive pair_proj and poison the join's
        # schema inference (left schema = names=[] → "no match for FieldRef
        # a").  One cheap exchange over (a,b) int64 rows re-emits every
        # block as Arrow with the unified (a,b) schema.
        #
        # Rename the DOCS side before each join, never the join output:
        # rename_columns is a map op that Ray skips on the zero-row blocks
        # the hash join emits for empty partitions, so a post-join rename
        # leaves empties carrying the old name and the second join dies on
        # mixed schemas ("no match or multiple matches for FieldRef b").
        # Docs blocks come straight from the read and are never empty.
        docs_a = docs.rename_columns({"text": "text_a"})
        docs_b = docs.rename_columns({"text": "text_b"})
        j1 = pairs_ds.map_batches(pair_proj, batch_format="pyarrow").repartition(
            num_partitions
        ).join(
            docs_a, join_type="inner", num_partitions=num_partitions,
            on=("a",), right_on=("doc_id",),
        )
        j2 = j1.join(
            docs_b, join_type="inner", num_partitions=num_partitions,
            on=("b",), right_on=("doc_id",),
        )
        return j2.map_batches(
            lambda b: verify_texts(
                b, b.column("text_a").to_pylist(), b.column("text_b").to_pylist()
            ),
            batch_format="pyarrow",
        )

    # broadcast plan: candidate doc ids from the (tiny) pair set
    def pair_keys(b: pa.Table) -> pa.Table:
        ids = pc.unique(
            pa.chunked_array([b.column("a"), b.column("b")]).combine_chunks()
        )
        return pa.Table.from_arrays([ids], names=["doc_id"])

    key_tbl = pa.Table.from_pandas(
        pairs_ds.map_batches(pair_keys, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    need = pc.unique(key_tbl.column("doc_id").combine_chunks())
    # pushed-down candidate fetch: the `in` filter prunes row groups (and
    # fragments, when the table is a directory of files) at the read —
    # read_arrow_filtered dispatches on the single-file AND fragment-dir
    # layouts (tests/test_queries.py pins the directory case)
    from .sources.tables import read_arrow_filtered

    tbl = read_arrow_filtered(
        sf_dir, "documents",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", need.to_pylist())],
    ).combine_chunks()
    texts_ref = ray.put(
        dict(zip((str(d) for d in tbl.column("doc_id").to_pylist()),
                 tbl.column("text").to_pylist()))
    )

    def verify_batch(b: pa.Table) -> pa.Table:
        texts = get_cached(texts_ref)
        return verify_texts(
            b,
            (texts[str(x)] for x in b.column("a").to_pylist()),
            (texts[str(y)] for y in b.column("b").to_pylist()),
        )

    return pairs_ds.map_batches(verify_batch, batch_format="pyarrow")


def media_image_features(sf_dir: str):
    """Image decode→feature stage over the synthetic media table — the
    decode is a REAL pure-stdlib PNG/GIF codec (``stages/media.py``:
    zlib-inflate + per-filter reconstruction / LZW), exercised end-to-end;
    features, batching and the actor-pool plumbing are graded by the
    round-trip ground-truth tests in tests/test_html_media.py."""
    import ray.data

    from .stages.media import ImageFeatures, synth_media_table

    n = 120
    return ray.data.from_arrow(synth_media_table(n)).map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )


def media_audio_features(sf_dir: str):
    import ray.data

    from .stages.media import AudioFeatures, synth_media_table

    return ray.data.from_arrow(synth_media_table(120)).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )


def media_video_frames(sf_dir: str):
    import ray.data

    from .stages.media import VideoFrameSampler, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(120)).map_batches(
        VideoFrameSampler, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )
    return ds.select_columns(["media_id", "frame_idx"])


def synth_interleaved_spans(batch: pa.Table) -> pa.Table:
    """Deterministic interleaved-span rendering of a documents batch: one
    text span per whitespace token plus a media span after every 7th token
    (offsets 0..n_spans-1, media_ref = ``Im{offset}``) — the synthetic
    stand-in for the north rule's interleaved text+media corpus, shared by
    ``span_roundtrip_stats`` and ``doc_media_captions`` so their oracles can
    recompute the layout from ``text`` alone.  Fully vectorized (flattened
    token arrays + prefix sums; no per-doc Python)."""
    from .model import SPAN_TYPE

    tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
    toks = tok_lists.flatten()
    n_tok = pc.list_value_length(tok_lists).to_numpy().astype(np.int64)
    ndocs = len(n_tok)
    tok_doc = pc.list_parent_indices(tok_lists).to_numpy().astype(np.int64)
    tok_starts = np.cumsum(n_tok) - n_tok
    j = np.arange(len(toks), dtype=np.int64) - tok_starts[tok_doc]
    text_off = j + j // 7  # media after every 7th token shifts later spans
    n_med = n_tok // 7
    med_doc = np.repeat(np.arange(ndocs, dtype=np.int64), n_med)
    med_starts = np.cumsum(n_med) - n_med
    k = np.arange(len(med_doc), dtype=np.int64) - med_starts[med_doc] + 1
    med_off = 8 * k - 1

    doc_all = np.concatenate([tok_doc, med_doc])
    off_all = np.concatenate([text_off, med_off]).astype(np.int32)
    kind_all = pa.concat_arrays(
        [
            pa.nulls(len(toks), pa.string()).fill_null("text"),
            pa.nulls(len(med_doc), pa.string()).fill_null("media"),
        ]
    )
    text_all = pa.concat_arrays(
        [toks.cast(pa.string()), pa.nulls(len(med_doc), pa.string()).fill_null("")]
    )
    ref_all = pa.concat_arrays(
        [
            pa.nulls(len(toks), pa.string()).fill_null(""),
            pa.array([f"Im{o}" for o in med_off], type=pa.string()),
        ]
    )
    order = np.lexsort((off_all, doc_all))
    struct = pa.StructArray.from_arrays(
        [
            kind_all.take(pa.array(order)),
            text_all.take(pa.array(order)),
            ref_all.take(pa.array(order)),
            pa.array(off_all[order], type=pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    counts = (n_tok + n_med).astype(np.int32)
    offsets = pa.array(np.r_[0, np.cumsum(counts)].astype(np.int32))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.ListArray.from_arrays(offsets, struct)],
        names=["doc_id", "spans"],
    )


def span_roundtrip_stats(sf_dir: str):
    """Exploded-span path end-to-end, oracle-checked: each document's text
    is deterministically rendered as a span sequence (one text span per
    whitespace token, plus a media span inserted after every 7th token —
    offsets 0..n_spans-1 by construction), pushed through the REAL
    explode → salted shuffle → offset-ordered reassembly path, and reduced
    to per-document stats the oracle recomputes from ``text`` alone:

    * ``n_spans`` / ``n_media`` — lossless roundtrip (count identities);
    * ``offsets_ok`` — reassembled offsets are exactly 0..n_spans-1 in
      order (the oracle emits literal TRUE; the hash check enforces it);
    * ``body_chars`` — Σ len(text-span text) = len(text) - n_tokens + 1,
      so content (not just counts) survived the shuffle."""
    from .sources.tables import salted_partitions, table_rows
    from .stages.reassemble import explode, reassemble

    # one reassembly partition per ~50k documents (~5M spans at ~100
    # tokens/doc) — scales with the corpus, output-invariant.  Floor 16
    # (not the global 64): the sort exchange's fixed per-partition floor
    # dominates wall time at test sizes (measured 5.2s@P=64 vs 1.5s@P=16
    # on 5k docs), and unlike doc_pack_sequences P is not part of this
    # query's output or oracle, so the lower floor is purely physical.
    reassemble_parts = salted_partitions(
        table_rows(sf_dir, "documents"), target_rows=50_000, floor=16
    )
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    back = reassemble(
        explode(
            ds.map_batches(synth_interleaved_spans, batch_format="pyarrow"),
            num_partitions=reassemble_parts,
        )
    )

    def check(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
        n_spans = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        starts = np.cumsum(n_spans) - n_spans
        pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
        offs = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False).astype(np.int64)

        ndocs = batch.num_rows
        bad = np.zeros(ndocs, dtype=np.int64)
        np.add.at(bad, parent, (offs != pos).astype(np.int64))
        n_media = np.zeros(ndocs, dtype=np.int64)
        np.add.at(n_media, parent, is_media.astype(np.int64))
        body = np.zeros(ndocs, dtype=np.int64)
        np.add.at(body, parent, chars)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(n_spans),
                pa.array(n_media),
                pa.array(bad == 0, type=pa.bool_()),
                pa.array(body),
            ],
            names=["doc_id", "n_spans", "n_media", "offsets_ok", "body_chars"],
        )

    return back.map_batches(check, batch_format="pyarrow")


SPAN_ROUNDTRIP_SQL = """
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         len(string_split(text, ' ')) AS n,
         length(text) AS c
  FROM documents
)
SELECT doc_id,
       CAST(n + n // 7 AS BIGINT) AS n_spans,
       CAST(n // 7 AS BIGINT)     AS n_media,
       TRUE                       AS offsets_ok,
       CAST(c - n + 1 AS BIGINT)  AS body_chars
FROM t
"""


def media_caption_pairs(batch: pa.Table) -> pa.Table:
    """Interleaved-span → (doc_id, media_ref, caption) pairing kernel: each
    media span's caption is the run of text spans since the previous media
    span (or document start) in offset order, joined with single spaces —
    the image-caption pair miner a multimodal training corpus runs over the
    extractor's span layer.  Generic over any ``(doc_id, spans)`` batch.

    Vectorized end to end: per-doc segment ids via masked prefix sums, one
    ``binary_join`` over a prefix-sum ListArray for ALL captions in the
    batch (the extractor's text-assembly trick), and a sorted searchsorted
    to align each media span with its preceding text segment.  Media spans
    with no preceding text in their segment (consecutive media, media-first
    documents) emit an empty caption; text after the last media span pairs
    with nothing and is dropped."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
    is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
    n_spans = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.cumsum(n_spans) - n_spans
    media_before = np.cumsum(is_media) - is_media  # media strictly before, global
    seg = media_before - media_before[starts[parent]] if len(parent) else media_before
    key = (parent << np.int64(32)) | seg  # (doc, segment), sorted by construction

    tmask = ~is_media
    tkey = key[tmask]
    ttext = flat.field("text").filter(pa.array(tmask))
    if len(tkey):
        bnd = np.flatnonzero(np.r_[True, tkey[1:] != tkey[:-1]])
        grp_key = tkey[bnd]
        offs = np.r_[bnd, len(tkey)].astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs), ttext), " "
        )
    else:
        grp_key = np.empty(0, dtype=np.int64)
        joined = pa.array([], type=pa.string())

    mkey = key[is_media]
    mdoc = parent[is_media]
    mref = flat.field("media_ref").filter(pa.array(is_media))
    if len(grp_key):
        pos = np.searchsorted(grp_key, mkey)
        pos_c = np.minimum(pos, len(grp_key) - 1)
        ok = (pos < len(grp_key)) & (grp_key[pos_c] == mkey)
        cap = pc.if_else(pa.array(ok), joined.take(pa.array(pos_c)), "")
    else:
        cap = pa.nulls(len(mkey), pa.string()).fill_null("")
    doc_ids = batch.column("doc_id").combine_chunks().take(pa.array(mdoc))
    return pa.Table.from_arrays(
        [doc_ids, mref, cap], names=["doc_id", "media_ref", "caption"]
    )


def doc_media_captions(sf_dir: str):
    """Media↔caption pair mining over the interleaved span layer — the
    dataset builder that turns an interleaved text+media corpus into
    (media_ref, caption) training pairs for image-text models.  Documents
    render to the deterministic interleaved span sequence
    (``synth_interleaved_spans`` — media after every 7th token, the north
    rule's corpus shape), then ``media_caption_pairs`` pairs each media
    span with the text run since the previous media span.

    Scale shape: two fused map stages, ZERO exchanges — pairing is
    per-document, so the pipeline streams at read speed at any corpus size;
    the oracle recomputes every pair from ``text`` alone (hash-checked on
    the caption strings)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        synth_interleaved_spans, batch_format="pyarrow"
    ).map_batches(media_caption_pairs, batch_format="pyarrow")


MEDIA_CAPTIONS_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) // 7 AS n_med
  FROM documents
)
SELECT doc_id,
       'Im' || CAST(8*k - 1 AS VARCHAR) AS media_ref,
       array_to_string(toks[7*(k-1)+1 : 7*k], ' ') AS caption
FROM t, UNNEST(range(1, n_med + 1)) AS u(k)
"""


def media_ref_fanout(sf_dir: str):
    """Asset-level fetch planning over the interleaved span layer: distinct
    media refs with their document fanout — the dedupe-before-decode step a
    multimodal pipeline runs so each shared asset (site logo, CC-licensed
    stock image re-hosted across a crawl) is fetched/decoded ONCE, not once
    per referencing document.

    Scale shape: media spans are pre-counted per ref INSIDE each batch
    (Arrow C group-by), so the ``groupby(media_ref)`` exchange moves one
    partial row per (ref, batch) instead of one row per reference —
    the same partial-count reduction as ``doc_top_terms``."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def ref_partial(batch: pa.Table) -> pa.Table:
        spans = synth_interleaved_spans(batch).column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
        flat = spans.flatten()
        refs = flat.field("media_ref").filter(pc.equal(flat.field("kind"), "media"))
        t = pa.Table.from_arrays([refs], names=["media_ref"])
        out = t.group_by(["media_ref"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["media_ref", "n"])

    return (
        ds.map_batches(ref_partial, batch_format="pyarrow")
        .groupby("media_ref")
        .aggregate(Sum("n", alias_name="n_docs"))
    )


MEDIA_REF_FANOUT_SQL = """
WITH t AS (
  SELECT len(string_split(text, ' ')) // 7 AS n_med FROM documents
)
SELECT 'Im' || CAST(8*k - 1 AS VARCHAR) AS media_ref,
       CAST(count(*) AS BIGINT) AS n_docs
FROM t, UNNEST(range(1, n_med + 1)) AS u(k)
GROUP BY 1
"""


def extract_media_captions(sf_dir: str):
    """Caption mining over the REAL statement-extraction corpus: the
    deterministic fixture documents interleave media spans between
    statement lines at their original offsets (fixtures.make_document —
    including media-FIRST documents, which emit empty captions), so this is
    the ``media_caption_pairs`` kernel on production-shaped span data
    rather than the token-synthesized layer.  Rows-only (the fixture corpus
    is not a parquet view); pinned by pytest against per-doc span layout."""
    import ray.data

    from .fixtures import corpus_table

    ds = ray.data.from_arrow(corpus_table(500)).select_columns(
        ["doc_id", "spans"]
    )
    return ds.map_batches(media_caption_pairs, batch_format="pyarrow")


def extract_rollup_by_strategy(sf_dir: str):
    """Per-strategy extraction rollup — the reference benchmark's
    aggregate_by_parser/calculate_metrics (benchmark.py:125-169, 227-251,
    A4/A5) over the deterministic fixture corpus (all 4 strategies):
    counts, valid rate, total transactions."""
    import ray.data

    from .fixtures import corpus_table, make_table_document
    from .pipelines.flagship import extract_documents

    tbl = corpus_table(300)
    table_docs = pa.Table.from_pylist(
        [make_table_document(i) for i in range(40)], schema=tbl.schema
    )
    ds = ray.data.from_arrow(pa.concat_tables([tbl, table_docs]))
    # keep the strategy column alongside extraction output for the rollup
    strategies = dict(
        zip(
            (r["doc_id"] for r in tbl.to_pylist() + table_docs.to_pylist()),
            (r["strategy"] for r in tbl.to_pylist() + table_docs.to_pylist()),
        )
    )
    ext = extract_documents(ds)

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array([strategies[i] for i in ids], type=pa.string()),
                pc.cast(batch.column("is_valid"), pa.int64()),
                pc.cast(
                    pc.list_value_length(batch.column("transactions")), pa.int64()
                ),
            ],
            names=["strategy", "valid", "n_txns"],
        )

    out = grouped_agg(
        ext.map_batches(project, batch_format="pyarrow"),
        ["strategy"],
        [
            (None, "count", "n_docs"),
            ("valid", "sum", "n_valid"),
            ("n_txns", "sum", "total_txns"),
        ],
        max_groups=64,  # strategy enum
        coalesce=False,  # upstream PDF/extract stages need their small batch fan-out
    )
    return out.sort("strategy")


def extract_pdf_bytes(sf_dir: str, n_docs: int = 200):
    """Byte-stream PDF extraction END-TO-END — the north star's missing
    bottom layer run for real: deterministic REAL PDF files (object graph,
    FlateDecode content streams, xref tables — ``sources/pdfbytes.py``) →
    ``read_binary_files`` → xref/object parse + inflate + content-stream
    tokenization into reading-order spans → the flagship extraction kernel
    → per-strategy rollup.  The strategy sidecar is a REAL (doc_id,
    strategy) table attached through the size-gated lookup join
    (``functions/joins.py``): under the broadcast cap the planner ships it
    once via the ``right_driver`` thunk (zero extra Ray executions — the
    bench-size fast path); a >cap corpus, or the forced-gate test (cap=0),
    runs the hash-partitioned ``Dataset.join`` over the sidecar Dataset.
    The extractor drops non-schema columns, so the rollup side re-attaches
    strategy through the SAME planner call.

    Rows-only: PDF parsing is not SQL-expressible; pinned by
    tests/test_pdfbytes.py — byte-level span-sequence equality vs the span
    fixtures and rollup equality vs the span-table extraction path."""
    import os

    import ray.data

    from .fixtures import make_document
    from .functions.joins import lookup_join
    from .pipelines.flagship import extract_documents
    from .sources.pdfbytes import (
        pdf_batch_size,
        read_pdf_documents,
        write_pdf_corpus,
    )

    # v2: corpus mixes classic and PDF 1.5 structural forms (writer change
    # invalidates the cache — same args must mean same bytes)
    path = f"/tmp/pdf_corpus_{n_docs}_42_v3"
    marker = f"{path}._DONE"  # outside the dir: read_binary_files reads ALL files
    if not os.path.exists(marker):
        write_pdf_corpus(path, n_docs)
        with open(marker, "w") as f:
            f.write(str(n_docs))

    # the sidecar as a real table: n_docs rows of (doc_id, strategy) —
    # exactly [key] + value_cols per the lookup_join projection contract
    pairs = [
        (d["doc_id"], d["strategy"])
        for d in (make_document(i) for i in range(n_docs))
    ]
    sidecar_tbl = pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.string()),
            "strategy": pa.array([p[1] for p in pairs], type=pa.string()),
        }
    )

    def attach(ds, batch_size=None):
        return lookup_join(
            ds,
            # LAZY side (joins._force): constructed only when the hash plan
            # is selected; the broadcast plan uses the driver thunk
            lambda: ray.data.from_arrow(sidecar_tbl),
            "doc_id",
            "doc_id",
            ["strategy"],
            right_source_rows=n_docs,
            right_driver=lambda: sidecar_tbl,
            batch_size=batch_size,
            # spans is list<struct> — acero's Dataset.join rejects nested
            # non-key columns, so the >cap plan is the co-partition exchange
            hash_plan="copartition",
        )

    # batch_size must match the PDF source's per-task file granularity:
    # the fused tokenize→extract task otherwise coalesces to the LARGER
    # batch (256 docs/task → 8 tasks for 2000 files — a 4× wall hit,
    # measured; see read_pdf_documents docstring)
    bs = pdf_batch_size(path)
    ext = extract_documents(
        attach(read_pdf_documents(path, batch_size=bs), batch_size=bs),
        batch_size=bs,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(batch.column("is_valid"), pa.int64()),
                pc.cast(
                    pc.list_value_length(batch.column("transactions")), pa.int64()
                ),
            ],
            names=["doc_id", "valid", "n_txns"],
        )

    rolled = attach(ext.map_batches(project, batch_format="pyarrow"))
    out = grouped_agg(
        rolled.select_columns(["strategy", "valid", "n_txns"]),
        ["strategy"],
        [
            (None, "count", "n_docs"),
            ("valid", "sum", "n_valid"),
            ("n_txns", "sum", "total_txns"),
        ],
        max_groups=64,  # strategy enum
        coalesce=False,  # upstream PDF/extract stages need their small batch fan-out
    )
    return out.sort("strategy")


def extract_pdf_media_assets(sf_dir: str, n_docs: int = 200):
    """Embedded-media decode over the REAL PDF corpus — the
    ``media_ref_fanout`` dedupe-before-decode plan REALIZED on bytes: each
    task decodes its documents' image XObjects (Flate inflate + full
    five-filter PNG predictor inversion, codecs shared with
    ``stages/media.py``), emits per-(doc, ref) feature rows, and one
    ref-keyed exchange reduces to the asset level.  Shared assets (same
    ref ⇒ same pixels by construction) are verified by min==max feature
    agreement across every referencing document.

    Rows-only (byte decode isn't SQL); pinned by pytest pixel-exactness
    vs the deterministic source pattern."""
    import os

    from .sources.pdfbytes import media_features_batch, write_pdf_corpus

    path = f"/tmp/pdf_corpus_{n_docs}_42_v3"
    marker = f"{path}._DONE"
    if not os.path.exists(marker):
        write_pdf_corpus(path, n_docs)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    import ray.data

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".pdf")
    )
    ds = ray.data.from_arrow(pa.table({"path": pa.array(files)})).repartition(
        max(1, len(files) // 16)
    )
    per_doc = ds.map_batches(media_features_batch, batch_format="pyarrow")
    out = grouped_agg(
        per_doc,
        ["media_ref"],
        [
            (None, "count", "n_docs"),
            ("px_mean_e4", "min", "px_mean_e4"),
            ("px_mean_e4", "max", "px_mean_e4_max"),
            ("px_std_e4", "min", "px_std_e4"),
            ("width", "min", "width"),
            ("height", "min", "height"),
        ],
    )

    def consistent(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "consistent",
            pc.equal(batch.column("px_mean_e4"), batch.column("px_mean_e4_max")),
        ).drop_columns(["px_mean_e4_max"])

    return out.map_batches(consistent, batch_format="pyarrow").sort("media_ref")


def extract_pdf_caption_pairs(sf_dir: str, n_docs: int = 200):
    """VLM image↔text PAIR MINING from raw bytes — the artifact a
    multimodal training corpus actually ships: for every media span in
    every real PDF, its caption (text run since the previous media span,
    the ``media_caption_pairs`` kernel over BYTE-DERIVED spans) joined
    with the decoded asset's pixel features.  Caption mining and asset
    decode happen in the SAME task over the same file — ZERO exchanges;
    the asset-feature join is an in-task dict keyed by ref (shared assets
    are ref-identical by construction, proven by
    ``extract_pdf_media_assets``'s consistency check).

    Rows-only; pinned by pytest against the span-fixture captions and the
    deterministic pixel pattern."""
    import os

    from .sources.pdfbytes import (
        extract_media_assets,
        tokenize_pdf_bytes,
        write_pdf_corpus,
    )
    from .model import SPAN_TYPE

    path = f"/tmp/pdf_corpus_{n_docs}_42_v3"
    marker = f"{path}._DONE"
    if not os.path.exists(marker):
        write_pdf_corpus(path, n_docs)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    import ray.data

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".pdf")
    )

    def pairs_batch(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        doc_ids, span_lists = [], []
        px_mean: Dict[str, int] = {}
        from .sources.pdfbytes import PdfDocument

        for p in paths:
            with open(p, "rb") as f:
                data = f.read()
            doc_ids.append(os.path.splitext(os.path.basename(p))[0])
            # ONE structural parse serves tokenization and asset decode
            pdoc = PdfDocument(data)
            span_lists.append(tokenize_pdf_bytes(doc=pdoc))
            for ref, px in extract_media_assets(doc=pdoc).items():
                if ref not in px_mean:
                    px_mean[ref] = int(round(float(px.mean()) * 10_000))
        spans_tbl = pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(span_lists, type=pa.list_(SPAN_TYPE)),
            ],
            names=["doc_id", "spans"],
        )
        pairs = media_caption_pairs(spans_tbl)
        caps = pairs.column("caption")
        n_tokens = pc.if_else(
            pc.equal(caps, ""),
            pa.scalar(0, pa.int64()),
            pc.cast(pc.add(pc.count_substring(caps, " "), 1), pa.int64()),
        )
        means = pa.array(
            [px_mean[r] for r in pairs.column("media_ref").to_pylist()],
            type=pa.int64(),
        )
        return (
            pairs.append_column("n_caption_tokens", n_tokens)
            .append_column("px_mean_e4", means)
        )

    ds = ray.data.from_arrow(pa.table({"path": pa.array(files)})).repartition(
        max(1, len(files) // 16)
    )
    return ds.map_batches(pairs_batch, batch_format="pyarrow")


def events_type_distinct_approx(sf_dir: str, k: int = 1024):
    """Grouped KMV — approximate ``COUNT(DISTINCT user_id) GROUP BY
    event_type`` with a mergeable sketch PER KEY: the missing sibling of
    the global KMV (``approx_distinct_orders``) and of the exact grouped
    distinct (``q16_supplier_variety``).  At 10⁹ users per type the exact
    plan's exchange is (type, user)-grain; this one carries ≤k sketch rows
    per (type, block) — the shape that makes grouped distinct countable at
    100 TB.

    Scale shape: in-batch Arrow C distinct → per-type k-smallest Weyl
    hashes via one lexsort (no per-type Python); ONE exchange keyed on the
    low-cardinality type; in-group merge is a vectorized unique-truncate.
    Rows-only (a sketch); pinned by a pytest tolerance test vs DuckDB's
    exact per-type distinct (rel err ≤ 3/√k)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        distinct = batch.group_by(
            ["event_type", "user_id"], use_threads=False
        ).aggregate([])
        users = (
            distinct.column("user_id")
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        with np.errstate(over="ignore"):
            h = users * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
        types = distinct.column("event_type").to_numpy(zero_copy_only=False)
        tuniq, tcodes = np.unique(types, return_inverse=True)
        order = np.lexsort((h, tcodes))
        tc, hs = tcodes[order], h[order]
        starts = np.r_[0, np.flatnonzero(tc[1:] != tc[:-1]) + 1, len(tc)]
        keep = np.concatenate(
            [
                np.arange(starts[i], min(starts[i] + k, starts[i + 1]))
                for i in range(len(starts) - 1)
            ]
        ) if len(tc) else np.empty(0, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(tuniq[tc[keep]]),
                pa.array(hs[keep].view(np.int64)),
            ],
            names=["event_type", "kmv"],
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.unique(g["kmv"].to_numpy().view(np.uint64))[:k]
        if len(merged) < k:
            est = float(len(merged))
        else:
            est = (k - 1) / (float(merged[-1]) / float(2**64))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "estimated_distinct": [int(round(est))],
                "sketch_k": [k],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


def customer_yoy_outer(sf_dir: str):
    """Year-over-year revenue reconciliation — the FULL OUTER JOIN shape
    (completing the catalog's join matrix: inner/semi/anti/left-outer are
    elsewhere): per-customer 1995 vs 1996 order revenue, keeping customers
    active in EITHER year, with presence flags and the delta.

    Scale shape: no physical outer join at all — the scale-safe
    restatement is ONE aggregation exchange: each batch pre-reduces to
    per-customer (rev95, rev96, n95, n96) partials (masked integer-cents
    sums, Arrow C group-by inside ``grouped_agg``), the exchange sums
    them, and COALESCE semantics fall out of 0-valued partials + count
    flags.  An engine that shuffles two fact tables into an outer join to
    answer this moves |orders| rows; this moves |active customers| ×
    |blocks| partial rows — and the key domain is provably ≤ |customer|
    (footer rows), so under the cap the exchange disappears entirely."""
    from .sources.tables import table_rows

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def project(batch: pa.Table) -> pa.Table:
        yr = pc.year(batch.column("o_orderdate"))
        keep = pc.or_(pc.equal(yr, 1995), pc.equal(yr, 1996))
        t = batch.filter(keep)
        yr = pc.year(t.column("o_orderdate"))
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        is95 = pc.equal(yr, 1995)
        zero = pa.scalar(0, pa.int64())
        one = pa.scalar(1, pa.int64())
        return pa.Table.from_arrays(
            [
                t.column("o_custkey"),
                pc.if_else(is95, cents, zero),
                pc.if_else(is95, zero, cents),
                pc.if_else(is95, one, zero),
                pc.if_else(is95, zero, one),
            ],
            names=["custkey", "r95", "r96", "n95", "n96"],
        )

    agg = grouped_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        ["custkey"],
        [
            ("r95", "sum", "rev_1995_cents"),
            ("r96", "sum", "rev_1996_cents"),
            ("n95", "sum", "n95"),
            ("n96", "sum", "n96"),
        ],
        # provable bound: custkey ⊆ customer's key domain (footer rows);
        # grouped_agg falls back to the exchange past SMALL_GROUPS_CAP
        max_groups=table_rows(sf_dir, "customer"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("custkey"),
                batch.column("rev_1995_cents"),
                batch.column("rev_1996_cents"),
                pc.greater(batch.column("n95"), 0),
                pc.greater(batch.column("n96"), 0),
                pc.subtract(
                    batch.column("rev_1996_cents"), batch.column("rev_1995_cents")
                ),
            ],
            names=[
                "custkey", "rev_1995_cents", "rev_1996_cents",
                "in_1995", "in_1996", "delta_cents",
            ],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


CUSTOMER_YOY_OUTER_SQL = """
WITH a AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
),
b AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
)
SELECT COALESCE(a.custkey, b.custkey) AS custkey,
       CAST(COALESCE(a.r, 0) AS BIGINT) AS rev_1995_cents,
       CAST(COALESCE(b.r, 0) AS BIGINT) AS rev_1996_cents,
       a.custkey IS NOT NULL AS in_1995,
       b.custkey IS NOT NULL AS in_1996,
       CAST(COALESCE(b.r, 0) - COALESCE(a.r, 0) AS BIGINT) AS delta_cents
FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
"""


def extract_multi_source(sf_dir: str):
    """One pipeline over EVERY corpus format the engine reads — the "a
    user of the reference could switch" proof run as a query: three
    disjoint slices of the same fixture corpus materialized as parquet
    fragments, JSONL interchange, and real PDF files, each ingested
    through the ``read_documents`` format dispatcher, UNIONed into one
    Dataset, and extracted once.  Output: per-format rollup
    (n_docs, n_valid, total_txns).

    Rows-only; pinned by a pytest equality test against the single-source
    span-table path over the identical 100 documents."""
    import os

    import ray.data

    from .fixtures import corpus_table
    from .pipelines.flagship import extract_documents
    from .sources.pdfbytes import write_pdf_corpus
    from .sources.tables import read_documents, write_documents

    base = "/tmp/multi_source_corpus_v1"
    marker = f"{base}._DONE"
    if not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        pq_dir = os.path.join(base, "parquet")
        os.makedirs(pq_dir, exist_ok=True)
        import pyarrow.parquet as _pq

        _pq.write_table(
            corpus_table(40).select(["doc_id", "spans"]),
            os.path.join(pq_dir, "part0.parquet"),
        )
        write_documents(
            ray.data.from_arrow(
                corpus_table(30, start=40).select(["doc_id", "spans"])
            ),
            os.path.join(base, "docs.jsonl"),
        )
        write_pdf_corpus(os.path.join(base, "pdfs"), 30, start=70)
        with open(marker, "w") as f:
            f.write("100")

    branches = [
        read_documents(os.path.join(base, sub)).select_columns(
            ["doc_id", "spans"]
        )
        for sub in ("parquet", "docs.jsonl", "pdfs")
    ]
    unioned = branches[0].union(branches[1]).union(branches[2])
    ext = extract_documents(unioned)

    # doc index ranges identify the source format (disjoint by construction)
    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        idx = [int(d.rsplit("_", 1)[-1]) for d in ids]
        fmt = [
            "parquet" if i < 40 else ("jsonl" if i < 70 else "pdf") for i in idx
        ]
        return pa.Table.from_arrays(
            [
                pa.array(fmt, type=pa.string()),
                pc.cast(batch.column("is_valid"), pa.int64()),
                pc.cast(
                    pc.list_value_length(batch.column("transactions")), pa.int64()
                ),
            ],
            names=["source_format", "valid", "n_txns"],
        )

    return grouped_agg(
        ext.map_batches(project, batch_format="pyarrow"),
        ["source_format"],
        [
            (None, "count", "n_docs"),
            ("valid", "sum", "n_valid"),
            ("n_txns", "sum", "total_txns"),
        ],
        max_groups=64,  # source-format enum
        coalesce=False,  # upstream union carries a 16-files-per-task PDF slice
    ).sort("source_format")


def doc_top_terms(sf_dir: str, k: int = 20):
    """Corpus-wide top-k terms — the vocabulary/stopword-inventory builder.

    Scale shape: terms are exploded and pre-counted INSIDE each batch
    (Arrow C group-by), so the groupby(term) exchange moves one partial row
    per (term, batch) instead of one row per token occurrence — a ~10³×
    shuffle reduction on natural text (Zipf)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def term_partial(batch: pa.Table) -> pa.Table:
        terms = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.Table.from_arrays([terms], names=["term"])
        out = t.group_by(["term"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["term", "n"])

    return top_k(
        ds.map_batches(term_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n")),
        k, [("n", "descending"), ("term", "ascending")],
    )


DOC_TOP_TERMS_SQL = """
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


def corpus_tfidf_top_terms(sf_dir: str, k: int = 20):
    """Corpus-wide top-k terms by total TF-IDF — the salience-weighted
    vocabulary builder (plain counts rank stopwords first; tf·idf ranks
    what distinguishes documents).

    Scale shape: ONE exchange.  Each batch pre-reduces to (term, tf, df)
    partials with two Arrow C group-bys — (term, doc) pair counts, then per
    term — so term frequency AND document frequency cross the shuffle as
    one partial row per (term, batch).  df partials sum exactly because a
    document is one row (never split across batches).  N comes from footer
    metadata — no count pass."""
    from ray.data.aggregate import Sum

    from .sources.tables import table_rows

    n_docs = table_rows(sf_dir, "documents")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tfidf_partial(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern(batch.column("text"), " ")
        t = pa.Table.from_arrays(
            [pc.list_flatten(tok_lists), pc.list_parent_indices(tok_lists)],
            names=["term", "doc"],
        )
        td = t.group_by(["term", "doc"], use_threads=False).aggregate(
            [([], "count_all")]
        ).rename_columns(["term", "doc", "n"])
        out = td.group_by(["term"], use_threads=False).aggregate(
            [("n", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["term", "tf", "df"])

    agg = (
        ds.map_batches(tfidf_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b["tfidf"] = sql_round(b["tf"] * np.log(n_docs / b["df"].astype(np.float64)), 4)
        return b

    return top_k(
        agg.map_batches(score, batch_format="pandas"),
        k, [("tfidf", "descending"), ("term", "ascending")],
    )


CORPUS_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY term
)
SELECT term, tf, df,
       round(tf * ln((SELECT count(*) FROM documents) / CAST(df AS DOUBLE)), 4)
         AS tfidf
FROM agg ORDER BY tfidf DESC, term LIMIT 20
"""


def dedup_exact_keep(sf_dir: str, num_partitions: int = None):
    """Materialize the deduplicated corpus — the op a training pipeline
    actually runs after dedup analysis: one representative (min doc_id)
    per distinct text survives, annotated with its copy count.

    Scale shape: ``exact_dedup``'s groupby carries (content_hash, doc_id)
    only, and the surviving ids come back onto the corpus through the
    size-gated ``lookup_join`` (broadcast under the cap, hash-partitioned
    ``Dataset.join`` above — same planner as the TPC-H queries), so
    document bodies never shuffle."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "documents")
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    reps = _exact_reps_materialized(sf_dir)  # the shared dedup exchange
    kept = lookup_join(
        read_table(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        reps,
        "doc_id",
        "doc_id",
        ["n_copies"],
        # provable bound: reps ≤ documents rows (footer metadata)
        right_source_rows=table_rows(sf_dir, "documents"),
        num_partitions=num_partitions,
    )
    return kept


DEDUP_KEEP_SQL = """
WITH k AS (
  SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
  FROM documents GROUP BY text
)
SELECT d.doc_id, d.n_chars, k.n_copies
FROM documents d JOIN k USING (doc_id)
"""


def doc_length_histogram(sf_dir: str, bucket_width: int = 50):
    """Token-length histogram of the corpus — the length-distribution
    profile every data pipeline reports before filtering.  In-batch Arrow C
    pre-count; the exchange carries one (bucket, count) partial per block —
    the shared ``_doc_length_frame`` execution; the 50-wide buckets are an
    exact integer fold of its (lang, n_tokens) histogram."""
    frame = _doc_length_frame(sf_dir)
    out = (
        frame.assign(bucket=(frame["n_tokens"] // bucket_width) * bucket_width)
        .groupby("bucket", as_index=False)
        .agg(n_docs=("n", "sum"))
        .sort_values("bucket", ignore_index=True)
    )
    return out.astype({"bucket": "int64", "n_docs": "int64"})


DOC_LENGTH_HIST_SQL = """
SELECT CAST((len(string_split(text, ' ')) // 50) * 50 AS BIGINT) AS bucket,
       count(*) AS n_docs
FROM documents GROUP BY bucket ORDER BY bucket
"""


def doc_top_bigrams(sf_dir: str, k: int = 20):
    """Corpus top-k word bigrams — the order-sensitive n-gram inventory
    (collocation mining / contamination screens).

    Scale shape: bigrams are built vectorized (adjacent flat tokens joined
    where both sides belong to the same document) and pre-counted in-batch
    with Arrow C group-by, so the exchange carries one (bigram, batch)
    partial — never a row per bigram occurrence."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        flat = tok_lists.flatten()
        parent = pc.list_parent_indices(tok_lists).to_numpy()
        if len(flat) < 2:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.string()), pa.array([], type=pa.int64())],
                names=["bigram", "n"],
            )
        same_doc = parent[1:] == parent[:-1]
        bigrams = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        ).filter(pa.array(same_doc))
        t = pa.Table.from_arrays([bigrams], names=["bigram"])
        out = t.group_by(["bigram"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["bigram", "n"])

    return top_k(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n")),
        k, [("n", "descending"), ("bigram", "ascending")],
    )


DOC_TOP_BIGRAMS_SQL = """
SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i + 1])) AS bigram
  FROM documents
) GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""


# PII scrub patterns — RE2 syntax on BOTH sides (pyarrow.compute and DuckDB
# are RE2-based, so match/replace/count semantics are identical).
PII_EMAIL_RX = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RX = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def doc_pii_scrub(sf_dir: str):
    """PII redaction — the scrub pass every training-data pipeline runs
    before tokenization: emails then phone-number shapes are replaced by
    typed placeholders, with per-document redaction counts for audit.

    Fully vectorized (pc.count_substring_regex / replace_substring_regex —
    RE2, zero per-row Python); phones are counted AFTER email removal so an
    address's digits never double-count.  Value-hash-checked against the
    oracle on the full scrubbed strings."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_email = pc.count_substring_regex(text, PII_EMAIL_RX)
        t1 = pc.replace_substring_regex(
            text, pattern=PII_EMAIL_RX, replacement="<EMAIL>"
        )
        n_phone = pc.count_substring_regex(t1, PII_PHONE_RX)
        t2 = pc.replace_substring_regex(
            t1, pattern=PII_PHONE_RX, replacement="<PHONE>"
        )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                t2,
                pc.cast(n_email, pa.int64()),
                pc.cast(n_phone, pa.int64()),
            ],
            names=["doc_id", "clean_text", "n_emails", "n_phones"],
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


DOC_PII_SQL = f"""
WITH e AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{PII_EMAIL_RX}')) AS n_emails,
         regexp_replace(text, '{PII_EMAIL_RX}', '<EMAIL>', 'g') AS t1
  FROM documents
)
SELECT doc_id,
       regexp_replace(t1, '{PII_PHONE_RX}', '<PHONE>', 'g') AS clean_text,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{PII_PHONE_RX}')) AS BIGINT) AS n_phones
FROM e
"""


def doc_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality metrics (Rae et al. 2021, §A1.1):
    per document, the unique-word ratio, the fraction of word-bigram
    occurrences taken by the single most frequent bigram, and the fraction
    of duplicated word trigrams — the standard screens for boilerplate /
    pathologically repetitive crawl text.

    Scale shape: map-only (no exchange).  All three metrics are computed
    per batch with Arrow C kernels — split → flatten → adjacent
    ``binary_join_element_wise`` n-grams → ``pa.Table.group_by`` on
    (doc, gram) — and scatter back to row order through numpy; zero
    per-row Python.  Documents shorter than 3 tokens are dropped (the
    trigram metric is undefined), matching the oracle's inner joins."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def per_doc_gram_stats(parent: np.ndarray, grams, n_docs: int):
        """distinct-count and max-count per doc for a (parent, gram) pair
        stream, via one Arrow C group-by; returns (n_distinct, max_n)."""
        t = pa.Table.from_arrays(
            [pa.array(parent, type=pa.int64()), grams], names=["d", "g"]
        )
        counts = t.group_by(["d", "g"], use_threads=False).aggregate(
            [([], "count_all")]
        ).rename_columns(["d", "g", "n"])
        d = counts.column("d").to_numpy()
        n = counts.column("n").to_numpy()
        distinct = np.zeros(n_docs, dtype=np.int64)
        np.add.at(distinct, d, 1)
        mx = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(mx, d, n)
        return distinct, mx

    def stats(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        flat = tok_lists.flatten()
        parent = pc.list_parent_indices(tok_lists).to_numpy()
        n_tokens = pc.list_value_length(tok_lists).to_numpy().astype(np.int64)

        uniq_tok, _ = per_doc_gram_stats(parent, flat, n)

        same2 = parent[1:] == parent[:-1]
        bigrams = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        ).filter(pa.array(same2))
        _, top_bi = per_doc_gram_stats(parent[:-1][same2], bigrams, n)

        same3 = same2[1:] & same2[:-1]
        trigrams = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 2), flat.slice(1, len(flat) - 2),
            flat.slice(2), " ",
        ).filter(pa.array(same3))
        uniq_tri, _ = per_doc_gram_stats(parent[: len(flat) - 2][same3], trigrams, n)

        keep = n_tokens >= 3
        nt, ut, tb, utr = (a[keep] for a in (n_tokens, uniq_tok, top_bi, uniq_tri))
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").filter(pa.array(keep)),
                pa.array(nt),
                pa.array(sql_round(ut / nt, 4)),
                pa.array(sql_round(tb / (nt - 1), 4)),
                pa.array(sql_round(1.0 - utr / (nt - 2), 4)),
            ],
            names=[
                "doc_id", "n_tokens", "unique_ratio",
                "top_bigram_frac", "dup_trigram_frac",
            ],
        )

    return ds.map_batches(stats, batch_format="pyarrow")


DOC_REPETITION_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS gram FROM t),
bc AS (SELECT doc_id, gram, count(*) AS n FROM b GROUP BY 1, 2),
bstat AS (SELECT doc_id, max(n) AS top_bi, sum(n) AS n_bi FROM bc GROUP BY 1),
tri AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram FROM t),
tstat AS (SELECT doc_id, count(DISTINCT gram) AS uniq_tri, count(*) AS n_tri
          FROM tri GROUP BY 1),
u AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq
      FROM t)
SELECT u.doc_id, CAST(u.n_tokens AS BIGINT) AS n_tokens,
       round(u.n_uniq / CAST(u.n_tokens AS DOUBLE), 4) AS unique_ratio,
       round(bstat.top_bi / CAST(bstat.n_bi AS DOUBLE), 4) AS top_bigram_frac,
       round(1.0 - tstat.uniq_tri / CAST(tstat.n_tri AS DOUBLE), 4)
         AS dup_trigram_frac
FROM u JOIN bstat USING (doc_id) JOIN tstat USING (doc_id)
"""


def lang_top_docs(sf_dir: str, k: int = 3):
    """Grouped top-k: the ``k`` longest documents per language (ties to the
    lower doc_id) — the per-stratum exemplar query (inspect the extremes of
    every language before setting length filters).

    Scale shape: each batch pre-reduces to its own top-k per language (a
    mergeable partial, like ``customer_sample_per_segment``), so only
    ≤ |langs|·k·|blocks| candidate rows leave the map side; the final exact
    top-k + rank runs in ONE task over those candidates (|langs|·k output
    rows — driver-small by construction)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["lang", "n_chars", "doc_id"],
                          ascending=[True, False, True])
        return b.groupby("lang", sort=False).head(k)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = local_topk(b)
        b["rank"] = b.groupby("lang", sort=False).cumcount() + 1
        return b[["lang", "rank", "doc_id", "n_chars"]]

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
    )


LANG_TOP_DOCS_SQL = """
SELECT lang, rank, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS rank
  FROM documents) t
WHERE rank <= 3
"""


# Decontamination: documents sharing any 8-token shingle with the benchmark
# slice (doc_id % 49 == 0 — the held-out eval set stand-in) are flagged.
DECONTAM_BENCH_MOD = 49
DECONTAM_NGRAM = 8


def _ngram_stream(batch: pa.Table, n: int):
    """(parent_doc_index, n-gram string array) for all within-document
    word n-grams of a batch — adjacent-slice joins, zero per-row Python."""
    tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
    flat = tok_lists.flatten()
    parent = pc.list_parent_indices(tok_lists).to_numpy()
    m = len(flat) - (n - 1)
    if m <= 0:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    same = parent[n - 1:] == parent[: m]
    grams = pc.binary_join_element_wise(
        *[flat.slice(i, m) for i in range(n)], " "
    ).filter(pa.array(same))
    return parent[:m][same], grams


def doc_decontaminate(sf_dir: str):
    """Benchmark decontamination — the screen every training corpus runs
    against its eval sets (GPT-3 appx. C / PaLM-style n-gram overlap): a
    document that shares any 8-token shingle with a benchmark document is
    flagged, with the overlapping-occurrence count for audit.  Benchmark
    docs themselves are excluded from the output.

    Scale shape: the benchmark side is small BY DEFINITION (eval suites,
    not crawl data) — its distinct shingles are collected once and
    broadcast (``ray.put`` + per-worker cache); the corpus side is a
    map-only pass (vectorized n-gram build + ``pc.is_in`` + bincount), no
    exchange at any corpus size."""
    import ray

    from .functions.broadcast import get_cached

    bench_ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        mask = np.mod(batch.column("doc_id").to_numpy(), DECONTAM_BENCH_MOD) == 0
        _, grams = _ngram_stream(batch.filter(pa.array(mask)), DECONTAM_NGRAM)
        return pa.Table.from_arrays([pc.unique(grams)], names=["gram"])

    parts = bench_ds.map_batches(bench_grams, batch_format="pyarrow").take_all()
    gram_set = pc.unique(pa.array([r["gram"] for r in parts], type=pa.string()))
    set_ref = ray.put(gram_set)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def flag(batch: pa.Table) -> pa.Table:
        mask = (
            np.mod(batch.column("doc_id").to_numpy(), DECONTAM_BENCH_MOD) != 0
        )
        batch = batch.filter(pa.array(mask))
        parent, grams = _ngram_stream(batch, DECONTAM_NGRAM)
        hits = pc.is_in(grams, value_set=get_cached(set_ref)).to_numpy(
            zero_copy_only=False
        )
        n_hits = np.bincount(
            parent[hits], minlength=batch.num_rows
        ).astype(np.int64)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(n_hits), pa.array(n_hits > 0)],
            names=["doc_id", "n_hits", "contaminated"],
        )

    return ds.map_batches(flag, batch_format="pyarrow")


DECONTAM_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - {DECONTAM_NGRAM - 2}),
        i -> {" || ' ' || ".join(f"toks[i+{j}]" for j in range(DECONTAM_NGRAM))}))
        AS gram FROM t),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
hits AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM g JOIN bench USING (gram)
         WHERE g.doc_id % {DECONTAM_BENCH_MOD} <> 0 GROUP BY 1)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {DECONTAM_BENCH_MOD} <> 0
"""


# Exact-Jaccard pair audit: deterministic key-hash sample (doc_id % 13),
# all pairs with trigram-set Jaccard ≥ threshold.
JACCARD_SAMPLE_MOD = 13
JACCARD_THRESHOLD = 0.02


def dedup_jaccard_pairs(sf_dir: str):
    """Cached wrapper: ``dedup_cluster_docs`` consumes the same pair set,
    so the sample-quadratic compare runs once per corpus (materialized
    Dataset — object-store blocks, not driver memory)."""
    def compute():
        pairs = _dedup_jaccard_pairs_build(sf_dir)
        # empty-sample corpora return a plain Arrow table (no Dataset to
        # materialize) — cache it as-is
        return pairs.materialize() if hasattr(pairs, "materialize") else pairs

    return _cached_frame("jaccard_pairs", sf_dir, "documents", compute)


def _dedup_jaccard_pairs_build(sf_dir: str):
    """Exact n-gram Jaccard over all pairs of a deterministic sample — the
    oracle-checkable ground-truth audit for the sketch dedup family
    (MinHash/SimHash estimate THIS quantity; auditing a key-hash sample is
    how their thresholds are calibrated in production).

    Scale shape: all-pairs is quadratic BY DEFINITION, so it runs on a
    bounded sample (doc_id % {mod}) — never the corpus.  The sample's
    distinct-trigram sets are built vectorized per batch, collected once
    (bounded by the sample rate), dictionary-encoded to int32 ids, and
    broadcast; each task then compares ITS batch's docs against the
    higher-id half of the sample with a membership-vector intersection
    (numpy, no Python sets), distributing the O(s²) work across tasks."""
    import ray

    from .functions.broadcast import get_cached

    def sample_only(batch: pa.Table) -> pa.Table:
        mask = np.mod(batch.column("doc_id").to_numpy(), JACCARD_SAMPLE_MOD) == 0
        return batch.filter(pa.array(mask))

    sample = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        sample_only, batch_format="pyarrow"
    )

    def gram_lists(batch: pa.Table) -> pa.Table:
        parent, grams = _ngram_stream(batch, 3)
        t = pa.Table.from_arrays(
            [pa.array(parent, type=pa.int64()), grams], names=["d", "g"]
        )
        dist = t.group_by(["d", "g"], use_threads=False).aggregate([])
        d = dist.column("d").to_numpy()
        order = np.argsort(d, kind="stable")
        counts = np.bincount(d, minlength=batch.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.ListArray.from_arrays(
                    pa.array(offsets),
                    pc.take(dist.column("g").combine_chunks(), pa.array(order)),
                ),
            ],
            names=["doc_id", "grams"],
        )

    # _collect_arrow drops the zero-column empties Ray emits for blocks the
    # sample filter fully drained (the map UDF is skipped on empty blocks,
    # so they reach the driver schema-less and would break concat_tables)
    from .functions.joins import _collect_arrow

    side = _collect_arrow(sample.map_batches(gram_lists, batch_format="pyarrow"))
    if side.num_rows == 0 or "grams" not in side.column_names:
        return pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.float64())],
            names=["doc_a", "doc_b", "jaccard"],
        )
    # dictionary-encode ALL sample grams once → per-doc sorted id arrays
    grams_col = side.column("grams").combine_chunks()
    flat_ids = np.asarray(
        grams_col.flatten().dictionary_encode().indices.to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    offs = grams_col.offsets.to_numpy(zero_copy_only=False)
    doc_ids = side.column("doc_id").to_numpy()
    vocab = int(flat_ids.max()) + 1 if len(flat_ids) else 1
    side_ref = ray.put((doc_ids, offs, flat_ids, vocab))

    def pairs(batch: pa.Table) -> pa.Table:
        s_ids, s_offs, s_flat, s_vocab = get_cached(side_ref)
        pos_of = {int(d): i for i, d in enumerate(s_ids)}
        out_a, out_b, out_j = [], [], []
        member = np.zeros(s_vocab, dtype=bool)
        for a in batch.column("doc_id").to_numpy():
            ia = pos_of[int(a)]
            ga = s_flat[s_offs[ia]: s_offs[ia + 1]]
            member[ga] = True
            for ib in range(len(s_ids)):
                b = int(s_ids[ib])
                if b <= int(a):
                    continue
                gb = s_flat[s_offs[ib]: s_offs[ib + 1]]
                inter = int(member[gb].sum())
                union = len(ga) + len(gb) - inter
                j = float(sql_round(inter / union, 4)) if union else 0.0
                if j >= JACCARD_THRESHOLD:
                    out_a.append(int(a)); out_b.append(b); out_j.append(j)
            member[ga] = False
        return pa.Table.from_arrays(
            [
                pa.array(out_a, type=pa.int64()),
                pa.array(out_b, type=pa.int64()),
                pa.array(out_j, type=pa.float64()),
            ],
            names=["doc_a", "doc_b", "jaccard"],
        )

    return sample.select_columns(["doc_id"]).map_batches(
        pairs, batch_format="pyarrow"
    )


DEDUP_JACCARD_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE doc_id % {JACCARD_SAMPLE_MOD} = 0),
g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams FROM t)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.grams, b.grams)) /
               CAST(len(a.grams) + len(b.grams)
                    - len(list_intersect(a.grams, b.grams)) AS DOUBLE), 4)
           AS jaccard
  FROM g a JOIN g b ON a.doc_id < b.doc_id) p
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


def dedup_cluster_docs(sf_dir: str):
    """Near-dup clustering — exact-Jaccard pairs on the audit sample →
    distributed connected components → one cluster id (the component's
    min doc_id) and cluster size per sampled document.

    The CC step is the alternating small-star/large-star algorithm
    (``functions.dedup.connected_components``): pure edge-list groupbys,
    no label-table joins, O(log² n) rounds — the piece that turns a
    pair LIST into the KEEP/DROP decision a real dedup pipeline needs
    (transitive closure: A≈B, B≈C must put A and C in one cluster even
    when A≉C).  The oracle replays it as a recursive CTE."""
    from ray.data.aggregate import Count

    from .functions.dedup import connected_components
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    pairs = dedup_jaccard_pairs(sf_dir)

    def sample_ids(batch: pa.Table) -> pa.Table:
        mask = np.mod(batch.column("doc_id").to_numpy(), JACCARD_SAMPLE_MOD) == 0
        return batch.filter(pa.array(mask))

    nodes = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        sample_ids, batch_format="pyarrow"
    )
    labels = connected_components(
        pairs, a_col="doc_a", b_col="doc_b", nodes_ds=nodes, node_col="doc_id"
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "cluster_id": t.column("component")}
        ),
        batch_format="pyarrow",
    )
    sizes = labels.groupby("cluster_id").aggregate(Count(alias_name="cluster_size"))
    return lookup_join(
        labels,
        sizes,
        "cluster_id",
        "cluster_id",
        ["cluster_size"],
        # provable bound: |clusters| ≤ |sample| ≤ |documents| (footer rows);
        # past the broadcast cap the planner switches to the hash join
        right_source_rows=table_rows(sf_dir, "documents"),
    )


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE doc_id % {JACCARD_SAMPLE_MOD} = 0),
g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams FROM t),
p AS (SELECT doc_a, doc_b FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(len(list_intersect(a.grams, b.grams)) /
               CAST(len(a.grams) + len(b.grams)
                    - len(list_intersect(a.grams, b.grams)) AS DOUBLE), 4)
           AS jaccard
  FROM g a JOIN g b ON a.doc_id < b.doc_id) q
  WHERE jaccard >= {JACCARD_THRESHOLD}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM p
      UNION ALL SELECT doc_b, doc_a FROM p),
reach(n, r) AS (
  SELECT doc_id, doc_id FROM t
  UNION
  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.n
),
lab AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n)
SELECT lab.doc_id, lab.cluster_id,
       CAST(c.cluster_size AS BIGINT) AS cluster_size
FROM lab JOIN (SELECT cluster_id, count(*) AS cluster_size
               FROM lab GROUP BY cluster_id) c USING (cluster_id)
"""


NEAR_KEEP_THRESHOLD = 0.5


def dedup_near_keep(sf_dir: str, num_partitions: int = None):
    """End-to-end near-dedup keep list — the pipeline a 100 TB corpus
    actually runs: MinHash-LSH candidate pairs → distributed connected
    components over the pair graph → keep each cluster's min doc_id, drop
    the other members.  Output: the kept corpus (doc_id, lang, n_chars).

    Scale shape: pairs ≪ corpus at any realistic dup rate, so the CC
    rounds shuffle a bounded edge list; the drop-set anti join goes
    through the size-gated planner (broadcast under the cap,
    hash-partitioned ``Dataset.join`` above).  MinHash is a sketch →
    rows-only driver check; the composition is pinned in pytest against
    union-find ground truth on a planted-dup corpus."""
    from .functions.dedup import connected_components
    from .functions.joins import anti_join
    from .sources.tables import salted_partitions, table_rows

    n_docs = table_rows(sf_dir, "documents")
    if num_partitions is None:
        num_partitions = salted_partitions(n_docs)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])
    # NEAR_KEEP_THRESHOLD is the family threshold — the shared LSH pass
    pairs = _minhash_pairs_materialized(sf_dir)
    labels = connected_components(
        pairs, a_col="a", b_col="b", node_col="doc_id",
        num_partitions=num_partitions,
    )
    drops = labels.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("doc_id"), t.column("component"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return anti_join(
        docs.select_columns(["doc_id", "lang", "n_chars"]),
        drops,
        "doc_id",
        "doc_id",
        right_source_rows=n_docs,
    )


# One pack partition per ~1M documents: P is part of the OUTPUT (part,
# pack_id), so the oracle recomputes the identical formula from count(*).
PACK_TARGET_DOCS = 1_000_000


def doc_pack_sequences(sf_dir: str, seq_len: int = 2048, num_partitions: int = None):
    """Sequence packing — the operator that turns a document corpus into
    fixed-length training sequences: contiguous documents (within a salted
    partition, in doc_id order) are concatenated and cut into packs of
    ``seq_len`` tokens; a document's pack is where its first token lands.

    Scale shape: one salted shuffle (doc_id % P), then a fully vectorized
    in-partition cumsum — packing is embarrassingly parallel across
    partitions, which is exactly how production packers shard (global
    contiguity buys nothing for training and would serialize the corpus).
    P scales with the corpus (footer row count; 64 at bench sizes) so one
    partition-group never outgrows a worker."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(
            table_rows(sf_dir, "documents"), target_rows=PACK_TARGET_DOCS
        )
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tokens_and_part(batch: pa.Table) -> pa.Table:
        n_tokens = pc.cast(
            pc.add(pc.count_substring(batch.column("text"), " "), 1), pa.int64()
        )
        part = pc.cast(
            pc.bit_wise_and(batch.column("doc_id"), num_partitions - 1), pa.int32()
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), part, n_tokens],
            names=["doc_id", "part", "n_tokens"],
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        starts = g["n_tokens"].cumsum() - g["n_tokens"]
        g["pack_id"] = (starts // seq_len).astype("int64")
        return g

    return (
        ds.map_batches(tokens_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pandas")
    )


DOC_PACK_SQL = f"""
WITH np AS (
  SELECT CAST(POWER(2, CEIL(LOG2(GREATEST(64,
              CEIL(count(*) / {float(PACK_TARGET_DOCS)}))))) AS BIGINT) AS p
  FROM documents
)
SELECT doc_id, CAST(doc_id % (SELECT p FROM np) AS INTEGER) AS part, n_tokens,
       CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         sum(len(string_split(text, ' ')))
           OVER (PARTITION BY doc_id % (SELECT p FROM np) ORDER BY doc_id) AS cum
  FROM documents
) t
"""


MEDIA_TOKEN_COST = 16  # context-window budget per media span (VLM packing)


def doc_pack_interleaved(sf_dir: str, seq_len: int = 2048, num_partitions: int = None):
    """Multimodal sequence packing — ``doc_pack_sequences`` for INTERLEAVED
    text+media documents: each media span consumes a fixed
    ``MEDIA_TOKEN_COST``-token budget from the context window (the
    image-placeholder-token convention VLM trainers use), so a document's
    packing cost is n_text_tokens + 16·n_media over the deterministic
    interleaved layout (media after every 7th token).

    Same scale shape as the text packer: one salted shuffle, vectorized
    in-partition cumsum, P derived from the corpus row count."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(
            table_rows(sf_dir, "documents"), target_rows=PACK_TARGET_DOCS
        )
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def cost_and_part(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.add(pc.count_substring(batch.column("text"), " "), 1), pa.int64()
        )
        cost = pc.add(
            n_tok,
            pc.multiply(pc.divide(n_tok, 7), MEDIA_TOKEN_COST),
        )
        part = pc.cast(
            pc.bit_wise_and(batch.column("doc_id"), num_partitions - 1), pa.int32()
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), part, cost],
            names=["doc_id", "part", "mm_tokens"],
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        starts = g["mm_tokens"].cumsum() - g["mm_tokens"]
        g["pack_id"] = (starts // seq_len).astype("int64")
        return g

    return (
        ds.map_batches(cost_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pandas")
    )


DOC_PACK_INTERLEAVED_SQL = f"""
WITH np AS (
  SELECT CAST(POWER(2, CEIL(LOG2(GREATEST(64,
              CEIL(count(*) / {float(PACK_TARGET_DOCS)}))))) AS BIGINT) AS p
  FROM documents
)
SELECT doc_id, CAST(doc_id % (SELECT p FROM np) AS INTEGER) AS part, mm_tokens,
       CAST(floor((cum - mm_tokens) / 2048.0) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id,
         len(string_split(text, ' '))
           + {MEDIA_TOKEN_COST} * (len(string_split(text, ' ')) // 7) AS mm_tokens,
         sum(len(string_split(text, ' '))
           + {MEDIA_TOKEN_COST} * (len(string_split(text, ' ')) // 7))
           OVER (PARTITION BY doc_id % (SELECT p FROM np) ORDER BY doc_id) AS cum
  FROM documents
) t
"""


def doc_chunk_interleaved(sf_dir: str, seq_len: int = 256):
    """Within-document context-window chunking over the INTERLEAVED span
    layer — the companion to ``doc_pack_interleaved`` (which packs whole
    docs across a shard): split each interleaved text+media document into
    consecutive windows of ``seq_len`` effective tokens, media spans
    costing the fixed ``MEDIA_TOKEN_COST`` placeholder budget, and report
    each window's composition (n_text, n_media, cost) — the VLM-trainer
    view of how media density shapes usable context.

    Scale shape: ZERO exchanges.  A document's spans live in one batch, so
    the per-span prefix-sum (flattened cumsum minus per-doc base) and the
    (doc, chunk) roll-up are both in-batch Arrow C / numpy; the map emits
    final rows directly."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        spans_tbl = synth_interleaved_spans(batch)
        spans = spans_tbl.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
        cost = np.where(is_media, MEDIA_TOKEN_COST, 1).astype(np.int64)
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        n_spans = pc.list_value_length(spans).to_numpy().astype(np.int64)
        doc_start = np.cumsum(n_spans) - n_spans
        cum_before = np.cumsum(cost) - cost
        doc_base = (
            cum_before[doc_start] if len(cost) else np.empty(0, dtype=np.int64)
        )
        chunk_id = (cum_before - doc_base[parent]) // seq_len
        t = pa.Table.from_arrays(
            [
                pc.take(spans_tbl.column("doc_id"), pa.array(parent)),
                pa.array(chunk_id, type=pa.int64()),
                pa.array((~is_media).astype(np.int64)),
            ],
            names=["doc_id", "chunk_id", "is_text"],
        )
        g = t.group_by(["doc_id", "chunk_id"], use_threads=False).aggregate(
            [("is_text", "sum"), ([], "count_all")]
        )
        assert g.column_names[:2] == ["doc_id", "chunk_id"], g.column_names
        n_text = g.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
        n_all = g.column(3).to_numpy(zero_copy_only=False).astype(np.int64)
        n_media = n_all - n_text
        return pa.Table.from_arrays(
            [
                g.column("doc_id"),
                g.column("chunk_id"),
                pa.array(n_text),
                pa.array(n_media),
                pa.array(n_text + MEDIA_TOKEN_COST * n_media),
            ],
            names=["doc_id", "chunk_id", "n_text", "n_media", "chunk_cost"],
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


DOC_CHUNK_INTERLEAVED_SQL = f"""
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
txt AS (
  SELECT doc_id, (j + {MEDIA_TOKEN_COST} * (j // 7)) // 256 AS chunk_id,
         1 AS is_text
  FROM t, UNNEST(range(0, n_tok)) AS u(j)
),
med AS (
  SELECT doc_id, (7 * k + {MEDIA_TOKEN_COST} * (k - 1)) // 256 AS chunk_id,
         0 AS is_text
  FROM t, UNNEST(range(1, n_tok // 7 + 1)) AS u(k)
),
allsp AS (SELECT * FROM txt UNION ALL SELECT * FROM med)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(sum(is_text) AS BIGINT) AS n_text,
       CAST(count(*) - sum(is_text) AS BIGINT) AS n_media,
       CAST(sum(is_text)
            + {MEDIA_TOKEN_COST} * (count(*) - sum(is_text)) AS BIGINT)
         AS chunk_cost
FROM allsp GROUP BY doc_id, chunk_id
"""


def customer_sample_per_segment(sf_dir: str, n: int = 10):
    """Deterministic stratified sample: exactly ``n`` customers per market
    segment, chosen by key hash — same rows on every run, any cluster size,
    no coordination (the per-stratum version of ``doc_sample_hash``).

    Scale shape: each batch pre-reduces to its n smallest hashes per
    segment (a mergeable partial, same idea as ``topk_cosine``), so the
    groupby exchange carries ≤ |segments|·n·|blocks| candidate rows — never
    the stratum population.  A high-cardinality stratum key would use the
    salted-partition pattern with the same in-group vectorized rank."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def top_n_pd(g: pd.DataFrame) -> pd.DataFrame:
        # uint64 order == wrapped int64 bits; compare in uint64 space
        g = g.assign(hu=g["h"].to_numpy().view("uint64"))
        return g.sort_values(["hu", "c_custkey"]).head(n)[
            ["c_mktsegment", "c_custkey", "h"]
        ]

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(keys)
        df = pd.DataFrame(
            {
                "c_mktsegment": batch.column("c_mktsegment").to_pandas(),
                "c_custkey": batch.column("c_custkey").to_pandas(),
                "h": h.view(np.int64),
            }
        )
        out = df.groupby("c_mktsegment", sort=False, group_keys=False).apply(top_n_pd)
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(
            lambda g: top_n_pd(g)[["c_mktsegment", "c_custkey"]],
            batch_format="pandas",
        )
    )


CUSTOMER_SAMPLE_SQL = f"""
SELECT c_mktsegment, c_custkey FROM (
  SELECT c_mktsegment, c_custkey,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY (CAST(c_custkey AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B})
                    % 18446744073709551616,
                    c_custkey) AS rn
  FROM customer
) t WHERE rn <= 10
"""


def events_json_props(sf_dir: str):
    """Semi-structured extraction: parse the ``props`` JSON column and
    aggregate an extracted field per event type — the metadata-sidecar
    parsing every training pipeline does on raw crawl records.

    Scale shape: JSON decode is per-row C (``json.loads``) inside
    ``map_batches`` with the aggregate pre-reduced in-batch, so the
    exchange carries 5 partial rows per block, never parsed objects."""
    import json

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def parse_partial(batch: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p)["k"] for p in batch.column("props").to_pylist()),
            np.int64, batch.num_rows,
        )
        t = pa.Table.from_arrays(
            [batch.column("event_type"), pa.array(ks)], names=["event_type", "k"]
        )
        out = t.group_by(["event_type"], use_threads=False).aggregate(
            [("k", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["event_type", "sum_k", "n"])

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(parse_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))
        .sort("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def doc_normalize_text(sf_dir: str):
    """Text normalization — lowercase, collapse whitespace runs, trim — the
    cleaning pass upstream of tokenization/dedup.  Vectorized end to end
    with pyarrow compute kernels (no Python per row); value-hash-checked
    against the oracle on the full normalized strings."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column("text")), pattern=r"\s+", replacement=" "
            )
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), t], names=["doc_id", "norm_text"]
        )

    return ds.map_batches(norm, batch_format="pyarrow")


DOC_NORMALIZE_SQL = r"""
SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
FROM documents
"""


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------


def _query_vector(sf_dir: str) -> np.ndarray:
    """One query vector by id — row-group-pushdown filtered read, so only
    matching row groups leave storage (a full-table driver read of a
    10^12-row embeddings table to fetch one row would be the bug)."""
    import os

    import pyarrow.parquet as pq

    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    return np.asarray(emb.column("embedding")[0].as_py(), dtype=np.float64)


def ann_topk(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return topk_cosine(ds, _query_vector(sf_dir), k=20)


ANN_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST((SELECT qv FROM q) AS DOUBLE[])), 5) AS score
FROM embeddings
ORDER BY score DESC, vec_id LIMIT 20
"""


def ann_filtered_topk(sf_dir: str, label: int = 3, k: int = 20):
    """Predicate-filtered vector search — top-k cosine among vectors whose
    ``label`` matches (the metadata-filtered query every vector store
    serves: 'nearest docs WHERE lang = x / source = y').

    Scale shape: the label predicate is a ``pyarrow.dataset`` expression
    pushed into the parquet fragment scan, so row-group statistics prune
    non-matching groups BEFORE any vector leaves storage (on a
    label-partitioned production layout this reads only matching files);
    scoring then runs the same per-block local-top-k → tiny global top-k
    as ``ann_topk`` over the surviving fraction."""
    import pyarrow.dataset as pads

    ds = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"],
        filter=pads.field("label") == label,
    )
    return topk_cosine(ds, _query_vector(sf_dir), k=k)


ANN_FILTERED_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    CAST((SELECT qv FROM q) AS DOUBLE[])), 5) AS score
FROM embeddings
WHERE label = 3
ORDER BY score DESC, vec_id LIMIT 20
"""


def ann_ivf_topk(sf_dir: str):
    """IVF top-k via the partition-pruned path: train → materialize the
    cluster assignment once as cluster-partitioned parquet → search reads
    ONLY the nprobe probed partition dirs (~nprobe/n_clusters of the corpus;
    the former filter-based search scanned every vector for membership)."""
    import hashlib
    import os
    import tempfile

    from .functions.ann import IVFIndex

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    index = IVFIndex.train(ds, n_clusters=8)
    index_dir = os.path.join(
        tempfile.gettempdir(),
        "b_pdf_parser_ray_ivf",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    index.write_index(ds, index_dir)
    return index.search_partitioned(index_dir, _query_vector(sf_dir), k=10, nprobe=3)


def embedding_norms(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        from .functions.ann import embedding_matrix

        mat = embedding_matrix(batch.column("embedding"))
        return pa.Table.from_arrays(
            [batch.column("vec_id"), pa.array(sql_round(np.linalg.norm(mat, axis=1), 4))],
            names=["vec_id", "l2_norm"],
        )

    return ds.map_batches(norms, batch_format="pyarrow")


EMBEDDING_NORMS_SQL = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm
FROM embeddings
"""


def doc_length_quantiles(sf_dir: str):
    """Exact corpus quantiles of document token length — computed as a
    distributed value histogram, not a sort: token counts live in a bounded
    integer domain, so per-block (length, count) partials + one small
    groupby give the full distribution, and the driver folds only
    |distinct lengths| rows, reading each quantile off the cumulative count
    at rank ``ceil(q·n)`` (DuckDB ``quantile_disc`` semantics; the rank is
    computed in exact rational arithmetic because fp ``ceil(0.9·10)`` = 10
    while the true rank is 9).

    Scale shape: the exchange carries one (length, block) partial per
    distinct length per block — never a row per document — and a
    corpus-wide ``ds.sort`` is avoided entirely."""
    import math
    from fractions import Fraction

    # fold the shared (lang, n_tokens) frame over langs — exact int counts
    hist = (
        _doc_length_frame(sf_dir)
        .groupby("n_tokens", as_index=False)
        .agg(n=("n", "sum"))
        .sort_values("n_tokens", ignore_index=True)
    )
    total = int(hist["n"].sum())
    if total == 0:  # empty corpus: match DuckDB's row of NULLs
        return pd.DataFrame(
            [{k: None for k in ("p25", "p50", "p75", "p90", "p99")}]
        )
    cum = hist["n"].cumsum().to_numpy()
    values = hist["n_tokens"].to_numpy()
    row = {}
    for name, q in [("p25", "0.25"), ("p50", "0.5"), ("p75", "0.75"),
                    ("p90", "0.9"), ("p99", "0.99")]:
        rank = max(1, math.ceil(Fraction(q) * total))
        row[name] = int(values[int(np.searchsorted(cum, rank, side="left"))])
    return pd.DataFrame([row])


DOC_LENGTH_QUANTILES_SQL = """
SELECT CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n, 0.5)  AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(n, 0.9)  AS BIGINT) AS p90,
       CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99
FROM (SELECT len(string_split(text, ' ')) AS n FROM documents)
"""


def customer_rollup_hierarchy(sf_dir: str):
    """``GROUP BY ROLLUP (c_mktsegment, n_name)`` — segment × nation cells,
    per-segment subtotals, and the grand total, computed the scale-correct
    way: ONE pass over customers builds the finest-grain aggregate
    (|segments| × |nations| partial rows cross the exchange) and the
    coarser rollup levels re-aggregate those finished sums on the driver —
    the input is never re-read once per level.  Nation names are a 25-row
    broadcast lookup (``pc.index_in`` + ``take``), never a shuffle join.

    Rounding happens once, after all levels are derived from raw sums —
    rolling up already-rounded subtotals would drift off the oracle."""
    import ray

    from .functions.broadcast import get_cached

    nation = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    n_ref = ray.put(nation.combine_chunks())
    cust = read_table(
        sf_dir, "customer", columns=["c_mktsegment", "c_nationkey", "c_acctbal"]
    )

    def add_nation(batch: pa.Table) -> pa.Table:
        nat = get_cached(n_ref)
        idx = pc.index_in(
            batch.column("c_nationkey"), value_set=nat.column("n_nationkey")
        )
        return pa.Table.from_arrays(
            [
                batch.column("c_mktsegment"),
                pc.take(nat.column("n_name"), idx),
                batch.column("c_acctbal"),
            ],
            names=["c_mktsegment", "n_name", "c_acctbal"],
        )

    finest = grouped_agg(
        cust.map_batches(add_nation, batch_format="pyarrow"),
        ["c_mktsegment", "n_name"],
        [(None, "count", "n_cust"), ("c_acctbal", "sum", "bal")],
        max_groups=512,  # |segments| x |nations|
    ).to_pandas()  # |segments| × |nations| rows — bounded by dimension sizes

    seg = finest.groupby("c_mktsegment", as_index=False).agg(
        n_cust=("n_cust", "sum"), bal=("bal", "sum")
    )
    seg["n_name"] = None
    total = pd.DataFrame(
        [
            {
                "c_mktsegment": None,
                "n_name": None,
                "n_cust": finest["n_cust"].sum(),
                "bal": finest["bal"].sum(),
            }
        ]
    )
    out = pd.concat(
        [finest, seg[finest.columns.tolist()], total[finest.columns.tolist()]],
        ignore_index=True,
    )
    out["total_bal"] = sql_round(out["bal"], 2)
    out = out.drop(columns=["bal"])
    out["n_cust"] = out["n_cust"].astype("int64")
    return out.sort_values(
        ["c_mktsegment", "n_name"], na_position="last", ignore_index=True
    )


CUSTOMER_ROLLUP_SQL = """
SELECT c_mktsegment, n_name, CAST(count(*) AS BIGINT) AS n_cust,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (c_mktsegment, n_name)
ORDER BY c_mktsegment NULLS LAST, n_name NULLS LAST
"""


def customer_order_distribution(sf_dir: str):
    """Orders-per-customer distribution including zero-order customers
    (TPC-H Q13 shape — semantically a LEFT OUTER join) — computed without a
    physical outer join: the left join's only contribution is the zero
    bucket, whose size is |customer| (parquet footer metadata, free) minus
    the number of ordering customers (already known exactly as the sum of
    the nonzero buckets).

    Scale shape: one fine-grained groupby on ``o_custkey`` (near-unique
    key, no skew), then in-batch pre-count of (c_count, block) partials, a
    tiny second groupby over |distinct counts| × |blocks| rows, and a
    driver fold of the |distinct counts|-row distribution."""
    from ray.data.aggregate import Sum

    from .sources.tables import table_rows

    n_customers = table_rows(sf_dir, "customer")
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    per_cust = grouped_agg(
        orders, ["o_custkey"], [(None, "count", "c_count")],
        # provable bound: o_custkey ⊆ customer's key domain (footer rows)
        max_groups=n_customers,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays([batch.column("c_count")], names=["c_count"])
        out = t.group_by(["c_count"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["c_count", "custdist"])

    dist = (
        per_cust.map_batches(partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()  # |distinct per-customer order counts| rows — tiny
    )
    zero = n_customers - int(dist["custdist"].sum())
    if zero:
        dist = pd.concat(
            [dist, pd.DataFrame([{"c_count": 0, "custdist": zero}])],
            ignore_index=True,
        )
    dist = dist.astype({"c_count": "int64", "custdist": "int64"})
    return dist.sort_values(
        ["custdist", "c_count"], ascending=False, ignore_index=True
    )


CUSTOMER_ORDER_DIST_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def events_user_running_total(sf_dir: str, num_partitions: int = None):
    """Per-event running total of ``value`` per user (the windowed prefix
    sum ``SUM(...) OVER (PARTITION BY user ORDER BY ts)``): salted
    groupby(user_id % P) shuffle, then ONE vectorized pass per partition —
    sort by (user, ts, event_id), global cumsum, per-user rebase at user
    starts.  P scales with the events row count (same discipline as
    sessionize).

    Exactness: the testdata contract is 2-decimal values, so the prefix
    sums run in integer cents — the global-cumsum-minus-base trick is then
    EXACT, where double arithmetic would drift off the oracle's sequential
    accumulation by an ulp per rebase."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "events"))
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), num_partitions - 1), pa.int32()
        )
        return batch.append_column("part", part)

    def running_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        if len(uid) == 0:
            return pd.DataFrame({"event_id": [], "user_id": [], "running_total": []})
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        cs = np.cumsum(cents)
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        base = np.repeat(cs[starts] - cents[starts], np.diff(np.r_[starts, len(uid)]))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "running_total": (cs - base) / 100.0,
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: running_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )


EVENTS_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM events
"""


def doc_lang_length_quantiles(sf_dir: str):
    """Exact per-language token-length quantiles — the grouped form of
    ``doc_length_quantiles``: one distributed (lang, length) histogram, then
    a driver fold of |langs| × |distinct lengths| rows (bounded by the
    dimension sizes, never by the corpus) reading p50/p90 off per-language
    cumulative counts at rank ``ceil(q·n)`` in exact rational arithmetic."""
    import math
    from fractions import Fraction

    hist = _doc_length_frame(sf_dir)  # already (lang, n_tokens)-sorted
    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        cum = g["n"].cumsum().to_numpy()
        values = g["n_tokens"].to_numpy()
        total = int(cum[-1])
        row = {"lang": lang}
        for name, q in [("p50", "0.5"), ("p90", "0.9")]:
            rank = max(1, math.ceil(Fraction(q) * total))
            row[name] = int(values[int(np.searchsorted(cum, rank, side="left"))])
        rows.append(row)
    return pd.DataFrame(rows)


DOC_LANG_QUANTILES_SQL = """
SELECT lang, CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90
FROM (SELECT lang, len(string_split(text, ' ')) AS n FROM documents)
GROUP BY lang ORDER BY lang
"""


def orders_monthly_trend(sf_dir: str):
    """Monthly revenue with month-over-month percent change — time-series
    rollup plus a LAG window.  The heavy part is the partial-agg groupby
    (one (month, block) row per block crosses the exchange); the window
    runs on the driver over |months| rows.  The MoM expression reproduces
    the oracle's left-associated ``(100·Δ)/prev`` so fp results are
    bit-identical before rounding; the first month's NULL is coalesced to
    0 on both sides to keep the value hash deterministic."""
    monthly = (
        _orders_month_frame(sf_dir)
        .groupby("month", as_index=False)
        .agg(revenue=("revenue", "sum"))
        .sort_values("month", ignore_index=True)
    )
    monthly["revenue"] = sql_round(monthly["revenue"], 2)
    prev = monthly["revenue"].shift(1)
    mom = pd.Series(sql_round((100.0 * (monthly["revenue"] - prev)) / prev, 2))
    monthly["mom_pct"] = mom.fillna(0.0)
    return monthly


ORDERS_MONTHLY_TREND_SQL = """
SELECT month, revenue,
       coalesce(round((100.0 * (revenue - lag(revenue) OVER (ORDER BY month)))
                      / lag(revenue) OVER (ORDER BY month), 2), 0.0) AS mom_pct
FROM (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY month
) ORDER BY month
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_daily_type_pivot(sf_dir: str):
    """Pivot (crosstab): one row per day, one count column per event type.
    The wide step is the ordinary partial-agg groupby on the (day, type)
    composite key — |days|×|types|×|blocks| partial rows cross the
    exchange; the pivot itself reshapes the bounded |days|×|types| result
    on the driver.  Column set is the declared type vocabulary, so the
    output schema is stable even when a type is absent from the data.
    Daily counts are exact integer folds of the shared
    ``_events_calendar_frame`` hourly counts (day = hour-string prefix)."""
    frame = _events_calendar_frame(sf_dir)
    long = (
        frame.assign(day=frame["hour"].str[:10])
        .groupby(["day", "event_type"], as_index=False)
        .agg(n=("n_events", "sum"))
    )
    wide = (
        long.pivot_table(index="day", columns="event_type", values="n",
                         aggfunc="sum", fill_value=0)
        .reindex(columns=EVENT_TYPES, fill_value=0)
        .astype("int64")
        .reset_index()
        .sort_values("day", ignore_index=True)
    )
    wide.columns.name = None
    return wide


EVENTS_PIVOT_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
FROM events GROUP BY day ORDER BY day
"""


# dense-histogram cap: 2M bins = one 16 MB int64 vector per block partial
_DENSE_HISTO_CAP = 2_000_000


def orders_price_decile_counts(sf_dir: str):
    """Decile bucketing of a continuous column — the two-pass
    broadcast-stats pattern: pass 1 builds a value histogram of
    ``floor(price)``, the driver folds the 9 decile boundaries at exact
    ``quantile_disc`` ranks; pass 2 re-streams orders, assigns each row
    ``#boundaries < value`` with one vectorized ``searchsorted`` against
    the broadcast boundary array, and pre-counts per block.  Nothing
    corpus-sized ever leaves the workers, and the input is read twice
    rather than sorted once — the right trade at 100 TB.

    Pass 1 is statistics-proven exchange-FREE when the integer price
    domain fits ``_DENSE_HISTO_CAP``: footer min/max bound ``floor(price)``
    (``column_min_max`` — the domain is set by the VALUE range, not the
    corpus, so the same plan holds at 100 TB), each block emits one dense
    ``np.bincount`` vector, and ``summed_vector`` folds them with zero
    exchange.  Zero-count bins cannot move a boundary: ``searchsorted``
    (side='left') lands on the first bin whose cumulative count reaches
    the rank, which is always a populated bin.  Missing statistics or an
    oversized domain fall back to the distinct-value sort exchange.
    Pass 2's 10-key rollup takes the ``grouped_agg`` no-exchange plan."""
    import math
    import os
    from fractions import Fraction

    from .functions.agg import column_min_max, summed_vector
    from .sources.tables import table_rows

    path = os.path.join(sf_dir, "orders.parquet")
    mm = column_min_max(path, "o_totalprice")
    src = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def floor_i64(batch: pa.Table) -> np.ndarray:
        return pc.cast(pc.floor(batch.column("o_totalprice")), pa.int64()).to_numpy(
            zero_copy_only=False
        )

    if mm is not None and (int(math.floor(mm[1])) - int(math.floor(mm[0]))) < _DENSE_HISTO_CAP:
        lo = int(math.floor(mm[0]))
        width = int(math.floor(mm[1])) - lo + 1
        dense = summed_vector(
            src,
            lambda b: np.bincount(floor_i64(b) - lo, minlength=width),
            width,
            source_rows=table_rows(sf_dir, "orders"),
        )
        values = np.arange(lo, lo + width, dtype=np.int64)
        cum = dense.cumsum()
    else:  # unprovable domain — distinct-value exchange plan
        from ray.data.aggregate import Sum

        def floors(batch: pa.Table) -> pa.Table:
            t = pa.Table.from_arrays([pa.array(floor_i64(batch))], names=["v"])
            out = t.group_by(["v"], use_threads=False).aggregate([([], "count_all")])
            return out.rename_columns(["v", "n"])

        hist = (
            src.map_batches(floors, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()  # |distinct integer prices| rows — domain-bounded
            .sort_values("v", ignore_index=True)
        )
        cum = hist["n"].cumsum().to_numpy()
        values = hist["v"].to_numpy()

    total = int(cum[-1])
    boundaries = np.array(
        [
            values[int(np.searchsorted(
                cum, max(1, math.ceil(Fraction(f"0.{d}") * total)), side="left"
            ))]
            for d in range(1, 10)
        ],
        dtype=np.int64,
    )

    def bucket(batch: pa.Table) -> pa.Table:
        decile = np.searchsorted(boundaries, floor_i64(batch), side="left")
        t = pa.Table.from_arrays(
            [pa.array(decile, type=pa.int64())], names=["decile"]
        )
        out = t.group_by(["decile"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["decile", "n"])

    out = grouped_agg(
        read_table(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
            bucket, batch_format="pyarrow"
        ),
        ["decile"],
        [("n", "sum", "n")],
        max_groups=16,  # ≤10 deciles by construction
    )
    return out.to_pandas().sort_values("decile", ignore_index=True)


ORDERS_DECILE_SQL = """
WITH f AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders),
b AS (SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM f)
SELECT CAST(len(list_filter(qs, x -> v > x)) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n
FROM f, b GROUP BY decile ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Round-3 relational widening: multi-way joins, skew-aware join, set ops,
# interpolated quantiles, distributed correlation, heavy-hitter sketch
# ---------------------------------------------------------------------------


def events_type_share(sf_dir: str, num_partitions: int = None):
    """Per-type engagement rollup whose enrichment join runs through the
    SKEW-AWARE planner (``functions.joins.skew_join``): event_type is the
    canonical hot key — a handful of values covering the whole fact table,
    so a plain hash join would route 100 TB through ≤ |types| partitions.
    ``skew_join`` detects the hot keys from bounded per-block count
    partials and joins them map-side with a replicated right side (zero
    shuffle for the hot rows); only the cold tail takes the partitioned
    exchange.

    Output: one row per event_type with its total row count (attached by
    the join, then verified by the re-aggregation), event count and
    distinct-user count — all integers, exactly oracle-comparable."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "events")
    from .functions.joins import _collect_arrow, skew_join
    from .sources.tables import salted_partitions, table_rows

    import ray.data

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    # ONE aggregation execution: the per-type count table is ≤64 rows by
    # the enum bound (max_groups), so collecting it driver-side is safe at
    # any corpus and feeds BOTH the hot-key derivation (in-process filter,
    # no second execution) and the join's right side (driver thunk under
    # the broadcast cap; tiny from_arrow Dataset on the hybrid plan)
    stats_tbl = _collect_arrow(
        grouped_agg(
            read_table(sf_dir, "events", columns=["event_type"]),
            ["event_type"],
            [(None, "count", "type_total")],
            max_groups=64,  # type enum
        )
    )
    # hot keys for free from the count table itself: at most
    # 2·num_partitions keys can each exceed total/(2·num_partitions), so
    # the hot set is bounded by construction — no extra scan for detection
    total = table_rows(sf_dir, "events")
    frac = 0.5 / num_partitions
    hot = (
        stats_tbl.filter(
            pc.greater(
                pc.cast(stats_tbl.column("type_total"), pa.float64()),
                pa.scalar(frac * total),
            )
        )
        .column("event_type")
        .combine_chunks()
        if stats_tbl.num_rows
        else pa.array([], type=pa.string())
    )
    enriched = skew_join(
        ev, ray.data.from_arrow(stats_tbl), "event_type", "event_type",
        ["type_total"],
        # provable bound: |type stats| ≤ |events| (footer rows); above the
        # cap the planner goes hybrid — hot types replicated, tail hashed
        right_source_rows=table_rows(sf_dir, "events"),
        num_partitions=num_partitions,
        hot_keys=hot,
        right_driver=lambda: stats_tbl,
    )
    # distinct users exactly: pre-reduce to (type, user) grain, then fold
    per_user = grouped_agg(
        enriched,
        ["event_type", "user_id"],
        [(None, "count", "n_rows"), ("type_total", "max", "type_total")],
        salt_key="user_id",  # a user never splits across salt partitions
        salt_partitions=salted_partitions(table_rows(sf_dir, "events"), floor=16),
    )
    out = grouped_agg(
        per_user,
        ["event_type"],
        [
            ("n_rows", "sum", "n_events"),
            (None, "count", "n_users"),
            ("type_total", "max", "type_total"),
        ],
        max_groups=64,  # type enum
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_type", "type_total", "n_events", "n_users"]]

    return out.map_batches(finish, batch_format="pandas")


EVENTS_TYPE_SHARE_SQL = """
WITH s AS (SELECT event_type, count(*) AS type_total FROM events GROUP BY event_type)
SELECT e.event_type,
       max(s.type_total)         AS type_total,
       count(*)                  AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN s ON e.event_type = s.event_type
GROUP BY e.event_type
"""


def q7_nation_pair_volume(sf_dir: str, num_partitions: int = None):
    """Cross-nation shipping volume (TPC-H Q7 shape): revenue by
    (supplier nation, customer nation, ship year) over every distinct
    nation pair, 1995-1996.  (TPC-H fixes one pair; all pairs keeps the
    result non-degenerate at every scale factor — same join shape.)

    Join shape — three size-gated ``lookup_join``s, each broadcast under
    the cap and hash-partitioned above it: lineitem picks up
    ``s_nationkey`` from supplier, orders picks up ``c_nationkey`` from
    customer, and the lineitem partials (pre-aggregated per (orderkey,
    supp-nation, year) inside the batch) pick up the customer nation from
    the enriched orders.  The 25-row nation name map is a driver broadcast.
    Nothing fact-table-sized is ever collected."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    import ray

    from .functions.broadcast import get_cached
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    nation = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nation_ref = ray.put(nation.combine_chunks())
    lo = pa.scalar(pd.Timestamp("1995-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-12-31"), type=pa.timestamp("us"))

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), lo),
            pc.less_equal(batch.column("l_shipdate"), hi),
        )
        batch = batch.filter(keep)
        # exact integer ten-thousandths: price has 2 decimal digits and
        # discount 2, so price_cents × (100 − disc_pct) is the revenue in
        # e-4 units with NO float error — group sums are then exact
        # integers on both engines and the final 2-dp rounding can never
        # flip on a summation-order boundary (which a double sum does:
        # 615184.595… rounds differently per accumulation order)
        rev_e4 = _rev_e4(batch)
        year = pc.cast(pc.year(batch.column("l_shipdate")), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_suppkey"), rev_e4, year],
            names=["l_orderkey", "l_suppkey", "rev_e4", "l_year"],
        )

    with_supp = lookup_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        "l_suppkey", "s_suppkey", ["s_nationkey"],
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "s_nationkey", "l_year", "rev_e4"])
        out = t.group_by(
            ["l_orderkey", "s_nationkey", "l_year"], use_threads=False
        ).aggregate([("rev_e4", "sum")])
        return out.rename_columns(["l_orderkey", "s_nationkey", "l_year", "rev_e4"])

    # chain the gated joins so every RIGHT side is a base-table projection
    # of exactly [key] + value_cols (lookup_join's contract) — never a
    # join output carrying extra columns: partials pick up o_custkey from
    # orders, pre-reduce to (custkey, supp-nation, year) grain, then pick
    # up c_nationkey from customer
    with_cust = lookup_join(
        with_supp.map_batches(li_partial, batch_format="pyarrow"),
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        "l_orderkey", "o_orderkey", ["o_custkey"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["o_custkey", "s_nationkey", "l_year", "rev_e4"])
        out = t.group_by(
            ["o_custkey", "s_nationkey", "l_year"], use_threads=False
        ).aggregate([("rev_e4", "sum")])
        return out.rename_columns(["o_custkey", "s_nationkey", "l_year", "rev_e4"])

    joined = lookup_join(
        with_cust.map_batches(cust_partial, batch_format="pyarrow"),
        read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        "o_custkey", "c_custkey", ["c_nationkey"],
        right_source_rows=table_rows(sf_dir, "customer"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
    )

    def to_pair(batch: pa.Table) -> pa.Table:
        nat = get_cached(nation_ref)
        supp = pc.take(
            nat.column("n_name"),
            pc.index_in(batch.column("s_nationkey"), value_set=nat.column("n_nationkey")),
        )
        cust = pc.take(
            nat.column("n_name"),
            pc.index_in(batch.column("c_nationkey"), value_set=nat.column("n_nationkey")),
        )
        t = pa.Table.from_arrays(
            [supp, cust, batch.column("l_year"), batch.column("rev_e4")],
            names=["supp_nation", "cust_nation", "l_year", "rev_e4"],
        )
        return t.filter(
            pc.not_equal(t.column("supp_nation"), t.column("cust_nation"))
        )

    out = grouped_agg(
        joined.map_batches(to_pair, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "l_year"],
        [("rev_e4", "sum", "rev_e4")],
        max_groups=8192,  # |nations|^2 x years
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = sql_round(b["rev_e4"] / 10_000.0, 2)
        return b.drop(columns=["rev_e4"])

    return out.map_batches(finish, batch_format="pandas")


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             / 10000.0, 2) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, l_year
"""


def q14_promo_revenue(sf_dir: str, num_partitions: int = None):
    """Promotion revenue share (TPC-H Q14 shape): % of September-1997
    revenue from PROMO-type parts.  lineitem picks up ``p_type`` through
    the size-gated lookup join; both sums are map-side partials (2 numbers
    per block cross the exchange) folded on the driver into one row."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    lo = pa.scalar(pd.Timestamp("1997-09-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-10-01"), type=pa.timestamp("us"))
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), lo),
            pc.less(batch.column("l_shipdate"), hi),
        )
        batch = batch.filter(keep)
        # exact integer e-4 revenue (see _rev_e4): the ratio divides two
        # exact integers, so the 2-dp rounding is summation-order-proof
        return pa.Table.from_arrays(
            [batch.column("l_partkey"), _rev_e4(batch)],
            names=["l_partkey", "rev_e4"],
        )

    joined = lookup_join(
        li.map_batches(prep, batch_format="pyarrow"),
        read_table(sf_dir, "part", columns=["p_partkey", "p_type"]),
        "l_partkey", "p_partkey", ["p_type"],
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "part", columns=["p_partkey", "p_type"]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        promo = pc.sum(
            pc.if_else(
                pc.equal(batch.column("p_type"), "PROMO"),
                batch.column("rev_e4"),
                pa.scalar(0, type=pa.int64()),
            )
        ).as_py() or 0
        total = pc.sum(batch.column("rev_e4")).as_py() or 0
        return pa.Table.from_arrays(
            [pa.array([promo], type=pa.int64()), pa.array([total], type=pa.int64())],
            names=["promo", "total"],
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo, total = int(parts["promo"].sum()), int(parts["total"].sum())
    share = 100.0 * promo / total if total else 0.0
    return pd.DataFrame([{"promo_revenue": float(sql_round([share], 2)[0])}])


Q14_SQL = """
SELECT round(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT)
             / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT),
             2) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


def q18_large_orders(sf_dir: str, min_qty: float = 300.0, num_partitions: int = None):
    """Large-volume orders (TPC-H Q18 shape): orders whose total lineitem
    quantity exceeds ``min_qty``, with customer and order details.

    Scale shape: the orderkey-grain Σqty prefers the exchange-FREE
    range-partitioned plan (lineitem arrives ordered by orderkey — footer
    min/max statistics prove no key spans two tasks, so each task's
    aggregate is final; 4.4 s → 0.1 s at sf0.1); when the statistics
    can't prove it, per-batch partials pre-reduce before the one
    orderkey-grain exchange (high-cardinality uniform key — the safe
    kind).  The > cut happens on the aggregated rows, and only the few
    surviving orders flow through the two size-gated lookup joins."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    import os

    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    qty = range_partitioned_agg(
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_orderkey"],
        [("l_quantity", "sum", "total_qty")],
        columns=["l_orderkey", "l_quantity"],
    )
    if qty is None:
        from .sources.tables import salted_partitions

        qty = grouped_agg(
            read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]),
            ["l_orderkey"],
            [("l_quantity", "sum", "total_qty")],
            salt_key="l_orderkey",  # an order never splits across salt parts
            salt_partitions=salted_partitions(
                table_rows(sf_dir, "lineitem"), floor=16
            ),
        )

    def big(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("total_qty"), pa.scalar(min_qty)))

    big_orders = lookup_join(
        qty.map_batches(big, batch_format="pyarrow"),
        read_table(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
        ),
        "l_orderkey", "o_orderkey", ["o_custkey", "o_orderdate", "o_totalprice"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
    )
    out = lookup_join(
        big_orders,
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        "o_custkey", "c_custkey", ["c_name"],
        right_source_rows=table_rows(sf_dir, "customer"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "customer", columns=["c_custkey", "c_name"]),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"l_orderkey": "o_orderkey"})
        b["total_qty"] = sql_round(b["total_qty"], 2)
        b["o_totalprice"] = sql_round(b["o_totalprice"], 2)
        return b[["o_orderkey", "c_name", "o_orderdate", "o_totalprice", "total_qty"]]

    return out.map_batches(finish, batch_format="pandas")


Q18_SQL = """
SELECT o_orderkey, c_name, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY o_orderkey, c_name, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 300.0
"""


def q19_bracket_revenue(sf_dir: str, num_partitions: int = None):
    """Discounted revenue under disjunctive brand/size/quantity brackets
    (TPC-H Q19 shape).  lineitem picks up ``p_brand``/``p_size`` through
    the size-gated lookup join; the three-way OR evaluates vectorized per
    batch; one number per block crosses to the driver."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = lookup_join(
        li,
        read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]),
        "l_partkey", "p_partkey", ["p_brand", "p_size"],
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]),
    )

    def bracket(brand, size_lo, size_hi, qty_lo, qty_hi):
        def f(b: pa.Table):
            return pc.and_(
                pc.and_(
                    pc.equal(b.column("p_brand"), brand),
                    pc.and_(
                        pc.greater_equal(b.column("p_size"), pa.scalar(size_lo)),
                        pc.less_equal(b.column("p_size"), pa.scalar(size_hi)),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(b.column("l_quantity"), pa.scalar(float(qty_lo))),
                    pc.less_equal(b.column("l_quantity"), pa.scalar(float(qty_hi))),
                ),
            )
        return f

    brackets = [
        bracket("Brand#13", 1, 15, 1, 20),
        bracket("Brand#20", 10, 30, 10, 30),
        bracket("Brand#9", 20, 50, 20, 40),
    ]

    def partial(batch: pa.Table) -> pa.Table:
        keep = brackets[0](batch)
        for br in brackets[1:]:
            keep = pc.or_(keep, br(batch))
        batch = batch.filter(keep)
        # exact integer e-4 revenue (see _rev_e4) — boundary-proof rounding
        rev = pc.sum(_rev_e4(batch)).as_py() or 0
        return pa.Table.from_arrays(
            [pa.array([rev], type=pa.int64())], names=["rev_e4"]
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(parts["rev_e4"].sum())
    return pd.DataFrame([{"revenue": float(sql_round([total / 10_000.0], 2)[0])}])


Q19_SQL = """
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             / 10000.0, 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#9'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def purchase_error_user_overlap(sf_dir: str, num_partitions: int = None):
    """Set operations over derived row sets — INTERSECT / EXCEPT collapsed
    into ONE membership aggregation: users who purchased vs users who hit
    an error.  Instead of materializing each distinct-user set and running
    three semi/anti join pipelines (2 exchanges + 3 joins), each block
    pre-reduces to per-user (bought, errored) max-flags, ONE user-grain
    exchange merges them, and the three INTERSECT/EXCEPT counts fall out
    of a per-block count partial + a driver fold over |blocks| rows —
    nothing user-grain ever reaches the driver.  (The semi/anti planner
    itself is exercised by ``customers_without_orders`` and the q-suite.)
    Output: one row of exact counts."""
    from .sources.tables import salted_partitions, table_rows

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def flag_partial(batch: pa.Table) -> pa.Table:
        is_b = pc.equal(batch.column("event_type"), "purchase")
        is_e = pc.equal(batch.column("event_type"), "error")
        t = pa.Table.from_arrays(
            [
                batch.column("user_id"),
                pc.cast(is_b, pa.int64()),
                pc.cast(is_e, pa.int64()),
            ],
            names=["user_id", "b", "e"],
        ).filter(pc.or_(is_b, is_e))
        out = t.group_by(["user_id"], use_threads=False).aggregate(
            [("b", "max"), ("e", "max")]
        )
        return out.rename_columns(["user_id", "b", "e"])

    flags = grouped_agg(
        ds.map_batches(flag_partial, batch_format="pyarrow"),
        ["user_id"],
        [("b", "max", "b"), ("e", "max", "e")],
        salt_key="user_id",  # a user never splits across salt partitions
        salt_partitions=salted_partitions(table_rows(sf_dir, "events"), floor=16),
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(bool)
        e = batch.column("e").to_numpy(zero_copy_only=False).astype(bool)
        return pa.Table.from_pydict(
            {
                "n_both": pa.array([int(np.sum(b & e))], type=pa.int64()),
                "n_purchase_only": pa.array([int(np.sum(b & ~e))], type=pa.int64()),
                "n_error_only": pa.array([int(np.sum(e & ~b))], type=pa.int64()),
            }
        )

    parts = flags.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        [
            {
                "n_both": int(parts["n_both"].sum()),
                "n_purchase_only": int(parts["n_purchase_only"].sum()),
                "n_error_only": int(parts["n_error_only"].sum()),
            }
        ]
    )


USER_OVERLAP_SQL = """
WITH b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT (SELECT count(*) FROM (SELECT user_id FROM b INTERSECT SELECT user_id FROM e)) AS n_both,
       (SELECT count(*) FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM e))    AS n_purchase_only,
       (SELECT count(*) FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM b))    AS n_error_only
"""


def doc_length_quantiles_cont(sf_dir: str):
    """Interpolated corpus quantiles of document token length — DuckDB
    ``quantile_cont`` semantics (rank ``(n-1)·q`` 0-based, linear
    interpolation between the two neighboring order statistics), computed
    from the same distributed value histogram as ``doc_length_quantiles``:
    per-block (length, count) partials, one small exchange, driver folds
    |distinct lengths| rows.  Ranks use exact rational arithmetic; only
    the final interpolation is float (both engines interpolate doubles
    from identical integer order statistics, so 6-dp rounding matches)."""
    from fractions import Fraction

    # fold the shared (lang, n_tokens) frame over langs — exact int counts
    hist = (
        _doc_length_frame(sf_dir)
        .groupby("n_tokens", as_index=False)
        .agg(n=("n", "sum"))
        .sort_values("n_tokens", ignore_index=True)
    )
    total = int(hist["n"].sum())
    if total == 0:  # empty corpus: match DuckDB's row of NULLs
        return pd.DataFrame(
            [{k: None for k in ("p25", "p50", "p75", "p90", "p99")}]
        )
    cum = hist["n"].cumsum().to_numpy()
    values = hist["n_tokens"].to_numpy()

    def order_stat(rank_1based: int) -> int:
        return int(values[int(np.searchsorted(cum, rank_1based, side="left"))])

    row = {}
    for name, q in [("p25", "0.25"), ("p50", "0.5"), ("p75", "0.75"),
                    ("p90", "0.9"), ("p99", "0.99")]:
        h = Fraction(q) * (total - 1)  # 0-based interpolation position
        lo_idx = int(h)  # floor for non-negative
        frac = h - lo_idx
        v_lo = order_stat(lo_idx + 1)
        if frac == 0:
            val = float(v_lo)
        else:
            v_hi = order_stat(lo_idx + 2)
            val = v_lo + float(frac) * (v_hi - v_lo)
        row[name] = float(sql_round([val], 6)[0])
    return pd.DataFrame([row])


DOC_LENGTH_QUANTILES_CONT_SQL = """
SELECT round(quantile_cont(n, 0.25), 6) AS p25,
       round(quantile_cont(n, 0.5),  6) AS p50,
       round(quantile_cont(n, 0.75), 6) AS p75,
       round(quantile_cont(n, 0.9),  6) AS p90,
       round(quantile_cont(n, 0.99), 6) AS p99
FROM (SELECT len(string_split(text, ' ')) AS n FROM documents)
"""


def events_value_hour_corr(sf_dir: str):
    """Distributed Pearson correlation and sample covariance between event
    value and hour-of-day — the moment-sketch pattern: each block emits
    the six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²), one tiny
    row per block crosses to the driver, and the closed forms fold there.
    Nothing row-shaped leaves the workers.  The statistics fold exactly
    from the shared ``_events_calendar_frame``: every event in an hour
    bucket shares its hour-of-day y, so Σy = Σ n·h, Σxy = Σ h·sum_value,
    Σy² = Σ n·h², and Σx² is the frame's sum_value_sq column."""
    frame = _events_calendar_frame(sf_dir)
    h = frame["hour"].str[11:13].astype("int64").to_numpy().astype(np.float64)
    cnt = frame["n_events"].to_numpy().astype(np.float64)
    sv = frame["sum_value"].to_numpy().astype(np.float64)
    n = float(cnt.sum())
    sx = float(sv.sum())
    sy = float((cnt * h).sum())
    sxy = float((h * sv).sum())
    sxx = float(frame["sum_value_sq"].to_numpy().astype(np.float64).sum())
    syy = float((cnt * h * h).sum())
    cov = (sxy - sx * sy / n) / (n - 1)
    denom = ((sxx - sx * sx / n) * (syy - sy * sy / n)) ** 0.5
    corr = (sxy - sx * sy / n) / denom if denom else float("nan")
    return pd.DataFrame(
        [{
            "n": int(n),
            "corr_value_hour": float(sql_round([corr], 6)[0]),
            "covar_value_hour": float(sql_round([cov], 6)[0]),
        }]
    )


EVENTS_CORR_SQL = """
SELECT count(*) AS n,
       round(corr(value, EXTRACT(hour FROM ts)), 6)       AS corr_value_hour,
       round(covar_samp(value, EXTRACT(hour FROM ts)), 6) AS covar_value_hour
FROM events
"""


def corpus_heavy_hitters(sf_dir: str, k: int = 64):
    """Approximate top terms via a distributed Misra-Gries summary — the
    bounded-memory heavy-hitters sketch (Misra & Gries 1982; merge rule
    from Agarwal et al., "Mergeable Summaries", PODS'12).

    Per block: exact in-batch term counts (Arrow C group-by), compressed
    to ≤k counters by subtracting the (k+1)-th largest count (the merge
    rule).  The exchange then carries ≤k rows per block; a term-keyed sum
    merges the partials, and the driver folds the surviving counters with
    one final compression.  Guarantee (asserted in pytest, not assumed):
    every term with true frequency > 2·N/(k+1) survives, and each
    estimate undercounts by at most 2·N/(k+1).  Unlike the exact
    ``doc_top_terms``, worker and driver memory are O(k·langs) however
    large the vocabulary grows."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.Table.from_arrays([toks], names=["term"])
        counts = t.group_by(["term"], use_threads=False).aggregate([([], "count_all")])
        c = counts.column("count_all").to_numpy(zero_copy_only=False)
        order = np.argsort(-c, kind="stable")
        # MG compression: subtract the (k+1)-th largest, keep positives
        sub = int(c[order[k]]) if len(order) > k else 0
        keep = order[:k]
        est = c[keep] - sub
        mask = est > 0
        return pa.Table.from_arrays(
            [
                pc.take(counts.column("term"), pa.array(keep[mask])),
                pa.array(est[mask].astype(np.int64)),
            ],
            names=["term", "est"],
        )

    def _mg_fold(df: pd.DataFrame) -> pd.DataFrame:
        # the ONE Misra-Gries compression rule (subtract the (k+1)-th
        # largest, keep positives) — shared by the tree-combine level and
        # the driver's final fold so the two can never diverge
        df = df.sort_values("est", ascending=False, ignore_index=True)
        if len(df) > k:
            sub = int(df["est"].iloc[k])
            df = df.iloc[:k].copy()
            df["est"] = df["est"] - sub
            df = df[df["est"] > 0]
        return df

    def mg_compress(batch: pa.Table) -> pa.Table:
        # tree-combine level: fold many per-term partial sums into one ≤k
        # MG summary each, so the driver never sees k×blocks rows
        return pa.Table.from_pandas(_mg_fold(batch.to_pandas()), preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("est", alias_name="est"))
        .map_batches(mg_compress, batch_format="pyarrow", batch_size=32 * k)
        .to_pandas()
    )
    est = _mg_fold(merged)
    out = est[["term", "est"]].rename(columns={"est": "est_count"})
    return out.reset_index(drop=True)


_PROFILE_COLUMNS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_table_profile(sf_dir: str):
    """ANALYZE-style column statistics in ONE corpus pass: per numeric
    column of lineitem — row count, null count, min, max, sum (the
    planner-feeding profile every engine collects before choosing plans).
    One scan emits |columns| partial rows per block (Arrow C kernels, no
    transpose); the fold is a ``max_groups=|columns|`` grouped_agg — the
    exchange-free bounded-key plan, since the key domain is the column
    LIST, fixed by the schema, never the data."""
    ds = read_table(sf_dir, "lineitem", columns=_PROFILE_COLUMNS)

    def partial(batch: pa.Table) -> pa.Table:
        names, rows, nulls, mins, maxs, sums = [], [], [], [], [], []
        for name in _PROFILE_COLUMNS:
            col = batch.column(name)
            names.append(name)
            rows.append(batch.num_rows)
            nulls.append(col.null_count)
            mins.append(pc.min(col).as_py())
            maxs.append(pc.max(col).as_py())
            sums.append(pc.sum(col).as_py())
        return pa.table(
            {
                "column": pa.array(names, pa.large_string()),
                "n_rows": pa.array(rows, pa.int64()),
                "n_nulls": pa.array(nulls, pa.int64()),
                "min_value": pa.array(mins, pa.float64()),
                "max_value": pa.array(maxs, pa.float64()),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    out = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["column"],
        [
            ("n_rows", "sum", "n_rows"),
            ("n_nulls", "sum", "n_nulls"),
            ("min_value", "min", "min_value"),
            ("max_value", "max", "max_value"),
            ("sum_value", "sum", "sum_value"),
        ],
        max_groups=len(_PROFILE_COLUMNS),
    ).to_pandas()
    out["sum_value"] = sql_round(out["sum_value"], 2)
    return out.sort_values("column", ignore_index=True)


LINEITEM_PROFILE_SQL = """
SELECT 'l_quantity' AS column, count(*) AS n_rows,
       count(*) - count(l_quantity) AS n_nulls,
       CAST(min(l_quantity) AS DOUBLE) AS min_value,
       CAST(max(l_quantity) AS DOUBLE) AS max_value,
       round(sum(l_quantity), 2) AS sum_value
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
       CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
       round(sum(l_extendedprice), 2)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(*) - count(l_discount),
       CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
       round(sum(l_discount), 2)
FROM lineitem
UNION ALL
SELECT 'l_tax', count(*), count(*) - count(l_tax),
       CAST(min(l_tax) AS DOUBLE), CAST(max(l_tax) AS DOUBLE),
       round(sum(l_tax), 2)
FROM lineitem
"""


def corpus_freq_bounds(sf_dir: str, k: int = 64, d: int = 4, w: int = 8192):
    """Two-sided term-frequency bounds from two mergeable sketches in two
    bounded passes: Misra-Gries gives each heavy term a LOWER bound
    (``est ≤ true``, undercount ≤ 2N/(k+1)); a count-min sketch (Cormode &
    Muthukrishnan 2005) gives an UPPER bound (``true ≤ est``, overcount ≤
    εN w.h.p., ε = e/w).  ``true`` is provably inside [est_lower,
    est_upper] for every emitted term — asserted against exact counts in
    pytest, where the CMS overcount bound is also checked.

    Scale shape: the MG pass is ``corpus_heavy_hitters`` (≤k rows per
    block cross the term exchange); the CMS pass is a ``summed_vector``
    zero-exchange fold — each block contributes ONE d·w int64 vector
    (256 KiB at the defaults) built from exact in-batch counts (Arrow C
    group-by, then d vectorized splitmix probes over the DISTINCT terms
    only).  Worker, exchange and driver memory are all O(k + d·w)
    regardless of vocabulary or corpus size."""
    from .functions.agg import summed_vector
    from .functions.joins import _splitmix64
    from .functions.textstats import token_hash64
    from .sources.tables import table_rows

    if w & (w - 1):
        raise ValueError(f"w must be a power of two, got {w}")
    lower = corpus_heavy_hitters(sf_dir, k=k)

    row_salts = np.arange(1, d + 1, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def term_positions(terms) -> np.ndarray:
        """(d, n) CMS probe positions — one memoized blake2b per distinct
        term, then d vectorized splitmix remixes."""
        h = np.array([token_hash64(t) for t in terms], dtype=np.uint64)
        return (
            _splitmix64(h[None, :] + row_salts[:, None]) & np.uint64(w - 1)
        ).astype(np.int64)

    def cms_partial(batch: pa.Table) -> np.ndarray:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.Table.from_arrays([toks], names=["term"])
        counts = t.group_by(["term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        c = counts.column("count_all").to_numpy(zero_copy_only=False)
        pos = term_positions(counts.column("term").to_pylist())
        mat = np.zeros((d, w), dtype=np.int64)
        for i in range(d):
            np.add.at(mat[i], pos[i], c)
        return mat.ravel()

    ds = read_table(sf_dir, "documents", columns=["text"])
    cms = summed_vector(
        ds, cms_partial, width=d * w,
        source_rows=table_rows(sf_dir, "documents"),
    ).reshape(d, w)

    pos = term_positions(lower["term"].tolist())
    upper = np.min(
        np.take_along_axis(cms, pos, axis=1), axis=0
    ).astype(np.int64)
    out = pd.DataFrame(
        {
            "term": lower["term"],
            "est_lower": lower["est_count"].astype("int64"),
            "est_upper": upper,
        }
    )
    return out.sort_values("term", ignore_index=True)


def lang_first_docs(sf_dir: str, n_first: int = 10):
    """Per-language ordered string aggregation, bounded: the ``n_first``
    smallest doc_ids per language joined into one comma string (the
    scale-safe form of ``string_agg`` — an unbounded per-group concat of a
    100 TB corpus is not a queryable result).  Per-block partials keep ≤
    ``n_first`` ids per language, the language-keyed exchange moves only
    those, and the per-language fold re-selects the global smallest
    ``n_first`` before the join — associative, so block boundaries never
    change the answer."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.sort_by([("lang", "ascending"), ("doc_id", "ascending")])
        df = t.to_pandas().groupby("lang", sort=False).head(n_first)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())[:n_first]
        return pd.DataFrame(
            [{"lang": g["lang"].iloc[0],
              "first_docs": ",".join(str(i) for i in ids)}]
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(fold, batch_format="pandas")
    )


LANG_FIRST_DOCS_SQL = """
SELECT lang, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS first_docs
FROM (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn <= 10
GROUP BY lang
"""


WEIGHTED_SAMPLE_N = 100


def orders_weighted_sample(sf_dir: str, n: int = None):
    """Deterministic weighted sampling without replacement — the
    Efraimidis-Spirakis A-ES scheme: each row gets key −ln(u)/w with
    u ∈ (0,1) hash-derived and w = o_totalprice; the n smallest keys are
    the weighted sample.  Coordination-free and stable (same rows at any
    cluster size / block layout), the weighted analogue of
    ``doc_sample_hash``.

    Scale shape: each block keeps its local n smallest keys, a single tiny
    sort+limit over the n×blocks candidates finishes — row data never
    leaves the block unless it is a local winner.  The oracle reproduces
    the uint64 hash in HUGEINT and the same u=(h+0.5)/2⁶⁴ mapping, so
    both engines rank identical doubles."""
    if n is None:
        n = WEIGHTED_SAMPLE_N
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def local_top(batch: pa.Table) -> pa.Table:
        ids = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(ids)
        u = (h.astype(np.float64) + 0.5) / float(1 << 64)
        w = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        key = -np.log(u) / w
        keep = np.argsort(key, kind="stable")[:n]
        out = batch.take(pa.array(np.sort(keep)))
        return out.append_column(
            "es_key", pa.array(key[np.sort(keep)], type=pa.float64())
        )

    top = (
        ds.map_batches(local_top, batch_format="pyarrow")
        .sort("es_key")
        .limit(n)
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["o_totalprice"] = sql_round(b["o_totalprice"], 2)
        return b[["o_orderkey", "o_totalprice"]]

    return top.map_batches(finish, batch_format="pandas")


WEIGHTED_SAMPLE_SQL = f"""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM (
  SELECT o_orderkey, o_totalprice,
         -ln((((CAST(o_orderkey AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B})
               % 18446744073709551616) + 0.5) / 18446744073709551616.0)
         / o_totalprice AS es_key
  FROM orders
  ORDER BY es_key
  LIMIT {WEIGHTED_SAMPLE_N})
"""


def events_cohort_retention(sf_dir: str, num_partitions: int = None):
    """Cohort retention matrix — the classic product-analytics rollup:
    users bucketed by first-activity WEEK (epoch-day // 7; the synthetic
    corpus spans one month, so weeks give a real matrix), counted in each
    later week they were active.

    Scale shape — ONE salted user-grain exchange instead of the textbook
    three (distinct-pair dedup, per-user min, activity→cohort join): each
    block emits its distinct (user, week) pairs (Arrow C group-by) salted
    by ``hash(user) & (P-1)``, so every user's pairs land in exactly one
    coarse partition; inside the partition one vectorized pandas pass
    dedups globally, takes the per-user min week (the cohort), subtracts
    it from each active week, and pre-counts (cohort, offset) — the only
    thing that leaves the partition is its |weeks|²-bounded count partial,
    folded by the ``grouped_agg`` no-exchange plan.  P scales with the
    events row count (``salted_partitions``) so one partition-group stays
    worker-sized at any corpus."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        # floor=16, not 64: the in-group kernel is a trivial dedup+reduceat
        # (no per-row Python), so the exchange's per-partition floor costs
        # more than extra parallelism buys; P still scales with row count
        # and the output is P-invariant (users never split across parts)
        num_partitions = salted_partitions(table_rows(sf_dir, "events"), floor=16)
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.cast(batch.column("ts"), pa.date32()).cast(pa.int32()), pa.int64()
        )
        w = pc.divide(days, pa.scalar(7))  # integer division on int64
        t = pa.Table.from_arrays(
            [batch.column("user_id"), w], names=["user_id", "week_idx"]
        )
        out = t.group_by(["user_id", "week_idx"], use_threads=False).aggregate([])
        part = pc.cast(
            pc.bit_wise_and(out.column("user_id"), num_partitions - 1), pa.int32()
        )
        return out.append_column("part", part)

    def cohort_part(g: pd.DataFrame) -> pd.DataFrame:
        # global dedup + per-user min + offset counts, all inside the one
        # partition that owns these users — fully vectorized
        if len(g) == 0:
            return pd.DataFrame(
                {"cohort_idx": pd.Series([], dtype="int64"),
                 "week_offset": pd.Series([], dtype="int64"),
                 "n_users": pd.Series([], dtype="int64")}
            )
        g = g.drop_duplicates(["user_id", "week_idx"])
        g = g.sort_values(["user_id", "week_idx"], kind="stable")
        uid = g["user_id"].to_numpy()
        wk = g["week_idx"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        cohort = wk[np.nonzero(new_user)[0]]  # first (min) week per user
        cohort_of_row = np.repeat(cohort, np.diff(np.r_[np.nonzero(new_user)[0], len(uid)]))
        off = wk - cohort_of_row
        out = (
            pd.DataFrame({"cohort_idx": cohort_of_row, "week_offset": off})
            .groupby(["cohort_idx", "week_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return out.astype({"cohort_idx": "int64", "week_offset": "int64",
                           "n_users": "int64"})

    partials = (
        ev.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: cohort_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )

    out = grouped_agg(
        partials,
        ["cohort_idx", "week_offset"],
        [("n_users", "sum", "n_users")],
        max_groups=4096,  # calendar weeks^2
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        start = pd.to_datetime(b["cohort_idx"] * 7, unit="D")
        b["cohort_week"] = start.dt.strftime("%Y-%m-%d")
        return b[["cohort_week", "week_offset", "n_users"]]

    return out.map_batches(finish, batch_format="pandas")


EVENTS_COHORT_SQL = """
WITH act AS (SELECT DISTINCT user_id,
                    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS week_idx
             FROM events),
fm AS (SELECT user_id, min(week_idx) AS cohort_idx FROM act GROUP BY user_id)
SELECT strftime(DATE '1970-01-01' + INTERVAL (fm.cohort_idx * 7) DAY, '%Y-%m-%d')
         AS cohort_week,
       act.week_idx - fm.cohort_idx AS week_offset,
       count(*) AS n_users
FROM act JOIN fm ON act.user_id = fm.user_id
GROUP BY cohort_week, week_offset
"""


def embedding_label_centroids(sf_dir: str):
    """Per-label embedding centroids — the grouped vector mean every
    clustering / class-prototype / IVF-training pipeline needs.

    Scale shape: each block contributes ONE (Σvectors, count) partial per
    label (numpy matmul-free: ``np.add.reduceat`` over the label-sorted
    flat matrix), so the exchange carries |labels| × dims floats per
    block, never a row per vector.  The centroid itself is derived on the
    driver from the folded exact sums; the comparable outputs are scalar
    projections (count, centroid L2 norm, grand mean of components) so
    the oracle hash is float-list-free."""
    from .functions.ann import embedding_matrix

    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        mat = embedding_matrix(batch.column("embedding"))
        order = np.argsort(labels, kind="stable")
        sl, sm = labels[order], mat[order]
        uniq, starts = np.unique(sl, return_index=True)
        sums = np.add.reduceat(sm, starts, axis=0)
        counts = np.diff(np.append(starts, len(sl)))
        dim = mat.shape[1]
        return pa.Table.from_arrays(
            [
                pa.array(uniq.astype(np.int64)),
                pa.array(counts.astype(np.int64)),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), type=pa.float64()), dim
                ),
            ],
            names=["label", "n", "vec_sum"],
        )

    def combine(batch: pa.Table) -> pa.Table:
        # tree-combine level: merge ~1024 block partials per task so the
        # driver folds |labels| × (blocks/1024) rows, not |labels| × blocks
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        ns = batch.column("n").to_numpy(zero_copy_only=False)
        sums = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch.column("vec_sum").to_pylist()]
        )
        order = np.argsort(labels, kind="stable")
        sl = labels[order]
        uniq, starts = np.unique(sl, return_index=True)
        merged = np.add.reduceat(sums[order], starts, axis=0)
        counts = np.add.reduceat(ns[order], starts)
        dim = sums.shape[1]
        return pa.Table.from_arrays(
            [
                pa.array(uniq.astype(np.int64)),
                pa.array(counts.astype(np.int64)),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(merged.ravel(), type=pa.float64()), dim
                ),
            ],
            names=["label", "n", "vec_sum"],
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=1024)
        .to_pandas()
    )
    rows = []
    for label, g in parts.groupby("label"):
        total = int(g["n"].sum())
        vec = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0) / total
        rows.append(
            {
                "label": int(label),
                "n_vectors": total,
                "centroid_norm": float(sql_round([np.linalg.norm(vec)], 5)[0]),
                "mean_component": float(sql_round([vec.mean()], 6)[0]),
            }
        )
    return pd.DataFrame(rows).sort_values("label", ignore_index=True)


EMBEDDING_CENTROIDS_SQL = """
WITH u AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
c AS (SELECT label, pos, sum(v) AS sv FROM u GROUP BY label, pos),
n AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT c.label, max(n.n_vectors) AS n_vectors,
       round(sqrt(sum((c.sv / n.n_vectors) * (c.sv / n.n_vectors))), 5) AS centroid_norm,
       round(avg(c.sv / n.n_vectors), 6) AS mean_component
FROM c JOIN n ON c.label = n.label
GROUP BY c.label
"""


def q10_returned_items(sf_dir: str, num_partitions: int = None):
    """Top-20 customers by returned-item revenue (TPC-H Q10 shape):
    lineitem (returnflag = R) revenue per order, orders filtered to one
    quarter pick up the customer key, customer-grain sums rank globally.

    Scale shape: per-batch (orderkey → Σ rev_e4) partials (exact integer
    ten-thousandths — see q7) pre-reduce before the gated orders lookup;
    custkey partials pre-reduce again before the customer-grain exchange;
    the global top-20 sorts ONLY the customer-grain aggregate (≪ fact
    table), with (revenue, custkey) as a total order so ties can't make
    LIMIT nondeterministic.  Customer details and the 25-row nation name
    map attach after the limit — 20 rows, driver-side."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    import ray

    from .functions.broadcast import get_cached
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    lo = pa.scalar(pd.Timestamp("1995-10-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        rev_e4 = _rev_e4(batch)
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), rev_e4], names=["l_orderkey", "rev_e4"]
        )
        out = t.group_by(["l_orderkey"], use_threads=False).aggregate([("rev_e4", "sum")])
        return out.rename_columns(["l_orderkey", "rev_e4"])

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = lookup_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders, "l_orderkey", "o_orderkey", ["o_custkey"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        # broadcast plan: the SAME date window, pushed into the footer-
        # pruned driver read (row groups outside it never decode)
        right_driver=lambda: read_arrow_filtered(
            sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
            filters=[("o_orderdate", ">=", pd.Timestamp("1995-10-01")),
                     ("o_orderdate", "<", pd.Timestamp("1996-01-01"))]),
    )

    per_cust = grouped_agg(
        joined, ["o_custkey"], [("rev_e4", "sum", "rev_e4")],
        # provable bound: o_custkey ⊆ customer's key domain (footer rows)
        max_groups=table_rows(sf_dir, "customer"),
    )
    top = top_k(per_cust, 20, [("rev_e4", "descending"), ("o_custkey", "ascending")])

    cust = read_arrow(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).combine_chunks()
    nation = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"]).combine_chunks()
    cust_ref, nation_ref = ray.put(cust), ray.put(nation)

    def attach(batch: pa.Table) -> pa.Table:
        c = get_cached(cust_ref)
        n = get_cached(nation_ref)
        idx = pc.index_in(batch.column("o_custkey"), value_set=c.column("c_custkey"))
        names = pc.take(c.column("c_name"), idx)
        acct = pc.take(c.column("c_acctbal"), idx)
        nidx = pc.index_in(pc.take(c.column("c_nationkey"), idx),
                           value_set=n.column("n_nationkey"))
        return pa.Table.from_arrays(
            [
                batch.column("o_custkey"),
                names,
                pa.array(
                    sql_round(
                        batch.column("rev_e4").to_numpy(zero_copy_only=False) / 10_000.0,
                        2,
                    )
                ),
                pa.array(sql_round(acct.to_numpy(zero_copy_only=False), 2)),
                pc.take(n.column("n_name"), nidx),
            ],
            names=["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"],
        )

    return top.map_batches(attach, batch_format="pyarrow")


Q10_SQL = """
SELECT c_custkey, c_name,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             / 10000.0, 2) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round((1 - l_discount) * 100) AS BIGINT)) DESC,
         c_custkey
LIMIT 20
"""


def embedding_quantize_int8(sf_dir: str):
    """Symmetric int8 quantization audit — the storage/serving compression
    step of an embedding pipeline (4× smaller, matmul-friendly): per
    vector, scale = max|v|/127, q = round(v/scale), and the
    reconstruction error that decides whether int8 is safe for retrieval.

    Scale shape: pure per-row arithmetic on the flat (n, dim) matrix —
    one vectorized numpy pass per batch, nothing crosses an exchange but
    the per-vector audit rows.  The oracle reproduces the same doubles
    with DuckDB list kernels, so the audit is hash-checked, not just
    spot-tested."""
    from .functions.ann import embedding_matrix

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        mat = embedding_matrix(batch.column("embedding"))
        scale = np.abs(mat).max(axis=1) / 127.0
        s = np.where(scale == 0, 1.0, scale)[:, None]
        q = np.round(mat / s)
        err = np.abs(q * s - mat).mean(axis=1)
        return pa.Table.from_arrays(
            [
                batch.column("vec_id"),
                pa.array(sql_round(scale, 6)),
                pa.array(sql_round(err, 6)),
                pa.array(np.abs(q).max(axis=1).astype(np.int64)),
            ],
            names=["vec_id", "scale", "mean_abs_err", "max_q"],
        )

    return ds.map_batches(quant, batch_format="pyarrow")


EMBEDDING_QUANTIZE_SQL = """
WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                  list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0
                    AS scale
           FROM embeddings)
SELECT vec_id, round(scale, 6) AS scale,
       round(list_avg(list_transform(e, x ->
             abs(round(x / (CASE WHEN scale = 0 THEN 1.0 ELSE scale END))
                 * (CASE WHEN scale = 0 THEN 1.0 ELSE scale END) - x))), 6)
         AS mean_abs_err,
       CAST(list_max(list_transform(e, x ->
             abs(round(x / (CASE WHEN scale = 0 THEN 1.0 ELSE scale END))))) AS BIGINT)
         AS max_q
FROM s
"""


def dedup_streaming_index(sf_dir: str, n_shards: int = 8):
    """Online exact dedup through the sharded mutable index
    (``state/dedup_index.py``) — the raw-actor pattern for state the
    Dataset API can't express: rows are marked first-seen/duplicate in
    ONE streaming pass with no shuffle barrier.  Output is the
    deterministic summary (doc count, distinct-content count, index
    size); which duplicate survives is arrival-order dependent by design
    and therefore not part of the contract."""
    from .state.dedup_index import streaming_dedup_counts

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    r = streaming_dedup_counts(ds, n_shards=n_shards)
    return pd.DataFrame(
        [{"n_docs": r["n_docs"], "n_unique": r["n_unique"],
          "index_size": r["index_size"]}]
    )


DEDUP_STREAMING_SQL = """
SELECT count(*) AS n_docs,
       count(DISTINCT text) AS n_unique,
       count(DISTINCT text) AS index_size
FROM documents
"""


def orders_price_quantiles_approx(sf_dir: str, k: int = None):
    """Approximate quantiles of a CONTINUOUS column (o_totalprice) via a
    deterministic mergeable hash-sample sketch — the companion to
    ``doc_length_quantiles``, whose exact value-histogram only works on
    bounded integer domains.

    Sketch: keep the values of the k smallest key hashes (the KMV trick
    pointed at sampling) — a uniform size-k sample without replacement
    that is deterministic, order/layout independent, and mergeable by
    'union then keep k smallest' exactly like KMV.  Per-block ≤k-row
    partials, one tree-combine level, driver folds k rows; quantiles read
    off the sample's empirical CDF with rank error O(1/√k) (Chernoff) —
    the tolerance pytest asserts ≤ 3/√k against DuckDB's exact ranks.

    Exact-path gate: footer rows ≤ ``QUANTILES_EXACT_CAP`` grows k to the
    row count, so the "sample" is the whole population and the ceil(q·n)
    ranks are EXACT — the DuckDB oracle twin reproduces that rank formula
    over the sorted column.  Above the cap the sketch path is unchanged
    (and genuinely approximate — no oracle claims otherwise).  An EXPLICIT
    ``k`` opts out of the gate (the rank-error test pins the pure-sketch
    behavior with a deliberately small k)."""
    from .sources.tables import table_rows

    if k is None:
        k = 4096
        rows = table_rows(sf_dir, "orders")
        if rows <= QUANTILES_EXACT_CAP:
            k = max(k, rows)
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(ids)
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        keep = np.argsort(h, kind="stable")[:k]
        return pa.Table.from_arrays(
            [pa.array(h[keep].view(np.int64)), pa.array(v[keep])],
            names=["hkey", "value"],
        )

    def combine(batch: pa.Table) -> pa.Table:
        h = batch.column("hkey").to_numpy(zero_copy_only=False).view(np.uint64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        keep = np.argsort(h, kind="stable")[:k]
        return pa.Table.from_arrays(
            [pa.array(h[keep].view(np.int64)), pa.array(v[keep])],
            names=["hkey", "value"],
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=32 * k)
        .to_pandas()
    )
    h = parts["hkey"].to_numpy().view(np.uint64)
    v = parts["value"].to_numpy()
    sample = np.sort(v[np.argsort(h, kind="stable")[:k]])
    row = {"sample_k": int(len(sample))}
    for name, q in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75),
                    ("p90", 0.9), ("p99", 0.99)]:
        idx = min(len(sample) - 1, int(np.ceil(q * len(sample))) - 1)
        row[name] = float(sql_round([sample[max(idx, 0)]], 2)[0])
    return pd.DataFrame([row])


LM_VOCAB_K = 2000


def doc_lm_score(sf_dir: str, vocab_k: int = None, num_partitions: int = None):
    """CCNet-style corpus language-model quality score: train an add-one
    bigram LM on the corpus itself (top-``vocab_k`` vocabulary, rest →
    ``<unk>``) and score every document by its mean bigram log-likelihood
    — the standard screen for gibberish / boilerplate / wrong-tokenizer
    text in web-scale training-data pipelines.

    Scale shape, two passes + one scoring pipeline, nothing
    vocabulary-unbounded on the driver:

    * vocabulary: ONE salted term-grain exchange (``token_hash64(w) &
      (P-1)`` — a term never splits across partitions, so in-partition
      term totals are globally final, any global top-k term is in its
      partition's local top-k, and partition token-totals add); each
      partition emits its top-k rows plus one null-marker total row, the
      driver folds P×(k+1) rows.  (Replaces materialize + full
      ``Dataset.sort`` + sum fold — 3 executions and a key-grain sort
      exchange → 1; wall-time parity at sf0.1 where both are
      floor-bound, the win is the removed sort grain and 2 executions
      at scale.)  ``<unk>``'s count derives from total−Σvocab, no
      second pass;
    * bigram model: per-batch Arrow pre-count of MAPPED token pairs →
      one (wa,wb)-grain exchange;
    * scoring: per-doc bigrams explode with the unigram count attached
      map-side (vocab dict broadcast, ≤k+1 entries); the bigram count
      attaches through the size-gated ``lookup_join`` on a composite
      key — broadcast under the cap, hash-partitioned above it (the
      forced-gate test pins that plan), so a 10⁸-row bigram table at
      100 TB never has to fit anywhere."""
    import ray

    from .functions.broadcast import get_cached
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    if vocab_k is None:
        vocab_k = LM_VOCAB_K
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    from .functions.textstats import token_hash64
    from .sources.tables import salted_partitions

    # 16 term-salt partitions: the in-group kernel is a trivial pandas
    # combine+nlargest, so the exchange floor dominates extra parallelism
    # (same floor=16 rationale as events_cohort_retention)
    VP = 16

    def term_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.Table.from_arrays([toks], names=["w"])
        out = t.group_by(["w"], use_threads=False).aggregate([([], "count_all")])
        out = out.rename_columns(["w", "c"])
        # one memoized blake2b per DISTINCT term per block (the token_hash64
        # memo pattern — corpus terms recur in nearly every batch)
        part = pa.array(
            [token_hash64(w) & (VP - 1) for w in out.column("w").to_pylist()],
            type=pa.int32(),
        )
        return out.append_column("part", part)

    def vocab_part(g: pd.DataFrame) -> pd.DataFrame:
        # in-partition term totals are globally final (a term never splits
        # across salt partitions); emit local top-k by (c desc, w asc) —
        # any global top-k term is in its partition's local top-k — plus
        # one null-w total marker row (split tokens are never null)
        agg = g.groupby("w", as_index=False)["c"].sum()
        top = agg.sort_values(
            ["c", "w"], ascending=[False, True], kind="stable"
        ).head(vocab_k)
        total = pd.DataFrame({"w": [None], "c": [int(agg["c"].sum())]})
        return pd.concat([top, total], ignore_index=True).astype({"c": "int64"})

    folded = (
        ds.map_batches(term_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: vocab_part(g.drop(columns=["part"])), batch_format="pandas"
        )
        .to_pandas()  # ≤ VP×(k+1) rows — bounded by parameters, not corpus
    )
    total_tokens = int(folded.loc[folded["w"].isna(), "c"].sum())
    vocab_df = (
        folded.dropna(subset=["w"])
        .sort_values(["c", "w"], ascending=[False, True], kind="stable")
        .head(vocab_k)
    )
    vocab_words = vocab_df["w"].tolist()
    vocab_count_list = [int(x) for x in vocab_df["c"]]
    unk_count = total_tokens - sum(vocab_count_list)
    v_size = len(vocab_words) + (1 if unk_count > 0 else 0)
    vocab_set_ref = ray.put(pa.array(vocab_words, type=pa.string()))
    # counts aligned to vocab order, with <unk>'s count appended at index k
    # (pc.index_in misses fill to k, so the unk slot is what they read)
    uni_counts_ref = ray.put(
        np.asarray(vocab_count_list + [max(unk_count, 0)], dtype=np.int64)
    )

    def mapped_bigrams(batch: pa.Table):
        """Vectorized per-batch bigram explode: (key "wa wb", first-token
        array, doc index) — pure Arrow/numpy, no per-token Python."""
        tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        flat = tok_lists.flatten()
        in_vocab = pc.is_in(flat, value_set=get_cached(vocab_set_ref))
        mapped = pc.if_else(in_vocab, flat, pa.scalar("\x00unk"))
        n = len(mapped)
        offs = tok_lists.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        if n < 2:
            empty = pa.array([], type=pa.string())
            return empty, empty, np.array([], dtype=np.int64)
        # pair (i, i+1) stays iff i+1 is not the start of the next doc
        starts = np.zeros(n + 1, dtype=bool)
        starts[offs] = True
        keep = pa.array(~starts[1:n])
        a = pc.filter(mapped.slice(0, n - 1), keep)
        b = pc.filter(mapped.slice(1, n - 1), keep)
        key = pc.binary_join_element_wise(a, b, " ")
        doc_ids = np.repeat(
            np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs)
        )
        return key, a, doc_ids[: n - 1][~starts[1:n]]

    def bigram_partial(batch: pa.Table) -> pa.Table:
        key, _, _ = mapped_bigrams(batch)
        t = pa.Table.from_arrays([key], names=["bigram"])
        out = t.group_by(["bigram"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["bigram", "c_ab"])

    bigrams = grouped_agg(
        ds.map_batches(bigram_partial, batch_format="pyarrow"),
        ["bigram"], [("c_ab", "sum", "c_ab")],
        # a bigram never splits across token_hash64 salt partitions; the
        # memo covers the (vocab_k+1)²-bounded mapped-bigram domain
        salt_key="bigram", salt_hash=True,
        salt_partitions=salted_partitions(total_tokens, floor=16),
    )

    def explode(batch: pa.Table) -> pa.Table:
        key, a, doc_of = mapped_bigrams(batch)
        vocab_arr = get_cached(vocab_set_ref)
        counts_np = get_cached(uni_counts_ref)
        idx = pc.fill_null(pc.index_in(a, value_set=vocab_arr), len(vocab_arr))
        c_a = counts_np[idx.to_numpy(zero_copy_only=False)]
        return pa.Table.from_arrays(
            [pc.take(batch.column("doc_id"), pa.array(doc_of)), key, pa.array(c_a)],
            names=["doc_id", "bigram", "c_a"],
        )

    joined = lookup_join(
        ds.map_batches(explode, batch_format="pyarrow"),
        bigrams, "bigram", "bigram", ["c_ab"],
        # provable bound: |distinct bigrams| ≤ total tokens (counted above)
        right_source_rows=total_tokens,
        num_partitions=num_partitions,
    )

    def score_partial(batch: pa.Table) -> pa.Table:
        logp = np.log(
            (batch.column("c_ab").to_numpy(zero_copy_only=False) + 1.0)
            / (batch.column("c_a").to_numpy(zero_copy_only=False) + float(v_size))
        )
        t = pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(logp)], names=["doc_id", "lp"]
        )
        out = t.group_by(["doc_id"], use_threads=False).aggregate(
            [("lp", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["doc_id", "lp_sum", "n"])

    out = grouped_agg(
        joined.map_batches(score_partial, batch_format="pyarrow"),
        ["doc_id"],
        [("lp_sum", "sum", "lp_sum"), ("n", "sum", "n")],
        salt_key="doc_id",  # a doc never splits across salt partitions
        salt_partitions=salted_partitions(table_rows(sf_dir, "documents"), floor=16),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["lm_score"] = sql_round(b["lp_sum"] / b["n"], 5)
        return b[["doc_id", "lm_score"]]

    return out.map_batches(finish, batch_format="pandas")


DOC_LM_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
uni AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
vocab AS (SELECT w FROM uni ORDER BY c DESC, w LIMIT {LM_VOCAB_K}),
m AS (SELECT doc_id, pos,
             CASE WHEN w IN (SELECT w FROM vocab) THEN w
                  ELSE chr(0) || 'unk' END AS w
      FROM toks),
uc AS (SELECT w, count(*) AS c FROM m GROUP BY w),
vs AS (SELECT count(*) AS v FROM uc),
big AS (SELECT a.doc_id, a.w AS wa, b.w AS wb
        FROM m a JOIN m b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bc AS (SELECT wa, wb, count(*) AS c_ab FROM big GROUP BY wa, wb)
SELECT big.doc_id,
       round(avg(ln((bc.c_ab + 1.0) / (uc.c + vs.v))), 5) AS lm_score
FROM big
JOIN bc ON big.wa = bc.wa AND big.wb = bc.wb
JOIN uc ON big.wa = uc.w
CROSS JOIN vs
GROUP BY big.doc_id
"""


def q15_top_supplier(sf_dir: str, num_partitions: int = None):
    """Top supplier by quarterly revenue (TPC-H Q15 shape): total revenue
    per supplier over 1996-Q1 shipments; return the supplier(s) hitting
    the global maximum.

    Scale shape — the two-phase global-argmax pattern: per-batch
    (suppkey → Σrev_e4) Arrow partials pre-reduce before the ONE
    supplier-grain exchange; that dimension-grain aggregate is
    materialized once in the object store (never fact-sized), the global
    max is a distributed ``Dataset.max``, and only the max-revenue rows
    flow through the size-gated lookup join to pick up ``s_name``.
    Revenue is exact integer e-4 (see ``_rev_e4``) so the max comparison
    and final rounding are summation-order-proof."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    lo = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-04-01"), type=pa.timestamp("us"))
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("l_shipdate"), lo),
            pc.less(batch.column("l_shipdate"), hi),
        )
        batch = batch.filter(keep)
        t = pa.Table.from_arrays(
            [batch.column("l_suppkey"), _rev_e4(batch)],
            names=["s_suppkey", "rev_e4"],
        )
        out = t.group_by(["s_suppkey"], use_threads=False).aggregate([("rev_e4", "sum")])
        return out.rename_columns(["s_suppkey", "rev_e4"])

    from .functions.joins import BROADCAST_MAX_SOURCE_ROWS, _collect_arrow

    rev = grouped_agg(
        li.map_batches(prep, batch_format="pyarrow"),
        ["s_suppkey"], [("rev_e4", "sum", "rev_e4")],
        # provable bound: l_suppkey ⊆ supplier's key domain (footer rows)
        max_groups=table_rows(sf_dir, "supplier"),
    )

    # per-BLOCK max rows → tiny driver collect → exact global argmax in
    # Python ints: correct at any block count, ≤ |blocks|·|ties| rows
    # cross to the driver, and the whole query is ONE streaming execution
    # (the old materialize + Dataset.max + filter chain was three)
    def local_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        m = pc.max(b.column("rev_e4"))
        return b.filter(pc.equal(b.column("rev_e4"), m))

    cand_tbl = _collect_arrow(
        rev.map_batches(local_max, batch_format="pyarrow")
    )
    best = max(cand_tbl.column("rev_e4").to_pylist())
    cand_tbl = cand_tbl.filter(
        pc.equal(cand_tbl.column("rev_e4"), pa.scalar(best, type=pa.int64()))
    )

    if table_rows(sf_dir, "supplier") <= BROADCAST_MAX_SOURCE_ROWS:
        # dimension attach entirely on the driver (footer-pruned read —
        # the keys_driver doctrine): zero further executions
        sup = read_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        idx = pc.index_in(
            cand_tbl.column("s_suppkey"), value_set=sup.column("s_suppkey")
        )
        out = pd.DataFrame(
            {
                "s_suppkey": cand_tbl.column("s_suppkey").to_pylist(),
                "s_name": pc.take(sup.column("s_name"), idx).to_pylist(),
            }
        )
        out["total_revenue"] = sql_round(
            pd.Series(cand_tbl.column("rev_e4").to_pylist()) / 10_000.0, 2
        )
        return out[["s_suppkey", "s_name", "total_revenue"]]

    import ray.data

    named = lookup_join(
        ray.data.from_arrow(cand_tbl),
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", "s_suppkey", ["s_name"],
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["total_revenue"] = sql_round(b["rev_e4"] / 10_000.0, 2)
        return b[["s_suppkey", "s_name", "total_revenue"]]

    return named.map_batches(finish, batch_format="pandas")


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(rev_e4 / 10000.0, 2) AS total_revenue
FROM supplier JOIN rev ON l_suppkey = s_suppkey
WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
"""


def q17_small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#23", num_partitions: int = None
):
    """Small-quantity-order revenue (TPC-H Q17 shape): average yearly
    revenue lost if orders under 20% of a part's mean quantity were not
    filled, for one brand's parts.

    Scale shape — the correlated-average self-join, done as TWO streaming
    scans instead of a fact-table self-join: pass A semi-joins lineitem to
    the brand's parts and reduces to part-grain quantity sufficient
    statistics (Σq_e2, count); pass B re-scans, attaches those thresholds
    through the size-gated lookup join, and keeps
    ``l_quantity < 0.2 · avg`` rows via the EXACT integer comparison
    ``5·q_e2·cnt < Σq_e2`` (quantities have 2 decimal digits) — no float
    average can flip a boundary row on either engine.  Only 1 partial row
    per block crosses the final exchange."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join, semi_join
    from .sources.tables import table_rows

    def brand_parts():
        return read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
            lambda b: b.filter(pc.equal(b.column("p_brand"), brand)).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )

    def li_brand():
        li = read_table(
            sf_dir, "lineitem",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        return semi_join(
            li, brand_parts(), "l_partkey", "p_partkey",
            right_source_rows=table_rows(sf_dir, "part"),
            num_partitions=num_partitions,
            # broadcast plan: same brand filter pushed into the driver read
            keys_driver=lambda: read_arrow_filtered(
                sf_dir, "part", columns=["p_partkey"],
                filters=[("p_brand", "==", brand)]),
        )

    def q_e2(batch: pa.Table) -> pa.Array:
        return pc.cast(
            pc.round(pc.multiply(batch.column("l_quantity"), pa.scalar(100.0))),
            pa.int64(),
        )

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("l_partkey"), q_e2(batch)], names=["l_partkey", "qe"]
        )
        out = t.group_by(["l_partkey"], use_threads=False).aggregate(
            [("qe", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["l_partkey", "q_sum_e2", "q_cnt"])

    thresholds = grouped_agg(
        li_brand().map_batches(qty_partial, batch_format="pyarrow"),
        ["l_partkey"],
        [("q_sum_e2", "sum", "q_sum_e2"), ("q_cnt", "sum", "q_cnt")],
        # provable bound: l_partkey ⊆ part's key domain (footer rows)
        max_groups=table_rows(sf_dir, "part"),
    )

    joined = lookup_join(
        li_brand(), thresholds, "l_partkey", "l_partkey", ["q_sum_e2", "q_cnt"],
        # provable bound: the part-grain threshold table is ≤ |part| rows
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
    )

    def pick(batch: pa.Table) -> pa.Table:
        keep = pc.less(
            pc.multiply(
                pc.multiply(q_e2(batch), pa.scalar(5, type=pa.int64())),
                batch.column("q_cnt"),
            ),
            batch.column("q_sum_e2"),
        )
        price_c = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        kept = pc.sum(
            pc.if_else(keep, price_c, pa.scalar(0, type=pa.int64()))
        ).as_py() or 0
        return pa.Table.from_pydict({"cents": pa.array([kept], type=pa.int64())})

    parts = joined.map_batches(pick, batch_format="pyarrow").to_pandas()
    total_cents = int(parts["cents"].sum()) if len(parts) else 0
    return pd.DataFrame(
        [{"avg_yearly": float(sql_round([total_cents / 100.0 / 7.0], 2)[0])}]
    )


Q17_SQL = """
WITH bli AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'),
qs AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_sum_e2,
         count(*) AS q_cnt
  FROM bli GROUP BY l_partkey)
SELECT round(CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)
              AS BIGINT) / 100.0 / 7.0, 2) AS avg_yearly
FROM bli JOIN qs USING (l_partkey)
WHERE 5 * CAST(round(l_quantity * 100) AS BIGINT) * q_cnt < q_sum_e2
"""


def q8_market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    part_type: str = "ECONOMY",
    num_partitions: int = None,
):
    """National market share (TPC-H Q8 shape): the target nation's share
    of ECONOMY-part revenue sold to ASIA-region customers, by order year,
    1995-1996.

    Scale shape — the deepest join chain in the catalog (part, supplier,
    orders, customer, nation×2, region), every step either a size-gated
    semi/lookup join or a ≤25-row driver broadcast, with partials
    pre-reduced to a coarser grain between every pair of joins:
    lineitem SEMI typed-parts → +s_nationkey → reduce to (orderkey,
    supp-nation) → +o_custkey/o_orderdate (year filter) → reduce to
    (custkey, supp-nation, year) → +c_nationkey → region filter +
    share flag via the broadcast nation/region map → 2 exact-integer
    sums per (year, block).  The share divides two exact e-4 integers,
    so 4-dp rounding is identical on both engines."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    import ray

    from .functions.broadcast import get_cached
    from .functions.joins import lookup_join, semi_join
    from .sources.tables import table_rows

    nation_t = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region_t = read_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = region_t.column("r_regionkey").to_pylist()[
        region_t.column("r_name").to_pylist().index(region)
    ]
    nation_ref = ray.put(nation_t.combine_chunks())

    typed_parts = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"), part_type)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    li = semi_join(
        li, typed_parts, "l_partkey", "p_partkey",
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        keys_driver=lambda: read_arrow_filtered(
            sf_dir, "part", columns=["p_partkey"],
            filters=[("p_type", "==", part_type)]),
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_suppkey"), _rev_e4(batch)],
            names=["l_orderkey", "l_suppkey", "rev_e4"],
        )
        return t

    with_supp = lookup_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        "l_suppkey", "s_suppkey", ["s_nationkey"],
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
    )

    def order_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "s_nationkey", "rev_e4"])
        out = t.group_by(["l_orderkey", "s_nationkey"], use_threads=False).aggregate(
            [("rev_e4", "sum")]
        )
        return out.rename_columns(["l_orderkey", "s_nationkey", "rev_e4"])

    with_ord = lookup_join(
        with_supp.map_batches(order_partial, batch_format="pyarrow"),
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        "l_orderkey", "o_orderkey", ["o_custkey", "o_orderdate"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate"]),
    )

    lo = pa.scalar(pd.Timestamp("1995-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-12-31"), type=pa.timestamp("us"))

    def cust_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("o_orderdate"), lo),
            pc.less_equal(batch.column("o_orderdate"), hi),
        )
        batch = batch.filter(keep)
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("o_custkey"), batch.column("s_nationkey"), year,
             batch.column("rev_e4")],
            names=["o_custkey", "s_nationkey", "o_year", "rev_e4"],
        )
        out = t.group_by(
            ["o_custkey", "s_nationkey", "o_year"], use_threads=False
        ).aggregate([("rev_e4", "sum")])
        return out.rename_columns(["o_custkey", "s_nationkey", "o_year", "rev_e4"])

    with_cust = lookup_join(
        with_ord.map_batches(cust_partial, batch_format="pyarrow"),
        read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        "o_custkey", "c_custkey", ["c_nationkey"],
        right_source_rows=table_rows(sf_dir, "customer"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
    )

    def share_partial(batch: pa.Table) -> pa.Table:
        nat = get_cached(nation_ref)
        c_region = pc.take(
            nat.column("n_regionkey"),
            pc.index_in(batch.column("c_nationkey"), value_set=nat.column("n_nationkey")),
        )
        batch = batch.filter(pc.equal(c_region, pa.scalar(rkey)))
        s_name = pc.take(
            nat.column("n_name"),
            pc.index_in(batch.column("s_nationkey"), value_set=nat.column("n_nationkey")),
        )
        flagged = pc.if_else(
            pc.equal(s_name, nation),
            batch.column("rev_e4"),
            pa.scalar(0, type=pa.int64()),
        )
        t = pa.Table.from_arrays(
            [batch.column("o_year"), flagged, batch.column("rev_e4")],
            names=["o_year", "nat_e4", "tot_e4"],
        )
        out = t.group_by(["o_year"], use_threads=False).aggregate(
            [("nat_e4", "sum"), ("tot_e4", "sum")]
        )
        return out.rename_columns(["o_year", "nat_e4", "tot_e4"])

    out = grouped_agg(
        with_cust.map_batches(share_partial, batch_format="pyarrow"),
        ["o_year"],
        [("nat_e4", "sum", "nat_e4"), ("tot_e4", "sum", "tot_e4")],
        max_groups=64,  # calendar years
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["mkt_share"] = sql_round(b["nat_e4"] / b["tot_e4"], 4)
        return b[["o_year", "mkt_share"]]

    return out.map_batches(finish, batch_format="pandas")


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT)
             / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT),
             4) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY o_year
"""


# domain-mixture resampling percentages: curated-ish sources kept whole /
# lightly sampled, everything else down-sampled to 10%
MIXTURE_PCT = {"src0": 100, "src1": 75, "src2": 50, "src3": 25}
MIXTURE_DEFAULT_PCT = 10


def doc_mixture_resample(sf_dir: str):
    """Domain-mixture resampling — the training-data 'source weights'
    operator: keep a deterministic per-source fraction of documents
    (up-weight curated sources, down-sample bulk crawl) with NO
    coordination: keep iff the engine-wide key hash mod 100 is under the
    source's percentage.  Stable under re-runs, retries, and any cluster
    size; a pure map-side filter (no shuffle, no driver state); the
    oracle reproduces the HUGEINT arithmetic exactly."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    keys = pa.array(list(MIXTURE_PCT), type=pa.string())
    pcts = np.asarray(
        list(MIXTURE_PCT.values()) + [MIXTURE_DEFAULT_PCT], dtype=np.uint64
    )

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(ids) % np.uint64(100)
        idx = pc.fill_null(
            pc.index_in(batch.column("source"), value_set=keys), len(MIXTURE_PCT)
        )
        pct = pcts[idx.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(h < pct))

    return ds.map_batches(pick, batch_format="pyarrow")


DOC_MIXTURE_SQL = f"""
SELECT doc_id, source FROM documents
WHERE (CAST(doc_id AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B})
      % 18446744073709551616 % 100
      < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 75
                    WHEN 'src2' THEN 50 WHEN 'src3' THEN 25 ELSE 10 END
"""


def q21_waiting_suppliers(
    sf_dir: str, late_days: int = 60, num_partitions: int = None
):
    """Suppliers who kept finished orders waiting (TPC-H Q21 shape,
    adapted to this schema: "late" = shipped more than ``late_days`` after
    the order date, since the synthetic lineitem has no commit/receipt
    dates): per supplier, the number of 'F'-status multi-supplier orders
    where THIS supplier was the only late one.

    Scale shape — the EXISTS / NOT-EXISTS pair over same-order siblings
    done with ONE salted exchange instead of two self-joins: lineitem
    picks up ``o_orderdate`` through the size-gated lookup join (inner —
    non-'F' orders drop out), per-batch partials reduce rows to
    (orderkey, suppkey, any-late) grain, then a salted
    ``groupby(orderkey % P)`` colocates each order's suppliers in one
    coarse partition where the sibling conditions (≥2 suppliers, exactly
    one late, me) are evaluated vectorized; only per-supplier count
    partials leave, folded by a supplier-grain exchange and named through
    a second lookup join.  P scales with the lineitem row count.

    In the broadcast regime (orders under the join gate) the salted
    exchange disappears entirely: lineitem reads as statistics-proven
    orderkey-disjoint range tasks (``functions.agg.range_partitioned_apply``
    — every sibling of an order is in one task by construction), the
    F-order dates attach by broadcast ``index_in``, and the sibling test
    runs in-task; only the per-supplier count partials leave the read."""
    from .functions.agg import range_partitioned_apply
    from .functions.joins import (
        BROADCAST_MAX_SOURCE_ROWS,
        _collect_arrow,
        lookup_join,
    )
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "lineitem"))

    forders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), "F")).select(
            ["o_orderkey", "o_orderdate"]
        ),
        batch_format="pyarrow",
    )
    late_us = pa.scalar(late_days * 86_400_000_000, type=pa.duration("us"))

    def flag_table(batch: pa.Table, dates: pa.Array) -> pa.Table:
        """(orderkey, suppkey, late) at (order, supplier) grain."""
        late = pc.cast(
            pc.greater(batch.column("l_shipdate"), pc.add(dates, late_us)),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_suppkey"), late],
            names=["l_orderkey", "l_suppkey", "late"],
        )
        out = t.group_by(["l_orderkey", "l_suppkey"], use_threads=False).aggregate(
            [("late", "max")]
        )
        return out.rename_columns(["l_orderkey", "l_suppkey", "late"])

    def wait_partial(g: pd.DataFrame) -> pd.DataFrame:
        # exact per (order, supplier) late flag across blocks, then the
        # sibling test — all pandas C groupbys, no per-order Python
        f = (
            g.groupby(["l_orderkey", "l_suppkey"], sort=False)["late"]
            .max()
            .reset_index()
        )
        per_order = f.groupby("l_orderkey", sort=False)["late"].agg(
            n_late="sum", n_supp="size"
        )
        f = f.join(per_order, on="l_orderkey")
        hit = f[(f["late"] == 1) & (f["n_supp"] >= 2) & (f["n_late"] == 1)]
        out = hit.groupby("l_suppkey", sort=False).size().reset_index(name="cnt")
        return out

    partials = None
    if table_rows(sf_dir, "orders") <= BROADCAST_MAX_SOURCE_ROWS:
        import os

        import ray

        from .functions.broadcast import get_cached

        ford_ref = ray.put(_collect_arrow(forders).combine_chunks())

        def sibling_task(t: pa.Table) -> pa.Table:
            ford = get_cached(ford_ref)
            idx = pc.index_in(
                t.column("l_orderkey"), value_set=ford.column("o_orderkey")
            )
            t = t.filter(pc.is_valid(idx))  # non-'F' orders drop out (inner)
            dates = pc.take(ford.column("o_orderdate"), pc.drop_null(idx))
            out = wait_partial(flag_table(t, dates).to_pandas())
            # pin the schema: an all-filtered task yields an object-dtyped
            # empty frame that would break cross-task concat
            return pa.Table.from_pandas(out, preserve_index=False).cast(
                pa.schema([("l_suppkey", pa.int64()), ("cnt", pa.int64())])
            )

        partials = range_partitioned_apply(
            os.path.join(sf_dir, "lineitem.parquet"),
            "l_orderkey",
            sibling_task,
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
    if partials is None:
        li = read_table(
            sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
        )
        with_date = lookup_join(
            li, forders, "l_orderkey", "o_orderkey", ["o_orderdate"],
            right_source_rows=table_rows(sf_dir, "orders"),
            # derived hash-plan P: the left side is the full lineitem scan
            left_source_rows=table_rows(sf_dir, "lineitem"),
            right_driver=lambda: read_arrow_filtered(
                sf_dir, "orders", columns=["o_orderkey", "o_orderdate"],
                filters=[("o_orderstatus", "==", "F")]),
        )

        def flag_partial(batch: pa.Table) -> pa.Table:
            out = flag_table(batch, batch.column("o_orderdate"))
            part = pc.cast(
                pc.bit_wise_and(out.column("l_orderkey"), num_partitions - 1),
                pa.int32(),
            )
            return out.append_column("part", part)

        partials = (
            with_date.map_batches(flag_partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: wait_partial(g.drop(columns=["part"])),
                batch_format="pandas",
            )
        )
    counts = grouped_agg(
        partials, ["l_suppkey"], [("cnt", "sum", "numwait")],
        # provable bound: l_suppkey ⊆ supplier's key domain (footer rows)
        max_groups=table_rows(sf_dir, "supplier"),
    )
    named = lookup_join(
        counts,
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "l_suppkey", "s_suppkey", ["s_name"],
        # both sides are supplier-key grain — derived P from supplier rows
        right_source_rows=table_rows(sf_dir, "supplier"),
        right_driver=lambda: read_arrow(
            sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
    )
    return named.select_columns(["s_name", "numwait"])


Q21_SQL = """
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey),
per_order AS (
  SELECT l_orderkey, CAST(sum(late) AS BIGINT) AS n_late, count(*) AS n_supp
  FROM f GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM f
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
"""


def q22_lapsed_high_balance(
    sf_dir: str, cutoff: str = "2000-06-01", num_partitions: int = None
):
    """Lapsed high-balance customers per nation (TPC-H Q22 shape, the
    phone-prefix grouping replaced by ``c_nationkey`` — the synthetic
    customer table has no phone column): customers whose balance exceeds
    the global average positive balance and who placed no order since
    ``cutoff``, counted and summed per nation.

    Scale shape — the global-scalar-threshold pattern: the average is two
    integers (Σcents, n over positive balances) folded from one ≤1-row
    partial per block, and the comparison ``cents·n > Σcents`` is exact
    integer arithmetic (no float average can flip a boundary customer on
    either engine).  The threshold filter runs map-side BEFORE the
    size-gated anti-join against the recent-order custkeys (per-batch
    distinct, broadcast under the cap, hash-partitioned ``left_anti``
    above), and only (nation, count, Σcents) partials cross the final
    exchange."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "orders")
    from .functions.joins import anti_join
    from .sources.tables import table_rows

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_cents(batch: pa.Table) -> pa.Array:
        return pc.cast(
            pc.round(pc.multiply(batch.column("c_acctbal"), pa.scalar(100.0))),
            pa.int64(),
        )

    def thr_partial(batch: pa.Table) -> pa.Table:
        cents = bal_cents(batch)
        pos = pc.greater(cents, pa.scalar(0, type=pa.int64()))
        kept = pc.filter(cents, pos)
        return pa.Table.from_pydict(
            {
                "s": pa.array([pc.sum(kept).as_py() or 0], type=pa.int64()),
                "n": pa.array([len(kept)], type=pa.int64()),
            }
        )

    thr = cust.map_batches(thr_partial, batch_format="pyarrow").to_pandas()
    s_total, n_total = int(thr["s"].sum()), int(thr["n"].sum())

    rich = cust.map_batches(
        lambda b: b.filter(
            pc.greater(
                pc.multiply(bal_cents(b), pa.scalar(n_total, type=pa.int64())),
                pa.scalar(s_total, type=pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )

    lo = pa.scalar(pd.Timestamp(cutoff), type=pa.timestamp("us"))
    recent = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
        lambda b: pa.Table.from_arrays(
            [
                pc.unique(
                    b.filter(
                        pc.greater_equal(b.column("o_orderdate"), lo)
                    ).column("o_custkey")
                )
            ],
            names=["o_custkey"],
        ),
        batch_format="pyarrow",
    )
    lapsed = anti_join(
        rich, recent, "c_custkey", "o_custkey",
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        keys_driver=lambda: read_arrow_filtered(
            sf_dir, "orders", columns=["o_custkey"],
            filters=[("o_orderdate", ">=", pd.Timestamp(cutoff))]),
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("c_nationkey"), bal_cents(batch)],
            names=["c_nationkey", "cents"],
        )
        out = t.group_by(["c_nationkey"], use_threads=False).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["c_nationkey", "cents", "numcust"])

    out = grouped_agg(
        lapsed.map_batches(nation_partial, batch_format="pyarrow"),
        ["c_nationkey"],
        [("numcust", "sum", "numcust"), ("cents", "sum", "cents")],
        max_groups=64,  # nation dimension
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["totacctbal"] = sql_round(b["cents"] / 100.0, 2)
        return b[["c_nationkey", "numcust", "totacctbal"]]

    return out.map_batches(finish, batch_format="pandas")


Q22_SQL = """
WITH thr AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS n
  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-06-01')
SELECT c_nationkey, count(*) AS numcust,
       round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
         AS totacctbal
FROM customer, thr
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c_nationkey
"""


def q9_product_profit(sf_dir: str, name_token: str = "red", num_partitions: int = None):
    """Product-type profit by nation and year (TPC-H Q9 shape, supplycost
    term dropped — the synthetic schema has no partsupp table): revenue of
    '*red*'-named parts grouped by the supplier's nation and order year.

    Scale shape — the q8-style deep chain with grain coarsening between
    every join: lineitem SEMI red-parts → exact e-4 revenue →
    +s_nationkey (size-gated lookup) → pre-reduce to (orderkey, nation)
    → +o_orderdate year (size-gated lookup) → pre-reduce to (nation,
    year) partials → ≤25-row nation broadcast resolves names map-side →
    one tiny (nation, year) exchange."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    import ray

    from .functions.broadcast import get_cached
    from .functions.joins import lookup_join, semi_join
    from .sources.tables import table_rows

    nation_t = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nation_ref = ray.put(nation_t.combine_chunks())

    red_parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda b: b.filter(
            pc.match_substring(b.column("p_name"), name_token)
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    li = semi_join(
        li, red_parts, "l_partkey", "p_partkey",
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        # broadcast plan: same match_substring kernel, driver-side
        keys_driver=lambda: (
            lambda t: t.filter(
                pc.match_substring(t.column("p_name"), name_token)
            ).select(["p_partkey"])
        )(read_arrow(sf_dir, "part", columns=["p_partkey", "p_name"])),
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_suppkey"), _rev_e4(batch)],
            names=["l_orderkey", "l_suppkey", "rev_e4"],
        )

    with_supp = lookup_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        "l_suppkey", "s_suppkey", ["s_nationkey"],
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
    )

    def order_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "s_nationkey", "rev_e4"])
        out = t.group_by(["l_orderkey", "s_nationkey"], use_threads=False).aggregate(
            [("rev_e4", "sum")]
        )
        return out.rename_columns(["l_orderkey", "s_nationkey", "rev_e4"])

    with_ord = lookup_join(
        with_supp.map_batches(order_partial, batch_format="pyarrow"),
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]),
        "l_orderkey", "o_orderkey", ["o_orderdate"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]),
    )

    def nation_year_partial(batch: pa.Table) -> pa.Table:
        nat = get_cached(nation_ref)
        name = pc.take(
            nat.column("n_name"),
            pc.index_in(batch.column("s_nationkey"), value_set=nat.column("n_nationkey")),
        )
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        t = pa.Table.from_arrays(
            [name, year, batch.column("rev_e4")],
            names=["nation", "o_year", "rev_e4"],
        )
        out = t.group_by(["nation", "o_year"], use_threads=False).aggregate(
            [("rev_e4", "sum")]
        )
        return out.rename_columns(["nation", "o_year", "rev_e4"])

    out = grouped_agg(
        with_ord.map_batches(nation_year_partial, batch_format="pyarrow"),
        ["nation", "o_year"],
        [("rev_e4", "sum", "rev_e4")],
        max_groups=512,  # |nations| x years
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["profit"] = sql_round(b["rev_e4"] / 10_000.0, 2)
        return b[["nation", "o_year", "profit"]]

    return out.map_batches(finish, batch_format="pandas")


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             / 10000.0, 2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%red%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY n_name, o_year
"""


def q2_min_cost_supplier(sf_dir: str, min_size: int = 25, num_partitions: int = None):
    """Cheapest supplier per part (TPC-H Q2's correlated-min shape, priced
    from lineitem — the synthetic schema has no partsupp): for every part
    of size ≥ 25, the minimum observed sale price and the supplier that
    sold it (smallest suppkey on ties).

    Scale shape — the distributed ARGMIN-JOIN pattern done as ONE grouped
    min instead of a min + self-join: price cents and the tiebreak
    suppkey are packed into a single int64 ``comb = cents·2³² + suppkey``
    (cents < 2³¹ for any sane price, suppkey < 2³² up to ~4×10⁹
    suppliers — both asserted), so ``min(comb)`` IS the lexicographic
    (price, suppkey) argmin; per-block Arrow partials pre-reduce before
    the one part-grain exchange, then the winners decode and pick up
    ``s_name`` via the size-gated lookup join.  The oracle expresses the
    same semantics naturally (row_number over price, suppkey)."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join, semi_join
    from .sources.tables import table_rows

    big_parts = read_table(sf_dir, "part", columns=["p_partkey", "p_size"]).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("p_size"), pa.scalar(min_size))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )
    li = semi_join(
        li, big_parts, "l_partkey", "p_partkey",
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        keys_driver=lambda: read_arrow_filtered(
            sf_dir, "part", columns=["p_partkey"],
            filters=[("p_size", ">=", min_size)]),
    )

    def argmin_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        supp = pc.cast(batch.column("l_suppkey"), pa.int64())
        if len(batch) and (
            pc.max(cents).as_py() >= (1 << 31) or pc.max(supp).as_py() >= (1 << 32)
        ):
            raise ValueError("q2 comb-packing bounds exceeded (cents>=2^31 or suppkey>=2^32)")
        comb = pc.add(pc.multiply(cents, pa.scalar(1 << 32, type=pa.int64())), supp)
        t = pa.Table.from_arrays(
            [batch.column("l_partkey"), comb], names=["p_partkey", "comb"]
        )
        out = t.group_by(["p_partkey"], use_threads=False).aggregate([("comb", "min")])
        return out.rename_columns(["p_partkey", "comb"])

    winners = grouped_agg(
        li.map_batches(argmin_partial, batch_format="pyarrow"),
        ["p_partkey"], [("comb", "min", "comb")],
        # provable bound: l_partkey ⊆ part's key domain (footer rows)
        max_groups=table_rows(sf_dir, "part"),
    )

    def decode(batch: pa.Table) -> pa.Table:
        comb = batch.column("comb")
        cents = pc.divide(comb, pa.scalar(1 << 32, type=pa.int64()))
        supp = pc.subtract(comb, pc.multiply(cents, pa.scalar(1 << 32, type=pa.int64())))
        return pa.Table.from_arrays(
            [batch.column("p_partkey"), supp, cents],
            names=["p_partkey", "s_suppkey", "cents"],
        )

    named = lookup_join(
        winners.map_batches(decode, batch_format="pyarrow"),
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", "s_suppkey", ["s_name"],
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["min_price"] = sql_round(b["cents"] / 100.0, 2)
        return b[["p_partkey", "s_suppkey", "s_name", "min_price"]]

    return named.map_batches(finish, batch_format="pandas")


Q2_SQL = """
WITH c AS (
  SELECT l_partkey AS p_partkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT), l_suppkey
         ) AS rn
  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_size >= 25)
SELECT p_partkey, l_suppkey AS s_suppkey, s_name, round(cents / 100.0, 2) AS min_price
FROM c JOIN supplier ON s_suppkey = l_suppkey
WHERE rn = 1
"""


def q16_supplier_variety(sf_dir: str, max_size: int = 15, num_partitions: int = None):
    """Supplier variety per part brand/size (TPC-H Q16 shape, bridged
    through lineitem — no partsupp table): distinct suppliers who sold
    non-ECONOMY parts of size ≤ 15, excluding the 'complaints' suppliers
    (names ending in 7), counted per (p_brand, p_size).

    Scale shape — exact distributed COUNT(DISTINCT) through ONE salted
    supplier-grain exchange: per-block distinct (brand, size, suppkey)
    triples salt by ``suppkey & (P-1)``, so every supplier's triples land
    in exactly one coarse partition; the in-partition pass dedups globally
    and pre-counts per (brand, size), and those |brands|×|sizes|-bounded
    partials fold through the ``grouped_agg`` no-exchange plan — counts
    add across partitions because no supplier spans two.  (The former
    triple-grain sort exchange paid the full key-grain shuffle for the
    same dedup; same-session A/B at sf0.1: 3.5-7.1 s → 2.5-3.2 s.)  The
    excluded-supplier set goes through the size-gated anti join
    (broadcast under the cap), and parts prune via the size-gated lookup
    join that also carries brand/size onto the fact rows."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import anti_join, lookup_join
    from .sources.tables import salted_partitions, table_rows

    parts = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.not_equal(b.column("p_type"), "ECONOMY"),
                pc.less_equal(b.column("p_size"), pa.scalar(max_size)),
            )
        ).select(["p_partkey", "p_brand", "p_size"]),
        batch_format="pyarrow",
    )

    bad_supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).map_batches(
        lambda b: b.filter(
            pc.match_like(b.column("s_name"), "%7")
        ).select(["s_suppkey"]),
        batch_format="pyarrow",
    )

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    li = anti_join(
        li, bad_supp, "l_suppkey", "s_suppkey",
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        # broadcast plan: same LIKE kernel, driver-side
        keys_driver=lambda: (
            lambda t: t.filter(
                pc.match_like(t.column("s_name"), "%7")
            ).select(["s_suppkey"])
        )(read_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name"])),
    )
    enriched = lookup_join(
        li, parts, "l_partkey", "p_partkey", ["p_brand", "p_size"],
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        right_driver=lambda: (
            lambda t: t.filter(
                pc.and_(
                    pc.not_equal(t.column("p_type"), "ECONOMY"),
                    pc.less_equal(t.column("p_size"), pa.scalar(max_size)),
                )
            ).select(["p_partkey", "p_brand", "p_size"])
        )(read_arrow(
            sf_dir, "part",
            columns=["p_partkey", "p_brand", "p_type", "p_size"])),
    )

    # floor=16: trivial in-group kernel, output P-invariant (see
    # events_cohort_retention); P scales with the dedup key's domain
    P = salted_partitions(table_rows(sf_dir, "supplier"), floor=16)

    def triple_partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(["p_brand", "p_size", "l_suppkey"])
            .group_by(["p_brand", "p_size", "l_suppkey"], use_threads=False)
            .aggregate([])
        )
        part = pc.cast(pc.bit_wise_and(out.column("l_suppkey"), P - 1), pa.int32())
        return out.append_column("part", part)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"p_brand": pd.Series([], dtype="object"),
                 "p_size": pd.Series([], dtype="int64"),
                 "supplier_cnt": pd.Series([], dtype="int64")}
            )
        out = (
            g.drop_duplicates(["p_brand", "p_size", "l_suppkey"])
            .groupby(["p_brand", "p_size"], as_index=False)
            .size()
            .rename(columns={"size": "supplier_cnt"})
        )
        return out.astype({"p_size": "int64", "supplier_cnt": "int64"})

    partials = (
        enriched.map_batches(triple_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: count_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )
    out = grouped_agg(
        partials,
        ["p_brand", "p_size"],
        [("supplier_cnt", "sum", "supplier_cnt")],
        max_groups=8192,  # |brands| x |sizes|
    )
    return out


Q16_SQL = """
SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'ECONOMY' AND p_size <= 15
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_size
"""


def q11_important_parts(sf_dir: str, nation_like: str = "NATION_1%",
                        fraction: float = 0.001, num_partitions: int = None):
    """Important parts by revenue concentration (TPC-H Q11 shape, bridged
    through lineitem — no partsupp table; reference has no analogue, this
    is an engine-native query): per-part revenue from suppliers in the
    ``nation_like`` nation group, keeping parts whose revenue exceeds
    ``fraction`` of the group total.

    Scale shape — the global-scalar-threshold pattern: per-part revenue
    is one partkey-grain grouped sum fed by map-side e-4 integer partials
    (exact — the threshold compare can't flip on float summation order);
    the global total is ``Dataset.sum`` over the partkey-grain aggregate
    (a distributed fold, one number reaches the driver); the threshold
    broadcasts back as a scalar into a filter map.  The output is
    provably bounded regardless of corpus size: at most ``1/fraction``
    parts can each exceed ``fraction`` of the total.  Supplier membership
    flows through the size-gated semi join; the nation group resolves on
    the driver from the always-tiny nation dimension."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import semi_join
    from .sources.tables import read_arrow, table_rows

    nations = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    key_list = nations.filter(
        pc.match_like(nations.column("n_name"), nation_like)
    ).column("n_nationkey").to_pylist()

    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: b.filter(
            pc.is_in(
                b.column("s_nationkey"),
                value_set=pa.array(key_list, type=b.column("s_nationkey").type),
            )
        ).select(["s_suppkey"]),
        batch_format="pyarrow",
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = semi_join(
        li, supp, "l_suppkey", "s_suppkey",
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        keys_driver=lambda: read_arrow_filtered(
            sf_dir, "supplier", columns=["s_suppkey"],
            filters=[("s_nationkey", "in", key_list)]),
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("l_partkey"), _rev_e4(batch)],
            names=["l_partkey", "rev_e4"],
        )

    from .functions.joins import _collect_arrow

    vals = grouped_agg(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_partkey"], [("rev_e4", "sum", "value_e4")],
        # provable bound: l_partkey ⊆ part's key domain (footer rows)
        max_groups=table_rows(sf_dir, "part"),
    )

    # ONE execution (was materialize + Dataset.sum + filter = 3): each
    # block emits its scalar sum (flag row) plus candidates above
    # fraction × block_sum — SOUND prune: total ≥ block_sum, so any row
    # above fraction × total is above fraction × block_sum; ≤ 1/fraction
    # candidates per block by construction, so the driver collect is
    # bounded at any corpus.  The exact global threshold applies on the
    # driver over the collected candidates.
    def partial(b: pa.Table) -> pa.Table:
        bs = int(pc.sum(b.column("value_e4")).as_py() or 0)
        cand = b.filter(
            pc.greater(
                pc.cast(b.column("value_e4"), pa.float64()),
                pa.scalar(float(bs) * fraction),
            )
        )
        return pa.Table.from_arrays(
            [
                pa.concat_arrays(
                    [cand.column("l_partkey").combine_chunks(),
                     pa.array([0], type=pa.int64())]
                ),
                pa.concat_arrays(
                    [cand.column("value_e4").combine_chunks(),
                     pa.array([bs], type=pa.int64())]
                ),
                pa.array([False] * cand.num_rows + [True]),
            ],
            names=["l_partkey", "value_e4", "is_sum"],
        )

    tbl = _collect_arrow(vals.map_batches(partial, batch_format="pyarrow"))
    if tbl.num_rows == 0:
        return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    sums = tbl.filter(tbl.column("is_sum"))
    total = int(pc.sum(sums.column("value_e4")).as_py() or 0)
    cand = tbl.filter(pc.invert(tbl.column("is_sum")))
    keep = cand.filter(
        pc.greater(
            pc.cast(cand.column("value_e4"), pa.float64()),
            pa.scalar(float(total) * fraction),
        )
    )
    return pd.DataFrame(
        {
            "l_partkey": pd.Series(
                keep.column("l_partkey").to_pylist(), dtype="int64"
            ),
            "value": sql_round(
                pd.Series(keep.column("value_e4").to_pylist(), dtype="float64")
                / 10_000.0,
                2,
            ),
        }
    )


Q11_SQL = """
WITH vals AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS value_e4
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name LIKE 'NATION_1%'
  GROUP BY l_partkey)
SELECT l_partkey, round(value_e4 / 10000.0, 2) AS value
FROM vals
WHERE CAST(value_e4 AS DOUBLE) > (SELECT CAST(sum(value_e4) AS DOUBLE) FROM vals) * 0.001
"""


def q12_priority_class_lines(sf_dir: str, year: int = 1996, num_partitions: int = None):
    """Priority mix of shipped lines (TPC-H Q12 shape reshaped to this
    star schema — the tables carry no shipmode/commitdate/receiptdate, so
    the pivot key is ``l_returnflag``): per return flag, how many ``year``
    shipments belong to critical-priority orders (1-URGENT / 2-HIGH) vs
    not.

    Scale shape: lineitem prunes map-side to the date window before the
    one exchange; ``o_orderpriority`` arrives through the size-gated
    lookup join (orderkey is high-cardinality and uniform — no skew); the
    conditional pivot pre-reduces to (returnflag, high, low) per block so
    ≤ |flags| rows per block cross the final exchange."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    lo = pa.scalar(pd.Timestamp(f"{year}-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(f"{year + 1}-01-01"), type=pa.timestamp("us"))

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        ).select(["l_orderkey", "l_returnflag"]),
        batch_format="pyarrow",
    )

    enriched = lookup_join(
        li,
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]),
        "l_orderkey", "o_orderkey", ["o_orderpriority"],
        right_source_rows=table_rows(sf_dir, "orders"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]),
    )

    high_set = pa.array(["1-URGENT", "2-HIGH"], type=pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        is_high = pc.cast(
            pc.is_in(batch.column("o_orderpriority"), value_set=high_set),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [
                batch.column("l_returnflag"),
                is_high,
                pc.subtract(pa.scalar(1, type=pa.int64()), is_high),
            ],
            names=["l_returnflag", "high", "low"],
        )
        out = t.group_by(["l_returnflag"], use_threads=False).aggregate(
            [("high", "sum"), ("low", "sum")]
        )
        return out.rename_columns(
            ["l_returnflag", "high_line_count", "low_line_count"]
        )

    return grouped_agg(
        enriched.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        [
            ("high_line_count", "sum", "high_line_count"),
            ("low_line_count", "sum", "low_line_count"),
        ],
        max_groups=64,  # flag enum
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q20_potential_promotion(
    sf_dir: str, min_qty: float = 150.0, num_partitions: int = None
):
    """Suppliers shipping heavy volumes of promotable parts (TPC-H Q20
    shape, availqty test replaced by a shipped-quantity HAVING — no
    partsupp table): suppliers who shipped more than ``min_qty`` total
    units of 'small*'-named parts during 1996.

    Scale shape — semi join + grouped-sum + HAVING: lineitem is pruned
    map-side by the date window, then by the size-gated parts semi join;
    quantities carry as exact integer centi-units so the HAVING boundary
    can't flip on float summation order; only (suppkey, Σq100) partials
    cross the one exchange, and the few winners pick up ``s_name`` via
    the size-gated lookup join."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "lineitem")
    from .functions.joins import lookup_join, semi_join
    from .sources.tables import table_rows

    small_parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda b: b.filter(
            pc.match_like(b.column("p_name"), "small%")
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )

    lo = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), type=pa.timestamp("us"))
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        ).select(["l_partkey", "l_suppkey", "l_quantity"]),
        batch_format="pyarrow",
    )
    li = semi_join(
        li, small_parts, "l_partkey", "p_partkey",
        right_source_rows=table_rows(sf_dir, "part"),
        num_partitions=num_partitions,
        keys_driver=lambda: (
            lambda t: t.filter(
                pc.match_like(t.column("p_name"), "small%")
            ).select(["p_partkey"])
        )(read_arrow(sf_dir, "part", columns=["p_partkey", "p_name"])),
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        q100 = pc.cast(
            pc.round(pc.multiply(batch.column("l_quantity"), pa.scalar(100.0))),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [batch.column("l_suppkey"), q100], names=["s_suppkey", "q100"]
        )
        out = t.group_by(["s_suppkey"], use_threads=False).aggregate([("q100", "sum")])
        return out.rename_columns(["s_suppkey", "q100"])

    sums = grouped_agg(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["s_suppkey"], [("q100", "sum", "q100")],
        # provable bound: l_suppkey ⊆ supplier's key domain (footer rows)
        max_groups=table_rows(sf_dir, "supplier"),
    )
    thr = int(round(min_qty * 100))
    heavy = sums.map_batches(
        lambda b: b.filter(pc.greater(b.column("q100"), pa.scalar(thr, type=pa.int64()))),
        batch_format="pyarrow",
    )

    named = lookup_join(
        heavy,
        read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", "s_suppkey", ["s_name"],
        right_source_rows=table_rows(sf_dir, "supplier"),
        num_partitions=num_partitions,
        right_driver=lambda: read_arrow(
            sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["total_qty"] = sql_round(b["q100"] / 100.0, 2)
        return b[["s_suppkey", "s_name", "total_qty"]]

    return named.map_batches(finish, batch_format="pandas")


Q20_SQL = """
SELECT s_suppkey, s_name,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
         AS total_qty
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE 'small%'
JOIN supplier ON s_suppkey = l_suppkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY s_suppkey, s_name
HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 15000
"""


def _quality_e4(quality_col) -> "pa.Array":
    """4-dp quality score → exact e4 integer — the single definition both
    quality-threshold operators (and their oracles' ``round(quality*10000)``
    twins) depend on for pass-1/pass-2 agreement."""
    return pc.cast(
        pc.round(pc.multiply(quality_col, pa.scalar(10_000.0))), pa.int64()
    )


def _doc_quality_hist_frame(sf_dir: str) -> pd.DataFrame:
    """(lang, source, score_e4) quality-score histogram — ONE scoring scan
    + one value-domain-bounded exchange shared by the whole quality family
    (round-5 fold): ``doc_quality_filter`` (fold lang+source → global e4
    hist), ``doc_quality_pct_rank`` (fold source → per-lang hist),
    ``doc_source_quality_gate`` (Σe4 = Σ e4·n per source — exact integer),
    ``corpus_build_pipeline`` (threshold) and ``source_token_budget``
    (per-(source, e4) token sums — the ``tok`` member).  ≤ |langs| ×
    |sources| × |e4 domain| rows — the rounded-score value domain, never
    the corpus."""

    def compute() -> pd.DataFrame:
        from ray.data.aggregate import Sum

        docs = read_table(
            sf_dir, "documents", columns=["doc_id", "text", "lang", "source"]
        )

        def partial(batch: pa.Table) -> pa.Table:
            scored = quality_score_batch(batch)
            e4 = _quality_e4(scored.column("quality"))
            n_tok = pc.cast(
                pc.list_value_length(pc.split_pattern(batch.column("text"), " ")),
                pa.int64(),
            )
            t = pa.Table.from_arrays(
                [batch.column("lang"), batch.column("source"), e4, n_tok],
                names=["lang", "source", "e4", "tok"],
            )
            out = t.group_by(
                ["lang", "source", "e4"], use_threads=False
            ).aggregate([([], "count_all"), ("tok", "sum")])
            return out.rename_columns(["lang", "source", "e4", "n", "tok"])

        return (
            docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "source", "e4"])
            .aggregate(Sum("n", alias_name="n"), Sum("tok", alias_name="tok"))
            .to_pandas()  # value-domain rows only
            .sort_values(["lang", "source", "e4"], ignore_index=True)
        )

    return _cached_frame("doc_quality_hist", sf_dir, "documents", compute)


def doc_quality_filter(sf_dir: str, q: str = "0.25"):
    """Corpus-quantile quality pruning — the training-data 'drop the worst
    quartile' operator: compute the exact P25 of the heuristic quality
    score over the WHOLE corpus, then keep only documents at or above it.

    Scale shape — the two-streaming-scan global-threshold pattern (same as
    q17/q22): scores round to 4 decimals, so the e4-integer score domain
    is ≤10⁴ values and pass 1 folds a distributed (score_e4, count)
    histogram — one ≤|distinct scores|-row partial per block, never a row
    per document — reading the threshold off the cumulative count at the
    exact rational rank ``ceil(q·n)`` (DuckDB ``quantile_disc``
    semantics).  Pass 2 recomputes scores map-side and filters against
    the integer threshold; nothing doc-grain is ever materialized."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    thr = _quality_threshold_e4(sf_dir, q)
    if thr is None:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "quality": pd.Series([], dtype="float64")})

    def keep(batch: pa.Table) -> pa.Table:
        scored = quality_score_batch(batch)
        e4 = _quality_e4(scored.column("quality"))
        return scored.filter(
            pc.greater_equal(e4, pa.scalar(thr, type=pa.int64()))
        ).select(["doc_id", "quality"])

    return docs.map_batches(keep, batch_format="pyarrow")


def _quality_threshold_e4(sf_dir: str, q: str = "0.25"):
    """Pass 1 of the quality-threshold operators: the exact
    ``quantile_disc`` rank of the e4-integer score domain, folded from the
    shared ``_doc_quality_hist_frame`` (lang+source folded away — integer
    counts, exact).  Returns None on an empty corpus."""
    import math
    from fractions import Fraction

    frame = _doc_quality_hist_frame(sf_dir)
    if frame.empty:
        return None
    hist = (
        frame.groupby("e4", as_index=False)["n"].sum()
        .sort_values("e4", ignore_index=True)
    )
    total = int(hist["n"].sum())
    if total == 0:
        return None
    rank = max(1, math.ceil(Fraction(q) * total))
    cum = hist["n"].cumsum().to_numpy()
    return int(hist["e4"].to_numpy()[int(np.searchsorted(cum, rank, side="left"))])


DOC_QUALITY_FILTER_SQL = f"""
WITH q AS ({DOC_QUALITY_SQL}),
thr AS (
  SELECT quantile_disc(CAST(round(quality * 10000) AS BIGINT), 0.25) AS t FROM q)
SELECT doc_id, quality FROM q, thr
WHERE CAST(round(quality * 10000) AS BIGINT) >= t
"""


def doc_fixed_k_sample(sf_dir: str, k: int = 200):
    """Exact-k deterministic global sample — the 'carve a fixed-size eval
    set' operator: the k documents with the smallest engine-wide key hash,
    independent of cluster size, block layout, or retries (the affine
    hash with odd multiplier is a bijection on uint64, so there are no
    ties and the k-set is unique).

    Scale shape — distributed top-k without a global sort: each block
    keeps its k smallest hashes via ``np.argpartition`` (O(rows), not
    O(rows log rows)); a coalesce + re-reduce tree level then folds the
    ≤ k×|blocks| candidates down to ≤ k×64 rows (k×blocks into ONE final
    task would be GBs at 10⁶ blocks), and the single final partition
    selects the exact k winners.  The oracle is the same hash ordering
    in HUGEINT with ``LIMIT k``."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def block_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(ids)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            batch = batch.take(pa.array(idx))
            h = h[idx]
        return batch.append_column("__h", pa.array(h, type=pa.uint64()))

    def re_reduce(batch: pa.Table) -> pa.Table:
        h = batch.column("__h").to_numpy(zero_copy_only=False)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            batch = batch.take(pa.array(idx))
        return batch

    def final_topk(batch: pa.Table) -> pa.Table:
        order = np.argsort(batch.column("__h").to_numpy(zero_copy_only=False))[:k]
        return batch.take(pa.array(order)).select(["doc_id", "n_chars"])

    return (
        ds.map_batches(block_topk, batch_format="pyarrow")
        # tree level: coalesce candidate blocks (no data movement) and
        # re-reduce each coalesced block to ≤k rows before the final task
        .repartition(64)
        .map_batches(re_reduce, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


DOC_FIXED_K_SAMPLE_SQL = f"""
SELECT doc_id, n_chars FROM documents
ORDER BY (CAST(doc_id AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B}) % 18446744073709551616
LIMIT 200
"""


def doc_chunk_windows(sf_dir: str, window: int = 64, stride: int = 48):
    """Overlapping fixed-token chunking — the pretraining/RAG 'context
    window' operator: explode every document into ``window``-token chunks
    every ``stride`` tokens (16-token overlap at the defaults), emitting
    (doc_id, chunk_id, chunk_text, n_tokens) rows.

    Scale shape — a pure map-side 1→N explode with ZERO per-row Python:
    tokens are split once per batch into one flat Arrow string buffer;
    chunk starts/lengths come from numpy prefix-sum arithmetic over the
    list offsets; the overlap re-reads are a single vectorized
    ``pc.take`` gather on the flat buffer; and chunk strings are
    assembled by ``pc.binary_join`` over a rebuilt ListArray (the same
    Arrow-C assembly trick as the extractor).  No shuffle — chunk rows
    stay in their source block, so the op streams at any corpus size."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_chunk_explode(window, stride), batch_format="pyarrow")


def _chunk_explode(window: int, stride: int):
    """The per-batch chunking kernel of ``doc_chunk_windows`` as a factory,
    shared with the composed corpus-build pipeline."""

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).combine_chunks()
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        doc_off = np.concatenate([[0], np.cumsum(n)])
        # split('') == [''] so n >= 1 and every doc gets >= 1 chunk
        n_chunks = (n + stride - 1) // stride
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        chunk_off = np.concatenate([[0], np.cumsum(n_chunks)])
        local = np.arange(int(n_chunks.sum())) - np.repeat(chunk_off[:-1], n_chunks)
        start = local * stride
        clen = np.minimum(start + window, n[doc_idx]) - start
        idx_off = np.concatenate([[0], np.cumsum(clen)])
        gather = (
            np.arange(int(clen.sum()))
            - np.repeat(idx_off[:-1], clen)
            + np.repeat(doc_off[doc_idx] + start, clen)
        )
        # int64 offsets (LargeList): int32 would cap one batch at 2^31
        # gathered tokens, which a batch of very large docs can exceed
        lists = pa.LargeListArray.from_arrays(
            pa.array(idx_off, type=pa.int64()),
            pc.take(flat, pa.array(gather, type=pa.int64())),
        )
        return pa.Table.from_arrays(
            [
                pc.take(batch.column("doc_id"), pa.array(doc_idx, type=pa.int64())),
                pa.array(local, type=pa.int64()),
                pc.binary_join(lists, " "),
                pa.array(clen, type=pa.int64()),
            ],
            names=["doc_id", "chunk_id", "chunk_text", "n_tokens"],
        )

    return explode


DOC_CHUNK_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), 48)) AS start
  FROM t)
SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
       array_to_string(toks[start + 1 : least(start + 64, len(toks))], ' ')
         AS chunk_text,
       CAST(least(start + 64, len(toks)) - start AS BIGINT) AS n_tokens
FROM c
"""


def events_funnel_counts(sf_dir: str, num_partitions: int = None):
    """Ordered funnel analysis — the product-analytics 'view → click →
    purchase' operator: how many users performed each stage strictly after
    completing the previous one (first view, then first click after that
    view, then first purchase after that click).

    Scale shape — ONE salted user-partition exchange (same pattern as
    sessionize: P scales with table rows, a coarse partition per Ray
    group, never a group per user), then the whole funnel evaluates
    vectorized inside each partition with three C-level groupby-mins and
    timestamp maps — no per-user Python.  Each partition emits a single
    3-counter partial row; the driver-side fold sees |partitions| rows."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "events"))
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), num_partitions - 1), pa.int32()
        )
        return batch.append_column("part", part)

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        ta = g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
        clicks = g[g["event_type"] == "click"]
        clicks = clicks[clicks["ts"] > clicks["user_id"].map(ta)]
        tb = clicks.groupby("user_id")["ts"].min()
        purch = g[g["event_type"] == "purchase"]
        purch = purch[purch["ts"] > purch["user_id"].map(tb)]
        tc = purch.groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {"n_view": [len(ta)], "n_click": [len(tb)], "n_purchase": [len(tc)]}
        )

    partials = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: funnel_part(g.drop(columns=["part"])), batch_format="pandas"
        )
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {c: [int(b[c].sum())] for c in ("n_view", "n_click", "n_purchase")}
        )

    return partials.repartition(1).map_batches(fold, batch_format="pandas", batch_size=None)


EVENTS_FUNNEL_SQL = """
WITH a AS (
  SELECT user_id, min(ts) AS ta FROM events
  WHERE event_type = 'view' GROUP BY user_id),
b AS (
  SELECT e.user_id, min(e.ts) AS tb FROM events e JOIN a USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > ta GROUP BY e.user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > tb GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS n_click,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_purchase
"""


# source-preference order for policy dedup: curated sources win over bulk
# crawl; unknown sources rank last (mirrors MIXTURE_PCT's curation tiers)
_SOURCE_PRIORITY = ["src0", "src1", "src2", "src3"]


def _keep_best_salt_partitions(source_rows: int) -> int:
    """Salt P for the keep-best dedup exchange: the footer-rows clamp
    capped at ``_SALTED_DEDUP_MAX_P`` — ``_hash_salt`` decodes at most 4
    hex chars (16 bits), so a larger P would silently alias back to 2^16
    effective partitions (ADVICE round 3).  Answers are P-invariant; only
    the per-partition group size grows past ~10^11 rows, where
    ``exact_dedup``'s sort fallback is the documented escape hatch."""
    from .functions.dedup import _SALTED_DEDUP_MAX_P
    from .sources.tables import salted_partitions

    return min(salted_partitions(source_rows), _SALTED_DEDUP_MAX_P)


def dedup_exact_keep_best(sf_dir: str, num_partitions: int = None):
    """Policy dedup — keep the BEST copy per duplicate text, not the
    arbitrary min-id one: exact duplicates collapse to the copy from the
    most-curated source (``_SOURCE_PRIORITY`` order, doc_id tiebreak).
    Exact copies have identical text, so the policy must rank an
    EXTRINSIC attribute — provenance — which is how crawl pipelines
    actually choose survivors.

    Scale shape — the q2 packed-argmin trick on the dedup exchange:
    (source-priority, doc_id) packs into one int64
    ``comb = prio·2³² + doc_id``, per-block Arrow partials pre-reduce
    min(comb) + count per 128-bit content hash, and ONE salted exchange
    (hash leading bytes & (P-1) — a hash never splits across partitions,
    the ``exact_dedup`` argument) finalizes min/sum in-partition carrying
    (hash, comb, count) only — never a document body; survivors pick
    their attributes back up through the size-gated lookup join."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "documents")
    from .functions.dedup import _hash_salt, content_hash_batch
    from .functions.joins import lookup_join
    from .sources.tables import table_rows

    P = _keep_best_salt_partitions(table_rows(sf_dir, "documents"))

    prio_set = pa.array(_SOURCE_PRIORITY)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def argmin_partial(batch: pa.Table) -> pa.Table:
        hashed = content_hash_batch(batch, "text")
        prio = pc.cast(
            pc.fill_null(pc.index_in(batch.column("source"), value_set=prio_set),
                         len(_SOURCE_PRIORITY)),
            pa.int64(),
        )
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        if len(batch) and pc.max(ids).as_py() >= (1 << 32):
            raise ValueError(
                "dedup_exact_keep_best comb-packing bound exceeded (doc_id >= 2^32)"
            )
        comb = pc.add(
            pc.multiply(prio, pa.scalar(1 << 32, type=pa.int64())), ids
        )
        t = pa.Table.from_arrays(
            [hashed.column("content_hash"), comb], names=["content_hash", "comb"]
        )
        out = t.group_by(["content_hash"], use_threads=False).aggregate(
            [("comb", "min"), ([], "count_all")]
        )
        out = out.rename_columns(["content_hash", "comb", "n_copies"])
        return out.append_column("part", _hash_salt(out.column("content_hash"), P))

    def combine_part(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("content_hash", as_index=False)
            .agg({"comb": "min", "n_copies": "sum"})
        )
        return out.astype({"comb": "int64", "n_copies": "int64"})

    reps = (
        docs.map_batches(argmin_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: combine_part(g.drop(columns=["part"])), batch_format="pandas"
        )
    )

    def decode(batch: pa.Table) -> pa.Table:
        comb = batch.column("comb")
        prio = pc.divide(comb, pa.scalar(1 << 32, type=pa.int64()))
        doc_id = pc.subtract(comb, pc.multiply(prio, pa.scalar(1 << 32, type=pa.int64())))
        return pa.Table.from_arrays(
            [doc_id, batch.column("n_copies")], names=["doc_id", "n_copies"]
        )

    kept = lookup_join(
        read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"]),
        reps.map_batches(decode, batch_format="pyarrow"),
        "doc_id",
        "doc_id",
        ["n_copies"],
        right_source_rows=table_rows(sf_dir, "documents"),
        num_partitions=num_partitions,
    )
    return kept


DEDUP_KEEP_BEST_SQL = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY text
           ORDER BY CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 1
                                WHEN 'src2' THEN 2 WHEN 'src3' THEN 3
                                ELSE 4 END,
                    doc_id) AS rn,
         count(*) OVER (PARTITION BY text) AS nc
  FROM documents)
SELECT doc_id, source, n_chars, CAST(nc AS BIGINT) AS n_copies
FROM r WHERE rn = 1
"""


def doc_quality_pct_rank(sf_dir: str):
    """Per-language PERCENT_RANK of the quality score — the distributed
    window-function shape: rank every document within its language without
    any per-language sort of the corpus.

    Scale shape — pass 1 folds a per-(lang, score_e4) histogram (≤ |langs|
    × 10⁴ rows — the rounded-score domain, never the corpus) from one
    partial per block; the driver turns it into per-lang sorted score
    arrays with cumulative counts-below; pass 2 recomputes scores map-side
    and reads each doc's rank off a binary search.  ``percent_rank`` =
    count(<score)/(n−1) — both engines divide the same two exact integers,
    so 6-dp rounding can't flip."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    # pass 1 folds from the shared _doc_quality_hist_frame (source folded
    # away — integer counts, exact)
    hist = (
        _doc_quality_hist_frame(sf_dir)
        .groupby(["lang", "e4"], as_index=False)["n"].sum()
        .sort_values(["lang", "e4"], ignore_index=True)
    )
    import ray

    from .functions.broadcast import get_cached

    ranks = {}  # lang -> (sorted score_e4 array, count-below array, n_total)
    for lang, grp in hist.groupby("lang"):
        vals = grp["e4"].to_numpy()
        counts = grp["n"].to_numpy()
        below = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ranks[lang] = (vals, below, int(counts.sum()))
    # broadcast once (ray.put + per-worker cache), not closure-captured:
    # |langs| × |distinct scores| arrays re-shipped per task would add up
    # at a many-language corpus
    ranks_ref = ray.put(ranks)

    def rank_batch(batch: pa.Table) -> pa.Table:
        ranks = get_cached(ranks_ref)
        scored = quality_score_batch(batch)
        e4 = _quality_e4(scored.column("quality")).to_numpy()
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        pct = np.zeros(len(e4), dtype=np.float64)
        for lang in np.unique(langs):
            m = langs == lang
            vals, below, n = ranks[lang]
            if n > 1:
                idx = np.searchsorted(vals, e4[m], side="left")
                pct[m] = below[idx] / (n - 1)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("lang"),
                scored.column("quality"),
                pa.array(sql_round(pct, 6)),
            ],
            names=["doc_id", "lang", "quality", "pct_rank"],
        )

    return docs.map_batches(rank_batch, batch_format="pyarrow")


DOC_QUALITY_PCT_RANK_SQL = f"""
WITH s AS ({DOC_QUALITY_SQL})
SELECT s.doc_id, d.lang, s.quality,
       round(percent_rank() OVER (
         PARTITION BY d.lang
         ORDER BY CAST(round(s.quality * 10000) AS BIGINT)), 6) AS pct_rank
FROM s JOIN documents d USING (doc_id)
"""


def nation_party_mix(sf_dir: str):
    """Per-nation party census across TWO entity tables — the UNION ALL
    shape: suppliers and customers pooled into one stream, counted and
    balance-summed per nation.

    Scale shape — ``Dataset.union`` concatenates the two streams lazily
    (no shuffle, no materialization; blocks interleave under the
    streaming executor), each side is pre-projected to (nationkey,
    balance cents) map-side, per-block partials reduce to ≤|nations| rows
    before the one tiny exchange, and nation names resolve from the
    25-row broadcast — exact integer cents end to end."""
    def prep(nk_col: str, bal_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(batch.column(bal_col), pa.scalar(100.0))),
                pa.int64(),
            )
            t = pa.Table.from_arrays(
                [pc.cast(batch.column(nk_col), pa.int64()), cents],
                names=["nationkey", "cents"],
            )
            out = t.group_by(["nationkey"], use_threads=False).aggregate(
                [("cents", "sum"), ([], "count_all")]
            )
            return out.rename_columns(["nationkey", "cents", "n_parties"])
        return fn

    supp = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"]).map_batches(
        prep("s_nationkey", "s_acctbal"), batch_format="pyarrow"
    )
    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"]).map_batches(
        prep("c_nationkey", "c_acctbal"), batch_format="pyarrow"
    )
    pooled = grouped_agg(
        supp.union(cust),
        ["nationkey"],
        [("n_parties", "sum", "n_parties"), ("cents", "sum", "cents")],
        max_groups=64,  # nation dimension
    )

    nation_t = read_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        names = dict(
            zip(nation_t.column("n_nationkey").to_pylist(),
                nation_t.column("n_name").to_pylist())
        )
        b["nation"] = b["nationkey"].map(names)
        b["total_acctbal"] = sql_round(b["cents"] / 100.0, 2)
        return b[["nation", "n_parties", "total_acctbal"]]

    return pooled.map_batches(finish, batch_format="pandas")


NATION_PARTY_MIX_SQL = """
WITH p AS (
  SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
  UNION ALL
  SELECT c_nationkey, c_acctbal FROM customer)
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_parties,
       round(CAST(sum(CAST(round(acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
         AS total_acctbal
FROM p JOIN nation ON n_nationkey = nationkey
GROUP BY n_name
"""


def ann_multi_topk(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Batched multi-query ANN — the evaluation/retrieval shape: per-query
    cosine top-k for a whole query SET in ONE corpus pass (per-query scans
    would read the corpus Q times).

    Scale shape — the broadcast-small-side pattern widened to a matrix:
    the Q×d normalized query matrix ships once (``ray.put`` + per-worker
    cache), each block does ONE (n×d)·(d×Q) matmul, keeps k candidates
    per query by the exact output ordering (rounded score desc, vec_id
    asc — selection on the ROUNDED score so a 5-dp tie at the block
    boundary can't drop the true winner), and a coalesce + re-reduce tree
    level bounds the final task at ≤ 64·Q·k rows.  Q·k rows come out."""
    import os

    import pyarrow.parquet as pq
    import ray

    from .functions.broadcast import get_cached

    qtbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    from .functions.ann import embedding_matrix

    qids = qtbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = embedding_matrix(qtbl.column("embedding"))
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((qids, qmat))

    def select_topk(qid, ids, scores):
        """Exact per-query candidate selection: rounded score desc, id asc."""
        order = np.lexsort((ids, -scores))[:k]
        n = len(order)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(n, qid, dtype=np.int64)),
                pa.array(ids[order]),
                pa.array(scores[order]),
            ],
            names=["query_id", "vec_id", "score"],
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        from .functions.ann import embedding_matrix

        qids, qmat = get_cached(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = embedding_matrix(batch.column("embedding"))
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        scores = sql_round(mat @ qmat.T, 5)  # (n, Q), rounded once
        return pa.concat_tables(
            [select_topk(qids[qi], ids, scores[:, qi]) for qi in range(len(qids))]
        )

    def re_reduce(batch: pa.Table) -> pa.Table:
        qs = batch.column("query_id").to_numpy(zero_copy_only=False)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sc = batch.column("score").to_numpy(zero_copy_only=False)
        return pa.concat_tables(
            [select_topk(q, ids[qs == q], sc[qs == q]) for q in np.unique(qs)]
        )

    return (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow")
        .repartition(64)
        .map_batches(re_reduce, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(re_reduce, batch_format="pyarrow", batch_size=None)
    )


ANN_MULTI_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 5)
           AS score
  FROM embeddings e CROSS JOIN q)
SELECT query_id, vec_id, score FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rn
  FROM s) t
WHERE rn <= 10
"""


def corpus_build_pipeline(sf_dir: str, num_partitions: int = None):
    """The end-to-end training-corpus build — the composition a data team
    actually ships: quality-threshold pruning (drop the worst quartile) →
    exact dedup (min-id survivor among the KEPT docs) → overlapping
    64/48-token chunking.  Output is the training-ready chunk table.

    Scale shape — each stage keeps its own discipline and they compose
    without any corpus-sized materialization: pass 1 folds the ≤10⁴-row
    score histogram; pass 2 recomputes scores map-side and filters; the
    dedup exchange carries (content-hash, id) only; survivors come back
    through the size-gated semi join; chunking is a map-side explode.
    The one corpus-grain shuffle in the whole pipeline is the dedup
    groupby."""
    if num_partitions is None:
        # hash-plan P from the query's largest join side (footer rows) —
        # a fixed count would put |fact|/P rows on one aggregator at 100 TB
        num_partitions = _hash_join_partitions(sf_dir, "documents")
    from .functions.dedup import exact_dedup
    from .functions.joins import semi_join
    from .sources.tables import table_rows

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    thr = _quality_threshold_e4(sf_dir)
    if thr is None:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_id": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )

    def keep(batch: pa.Table) -> pa.Table:
        scored = quality_score_batch(batch)
        e4 = _quality_e4(scored.column("quality"))
        return batch.filter(pc.greater_equal(e4, pa.scalar(thr, type=pa.int64())))

    kept = docs.map_batches(keep, batch_format="pyarrow")
    reps = exact_dedup(
        kept, source_rows=table_rows(sf_dir, "documents")
    ).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    survivors = semi_join(
        kept, reps, "doc_id", "doc_id",
        # provable bound: survivors ≤ documents rows (footer metadata)
        right_source_rows=table_rows(sf_dir, "documents"),
        num_partitions=num_partitions,
    )
    return survivors.map_batches(_chunk_explode(64, 48), batch_format="pyarrow")


CORPUS_BUILD_SQL = f"""
WITH q AS ({DOC_QUALITY_SQL}),
thr AS (
  SELECT quantile_disc(CAST(round(quality * 10000) AS BIGINT), 0.25) AS t FROM q),
kept AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN q USING (doc_id), thr
  WHERE CAST(round(q.quality * 10000) AS BIGINT) >= t),
reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
surv AS (SELECT k.doc_id, k.text FROM kept k JOIN reps USING (doc_id)),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM surv),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), 48)) AS start
  FROM t)
SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
       array_to_string(toks[start + 1 : least(start + 64, len(toks))], ' ')
         AS chunk_text,
       CAST(least(start + 64, len(toks)) - start AS BIGINT) AS n_tokens
FROM c
"""


def lang_confusion_matrix(sf_dir: str):
    """Declared-vs-detected language confusion matrix — the data-quality
    audit a multilingual corpus runs before trusting its ``lang`` column:
    count documents per (declared lang, detected lang) pair.

    Scale shape — pure map-side: the stopword-vote detector runs in the
    same batch that carries the declared label, each block pre-counts its
    (lang, lang_pred) pairs with the Arrow C group-by, and the one
    exchange moves ≤ |langs|² partial rows per block."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        det = lang_id_batch(batch)
        t = pa.Table.from_arrays(
            [batch.column("lang"), det.column("lang_pred")],
            names=["lang", "lang_pred"],
        )
        out = t.group_by(["lang", "lang_pred"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["lang", "lang_pred", "n_docs"])

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "lang_pred"],
        [("n_docs", "sum", "n_docs")],
        max_groups=512,  # |langs|^2
    )


LANG_CONFUSION_SQL = f"""
WITH p AS ({DOC_LANG_SQL})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN p USING (doc_id)
GROUP BY d.lang, p.lang_pred
"""


def doc_source_quality_gate(sf_dir: str):
    """Source-level quality gating — the C4/RefinedWeb-style 'drop whole
    domains' operator: keep every document whose SOURCE's mean quality
    score is at or above the corpus-wide mean (a bad crawl host poisons
    all its pages; per-doc filtering misses that signal).

    Scale shape — two streaming scans, no doc-grain materialization.
    Pass 1 folds per-block (source, Σquality_e4, n) integer partials into
    a |sources|-row table; the keep decision is the EXACT rational compare
    ``Σe4_s · n_total ≥ Σe4_total · n_s`` in Python big-ints (no float
    mean, no overflow at any corpus size — Σe4·n exceeds int64 at 10¹²
    docs, which is why the oracle's HUGEINT product is mirrored with
    arbitrary-precision ints, not numpy).  Pass 2 recomputes scores
    map-side and filters against the broadcast keep-set (|sources|
    strings, captured in the closure)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    # pass 1 folds from the shared _doc_quality_hist_frame: per-source
    # Σe4 = Σ e4·n over histogram cells — exact integers (per-cell product
    # ≤ 10⁴·|corpus| fits int64 to ~10¹⁴ docs; the keep COMPARE below
    # still runs in Python big-ints because se4·n_total does not)
    frame = _doc_quality_hist_frame(sf_dir)
    per_source = (
        frame.assign(se4=frame["e4"] * frame["n"])
        .groupby("source", as_index=False)
        .agg(se4=("se4", "sum"), n=("n", "sum"))
    )
    if per_source.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "source": pd.Series([], dtype="object"),
                             "quality": pd.Series([], dtype="float64")})
    ge4 = int(per_source["se4"].sum())
    gn = int(per_source["n"].sum())
    keep_arr = pa.array(
        sorted(
            src
            for src, se4, n in per_source[["source", "se4", "n"]].itertuples(index=False)
            if int(se4) * gn >= ge4 * int(n)
        ),
        type=pa.string(),
    )

    def gate(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("source"), keep_arr)
        kept = batch.filter(mask)
        scored = quality_score_batch(kept)
        return pa.Table.from_arrays(
            [kept.column("doc_id"), kept.column("source"), scored.column("quality")],
            names=["doc_id", "source", "quality"],
        )

    return docs.map_batches(gate, batch_format="pyarrow")


DOC_SOURCE_GATE_SQL = f"""
WITH q AS ({DOC_QUALITY_SQL}),
j AS (
  SELECT d.doc_id, d.source, q.quality,
         CAST(round(q.quality * 10000) AS BIGINT) AS e4
  FROM documents d JOIN q USING (doc_id)
),
s AS (SELECT source, sum(e4) AS se4, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY source),
g AS (SELECT sum(e4) AS ge4, CAST(count(*) AS BIGINT) AS gn FROM j)
SELECT j.doc_id, j.source, j.quality
FROM j JOIN s USING (source), g
WHERE s.se4 * g.gn >= g.ge4 * s.n
"""


def cross_source_leakage(sf_dir: str, num_partitions: int = None):
    """Cross-source content-leakage histogram — how many distinct texts
    appear in exactly 1, 2, … sources.  A crawl whose mirrors/aggregators
    re-host the same pages shows mass above n_sources=1; the histogram is
    the audit that sizes cross-source dedup before running it.

    Scale shape: each block dedups to distinct (content_hash, source)
    pairs (Arrow C group-by — the text body never leaves the read batch),
    the ONE exchange hash-partitions those 16-byte pairs by content hash
    so every text's pair-set is partition-local, and each partition counts
    distinct sources per hash then pre-folds its (n_sources, n_texts)
    histogram — ≤|sources| rows per partition cross the final tiny sum.
    Text identity is THE engine content hash (``content_hash_batch``, the
    one exact_dedup groups on — NULL ≡ '', mirrored by the oracle's
    COALESCE); the salt reuses its first 8 hex digits, no second hash."""
    from .functions.dedup import content_hash_batch
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "documents"))
    docs = read_table(sf_dir, "documents", columns=["text", "source"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        hashed = content_hash_batch(batch, "text")
        hashes = hashed.column("content_hash")
        part = pa.array(
            [int(h[:16], 16) & (num_partitions - 1) for h in hashes.to_pylist()],
            type=pa.int64(),
        )
        pairs = pa.table(
            {
                "content_hash": hashes,
                "source": batch.column("source"),
                "part": part,
            }
        )
        return pairs.group_by(
            ["content_hash", "source", "part"], use_threads=False
        ).aggregate([])

    def hist_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        n_sources = df.groupby("content_hash")["source"].nunique()
        hist = n_sources.value_counts()
        return pd.DataFrame(
            {"n_sources": hist.index.astype("int64"), "n_texts": hist.to_numpy()}
        )

    pairs = docs.map_batches(pair_partial, batch_format="pyarrow")
    return grouped_agg(
        pairs.groupby("part").map_groups(hist_in_partition, batch_format="pandas"),
        ["n_sources"],
        [("n_texts", "sum", "n_texts")],
        max_groups=512,  # bounded by the source enum size
    )


CROSS_SOURCE_LEAKAGE_SQL = """
SELECT n_sources, CAST(count(*) AS BIGINT) AS n_texts
FROM (SELECT coalesce(text, '') AS t,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM documents GROUP BY t)
GROUP BY n_sources
"""


def corpus_zipf_slope(sf_dir: str, k: int = 1000):
    """Zipf-law slope of the corpus — the log-log OLS fit of frequency vs
    rank over the top-k terms.  Natural text sits near −1; a slope far off
    flags boilerplate floods or synthetic/templated text before training.

    Scale shape: exact term counts via the pre-counted partial exchange
    (one (term, block) row per block, same as ``doc_top_terms``), then
    distributed top-k WITHOUT a global sort — per-block argpartition on
    (−n, term) keeps k candidates, one coalesce level folds them, and the
    single final task ranks k rows and computes the closed-form OLS.  The
    oracle mirrors the fit with explicit Σ sums over the same top-k (ties
    broken by term, so the rank assignment is deterministic)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", columns=["text"])

    def term_partial(batch: pa.Table) -> pa.Table:
        terms = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.Table.from_arrays([terms], names=["term"])
        out = t.group_by(["term"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["term", "n"])

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows > k:
            idx = pc.select_k_unstable(
                batch, k, [("n", "descending"), ("term", "ascending")]
            )
            batch = batch.take(idx)
        return batch

    def fit(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch, sort_keys=[("n", "descending"), ("term", "ascending")]
        )[:k]
        top = batch.take(idx)
        n = top.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.log(np.arange(1, len(n) + 1, dtype=np.float64))
        y = np.log(n)
        m = float(len(n))
        denom = m * (x * x).sum() - x.sum() ** 2
        # denom == 0 (≤1 distinct term) → NULL on both engines, never NaN
        slope = (
            float(sql_round([(m * (x * y).sum() - x.sum() * y.sum()) / denom], 6)[0])
            if denom
            else None
        )
        return pa.Table.from_pydict(
            {
                "n_terms": pa.array([len(n)], type=pa.int64()),
                "slope": pa.array([slope], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(term_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(block_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fit, batch_format="pyarrow", batch_size=None)
    )


CORPUS_ZIPF_SQL = """
WITH c AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
r AS (
  SELECT ln(n) AS y,
         ln(CAST(row_number() OVER (ORDER BY n DESC, term) AS DOUBLE)) AS x
  FROM c ORDER BY n DESC, term LIMIT 1000
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) = 0 THEN NULL
            ELSE round((count(*) * sum(x * y) - sum(x) * sum(y))
                       / (count(*) * sum(x * x) - sum(x) * sum(x)), 6)
       END AS slope
FROM r
"""


def dedup_repeated_windows(
    sf_dir: str, width: int = 8, num_partitions: int = None
):
    """Substring-level duplication audit (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): per document, how many of
    its ``width``-token sliding windows (stride 1) occur ≥2 times anywhere
    in the corpus — the signal that drives ExactSubstr-style span cutting,
    which doc-grain exact/MinHash dedup cannot see (a page that quotes a
    boilerplate paragraph is not a doc-level duplicate).

    Scale shape — O(total tokens) work, the same asymptotics as the paper's
    suffix array, but in two bounded exchanges instead of a global sort:
    each block computes vectorized window hashes (``window_hashes`` — one
    blake2b per *unique* token, position-weighted xor combine) and pre-folds
    to distinct (window_hash, doc_id, count) rows.  Exchange 1 salts on
    ``hash & (P-1)`` so each window's full occurrence set is
    partition-local; the in-partition kernel marks hashes with total ≥2 and
    folds to per-doc partials, so exchange 2 moves ≤|docs|×P tiny rows into
    a fine-grained ``groupby(doc_id)``.  The window *text* never crosses an
    exchange — only 8-byte hashes (the oracle groups the real window text;
    equality holds up to 64-bit collisions, ~1e-8 at the driver's sf0.01)."""
    from .functions.dedup import window_hashes
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "documents"))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    empty = pa.table(
        {
            "whash": pa.array([], type=pa.uint64()),
            "doc_id": pa.array([], type=pa.int64()),
            "c": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int64()),
        }
    )

    def window_partial(batch: pa.Table) -> pa.Table:
        win = window_hashes(batch.column("text"), width)
        if win is None:
            return empty
        whash, doc_idx, _ = win
        wdoc = batch.column("doc_id").to_numpy()[doc_idx]
        t = pa.Table.from_arrays(
            [
                pa.array(whash, type=pa.uint64()),
                pa.array(wdoc, type=pa.int64()),
            ],
            names=["whash", "doc_id"],
        )
        out = t.group_by(["whash", "doc_id"], use_threads=False).aggregate(
            [([], "count_all")]
        ).rename_columns(["whash", "doc_id", "c"])
        part = pc.cast(
            pc.bit_wise_and(out.column("whash"), np.uint64(num_partitions - 1)),
            pa.int64(),
        )
        return out.append_column("part", part)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        totals = df.groupby("whash")["c"].transform("sum")
        return (
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "nw": df["c"],
                    "nr": df["c"].where(totals >= 2, 0),
                }
            )
            .groupby("doc_id", as_index=False)
            .sum()
        )

    def finish(batch: pa.Table) -> pa.Table:
        nw = batch.column("n_windows").to_numpy().astype(np.float64)
        nr = batch.column("n_repeated").to_numpy().astype(np.float64)
        return batch.append_column(
            "repeated_ratio", pa.array(sql_round(nr / nw, 4))
        )

    partials = (
        docs.map_batches(window_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
    )
    return grouped_agg(
        partials, ["doc_id"], [("nw", "sum", "n_windows"), ("nr", "sum", "n_repeated")],
        salt_key="doc_id",  # a doc never splits across salt partitions
        salt_partitions=salted_partitions(table_rows(sf_dir, "documents"), floor=16),
    ).map_batches(finish, batch_format="pyarrow")


def dedup_substring_cut(
    sf_dir: str,
    width: int = 8,
    num_partitions: int = None,
    keep_first: bool = False,
):
    """ExactSubstr dedup *action* (Lee et al. 2022 §4): cut every token
    covered by a ``width``-token window that occurs ≥2 times anywhere in
    the corpus, returning the cleaned text plus audit counts — the
    operator that actually removes cross-document boilerplate/quotation
    duplication that doc-grain dedup keeps.  Default cuts ALL occurrences
    (the paper's behavior; one copy survives only via doc-grain dedup);
    ``keep_first=True`` exempts each repeated window's globally-first
    occurrence (min ``(doc_id, start)`` — deterministic, order/layout/
    cluster-size independent), the keep-one-canonical-copy policy a
    training corpus usually wants.  The first-occurrence argmin is
    partition-local (all instances of a window hash share a partition),
    so the policy costs nothing extra.

    Scale shape — three bounded exchanges, no doc-grain driver state:
    stage 1 emits one (window_hash, doc_id, start) row per window
    (offsets must survive, so no pre-fold here — O(total tokens) rows is
    the honest cost, same as the paper's suffix array).  Exchange 1 salts
    on ``hash & (P-1)`` so each window's occurrence set is partition-local
    and keeps only repeated instances.  Exchange 2 salts on
    ``doc_id & (P-1)`` over the UNION of document rows and cut rows; the
    in-partition kernel rebuilds text fully vectorized: interval deltas →
    ``cumsum`` coverage → one Arrow filter + prefix-sum LargeList +
    ``binary_join`` (the extract-stage assembly trick) — zero per-doc
    Python string work."""
    from .functions.dedup import window_hashes
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "documents"))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    win_empty = pa.table(
        {
            "whash": pa.array([], type=pa.uint64()),
            "doc_id": pa.array([], type=pa.int64()),
            "off": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int64()),
        }
    )

    def window_rows(batch: pa.Table) -> pa.Table:
        win = window_hashes(batch.column("text"), width)
        if win is None:
            return win_empty
        whash, doc_idx, starts = win
        return pa.Table.from_arrays(
            [
                pa.array(whash, type=pa.uint64()),
                pa.array(batch.column("doc_id").to_numpy()[doc_idx], type=pa.int64()),
                pa.array(starts, type=pa.int64()),
                pa.array(
                    (whash & np.uint64(num_partitions - 1)).astype(np.int64),
                    type=pa.int64(),
                ),
            ],
            names=["whash", "doc_id", "off", "part"],
        )

    def repeated_instances(df: pd.DataFrame) -> pd.DataFrame:
        grp = df.groupby("whash")
        cut_mask = grp["whash"].transform("size") >= 2
        if keep_first:
            # pack (doc_id, off) into one int64 so min == lexicographic
            # first occurrence (off < 2^32 per doc by int32 span offsets)
            key = df["doc_id"] * np.int64(1 << 32) + df["off"]
            cut_mask &= key != key.groupby(df["whash"]).transform("min")
        cut = df[cut_mask]
        return pd.DataFrame({"doc_id": cut["doc_id"], "off": cut["off"]})

    # stage-1 (whash, doc_id, off, part) rows are identical for both cut
    # policies (keep_first only changes the in-partition kernel) — share
    # ONE materialized explode between dedup_substring_cut and
    # dedup_substring_cut_keep_first (object-store blocks, spillable; the
    # cache key carries width and P because `part` is embedded)
    win_rows = _cached_frame(
        f"substr_windows_w{width}_p{num_partitions}", sf_dir, "documents",
        lambda: docs.map_batches(window_rows, batch_format="pyarrow").materialize(),
    )
    cuts = (
        win_rows
        .groupby("part")
        .map_groups(repeated_instances, batch_format="pandas")
        .map_batches(
            lambda b: b.append_column(
                "text", pa.array([None] * b.num_rows, type=pa.string())
            ),
            batch_format="pyarrow",
        )
    )
    doc_rows = docs.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("doc_id"),
                pa.array([-1] * b.num_rows, type=pa.int64()),
                pc.fill_null(b.column("text"), ""),  # NULL ≡ '' (oracle COALESCEs)
            ],
            names=["doc_id", "off", "text"],
        ),
        batch_format="pyarrow",
    )
    both = doc_rows.union(cuts).map_batches(
        # strip per-branch pandas schema metadata so the unioned blocks
        # carry ONE schema into the exchange (mixed metadata defeats Ray's
        # schema dedup and spams the reduce tasks)
        lambda b: b.append_column(
            "part",
            pc.cast(pc.bit_wise_and(b.column("doc_id"), num_partitions - 1), pa.int64()),
        ).replace_schema_metadata(None),
        batch_format="pyarrow",
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["off"].to_numpy() == -1
        texts = pa.array(g["text"].to_numpy()[is_doc], type=pa.string())
        doc_ids = g["doc_id"].to_numpy()[is_doc]
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, texts = doc_ids[order], texts.take(pa.array(order))
        tok_lists = pc.split_pattern(texts, " ")
        flat = tok_lists.flatten()
        n_tok = pc.list_value_length(tok_lists).to_numpy().astype(np.int64)
        doc_first = np.zeros(len(doc_ids) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=doc_first[1:])
        # map cut rows to global token positions: doc_ids is sorted, so the
        # doc_id → local index map is one searchsorted (no per-row Python)
        cut = g[~is_doc]
        delta = np.zeros(len(flat) + 1, dtype=np.int64)
        if len(cut):
            d_idx = np.searchsorted(doc_ids, cut["doc_id"].to_numpy())
            s = doc_first[d_idx] + cut["off"].to_numpy()
            np.add.at(delta, s, 1)
            np.add.at(delta, s + width, -1)
        covered = np.cumsum(delta[:-1]) > 0
        kept = flat.filter(pa.array(~covered))
        n_cut = np.add.reduceat(covered.astype(np.int64), doc_first[:-1]) if len(
            flat
        ) else np.zeros(len(doc_ids), dtype=np.int64)
        n_cut[n_tok == 0] = 0  # reduceat repeats on empty slices
        kept_counts = n_tok - n_cut
        kept_offsets = np.zeros(len(doc_ids) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=kept_offsets[1:])
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(kept_offsets, type=pa.int64()), kept
            ),
            " ",
        )
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "clean_text": clean.to_pandas(),
                "n_tokens": n_tok,
                "n_cut": n_cut,
            }
        )

    return both.groupby("part").map_groups(rebuild, batch_format="pandas")


DEDUP_SUBSTRING_CUT_SQL = """
WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
           FROM documents),
w AS (
  SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 7), ' ') AS win
  FROM d, unnest(generate_series(1, greatest(len(toks) - 8 + 1, 0))) AS g(i)
),
c AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
cut AS (
  SELECT DISTINCT w.doc_id, t.j
  FROM w JOIN c USING (win), unnest(generate_series(w.i, w.i + 7)) AS t(j)
),
tok AS (
  SELECT doc_id, toks[u.ord] AS tok, u.ord
  FROM d, unnest(generate_series(1, len(toks))) AS u(ord)
),
kept AS (
  SELECT tok.doc_id,
         string_agg(tok.tok, ' ' ORDER BY tok.ord) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM tok
  LEFT JOIN cut ON cut.doc_id = tok.doc_id AND cut.j = tok.ord
  WHERE cut.j IS NULL
  GROUP BY tok.doc_id
)
SELECT d.doc_id,
       coalesce(k.clean_text, '') AS clean_text,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       CAST(len(d.toks) - coalesce(k.n_kept, 0) AS BIGINT) AS n_cut
FROM d LEFT JOIN kept k USING (doc_id)
"""


def dedup_substring_cut_keep_first(sf_dir: str, width: int = 8):
    """`dedup_substring_cut` with the keep-one-canonical-copy policy (each
    repeated window's globally-first occurrence survives) — see there."""
    return dedup_substring_cut(sf_dir, width=width, keep_first=True)


# same plan as DEDUP_SUBSTRING_CUT_SQL, but each window's first occurrence
# (min packed (doc_id, i) key — SQL i is 1-based, Ray off 0-based: a
# constant shift per occurrence, so the argmin is identical) is exempt
DEDUP_SUBSTRING_CUT_KEEP_FIRST_SQL = """
WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
           FROM documents),
w AS (
  SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 7), ' ') AS win
  FROM d, unnest(generate_series(1, greatest(len(toks) - 8 + 1, 0))) AS g(i)
),
c AS (SELECT win, min(doc_id * 4294967296 + i) AS first_key
      FROM w GROUP BY win HAVING count(*) >= 2),
cut AS (
  SELECT DISTINCT w.doc_id, t.j
  FROM w JOIN c USING (win), unnest(generate_series(w.i, w.i + 7)) AS t(j)
  WHERE w.doc_id * 4294967296 + w.i <> c.first_key
),
tok AS (
  SELECT doc_id, toks[u.ord] AS tok, u.ord
  FROM d, unnest(generate_series(1, len(toks))) AS u(ord)
),
kept AS (
  SELECT tok.doc_id,
         string_agg(tok.tok, ' ' ORDER BY tok.ord) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM tok
  LEFT JOIN cut ON cut.doc_id = tok.doc_id AND cut.j = tok.ord
  WHERE cut.j IS NULL
  GROUP BY tok.doc_id
)
SELECT d.doc_id,
       coalesce(k.clean_text, '') AS clean_text,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       CAST(len(d.toks) - coalesce(k.n_kept, 0) AS BIGINT) AS n_cut
FROM d LEFT JOIN kept k USING (doc_id)
"""


DEDUP_REPEATED_WINDOWS_SQL = """
WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
           FROM documents),
w AS (
  SELECT doc_id, array_to_string(list_slice(toks, i, i + 7), ' ') AS win
  FROM d, unnest(generate_series(1, greatest(len(toks) - 8 + 1, 0))) AS g(i)
),
c AS (SELECT win, count(*) AS total FROM w GROUP BY win),
p AS (SELECT w.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN c.total >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeated
      FROM w JOIN c USING (win) GROUP BY w.doc_id)
SELECT doc_id, n_windows, n_repeated,
       round(n_repeated / CAST(n_windows AS DOUBLE), 4) AS repeated_ratio
FROM p
"""


def layout_reading_order(sf_dir: str):
    """Layout-aware reconstruction end-to-end, oracle-checked — the north
    rule's "column detection, reading-order sort via y/x coordinate
    clustering" exercised as a real kernel (``stages/layout.py``), not
    left latent in the extraction backends: each document's tokens are
    deterministically typeset onto a two-column page (≥8 tokens → two
    columns, column-major: first ⌈n/2⌉ tokens stack top-down at x≈0.05,
    the rest at x≈0.60, with intra-column x jitter ≪ the gap threshold),
    the positioned spans are deterministically SHUFFLED (order by the
    engine key hash — the stage may not trust input order), pushed through
    ``assign_reading_order`` (gap-clustered columns → (col, −y, x) sort),
    and reassembled; ``order_ok`` is literal string equality of the
    rebuilt text against the original, so the hash check pins the whole
    technique.  A naive y-then-x sort interleaves the two columns and
    fails this — the column split is load-bearing.

    Scale shape: map-only, one streaming pass, everything vectorized
    (two lexsorts + cumsum across the whole batch; assembly is the
    prefix-sum ListArray + ``binary_join`` trick)."""
    from .stages.layout import reading_order_flat

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text").combine_chunks(), "")
        tok_lists = pc.split_pattern(texts, " ")
        toks = tok_lists.flatten()
        n_tok = pc.list_value_length(tok_lists).to_numpy().astype(np.int64)
        doc_idx = pc.list_parent_indices(tok_lists).to_numpy().astype(np.int64)
        starts = np.cumsum(n_tok) - n_tok
        i = np.arange(len(toks), dtype=np.int64) - starts[doc_idx]  # token #
        half = (n_tok[doc_idx] + 1) // 2
        two_col = n_tok[doc_idx] >= 8
        col = np.where(two_col & (i >= half), 1, 0)
        row = np.where(col == 1, i - half, i)
        x = 0.05 + 0.55 * col + 0.001 * (row % 3)
        y = -row.astype(np.float64)

        # deterministic shuffle: the stage may not rely on input order
        perm = np.argsort(
            _sample_hash_u64(np.arange(len(toks), dtype=np.int64)), kind="stable"
        )
        sdoc, sx, sy = doc_idx[perm], x[perm], y[perm]
        stoks = toks.take(pa.array(perm))

        column, offset, n_cols = reading_order_flat(sdoc, sx, sy)

        # reassemble in (doc, offset) order and compare with the original
        back = np.lexsort((offset, sdoc))
        ordered = stoks.take(pa.array(back))
        offsets = pa.array(np.r_[0, np.cumsum(n_tok)], type=pa.int64())
        rebuilt = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, ordered), " "
        )
        ok = pc.equal(rebuilt, texts)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(n_tok, type=pa.int64()),
                pa.array(n_cols, type=pa.int64()),
                ok,
                pc.cast(pc.utf8_length(texts), pa.int64()),
            ],
            names=["doc_id", "n_spans", "n_cols", "order_ok", "body_chars"],
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


LAYOUT_READING_ORDER_SQL = """
SELECT doc_id,
       CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_spans,
       CAST(CASE WHEN len(string_split(coalesce(text, ''), ' ')) >= 8
                 THEN 2 ELSE 1 END AS BIGINT) AS n_cols,
       TRUE AS order_ok,
       CAST(length(coalesce(text, '')) AS BIGINT) AS body_chars
FROM documents
"""


def doc_train_split(sf_dir: str):
    """Deterministic train/val/test assignment — the split every training
    run needs, as a pure map-side filterable label: bucket = engine key
    hash mod 20, bucket 0 → 'val', 1 → 'test', else 'train' (a 90/5/5
    split in expectation, EXACT per doc).  Stable under retries, block
    layout, and cluster size; no coordination, no shuffle, no RNG state —
    the same property as ``doc_sample_hash``, whose HUGEINT oracle
    arithmetic this reuses."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = (_sample_hash_u64(ids) % np.uint64(20)).astype(np.int64)
        split = np.where(b == 0, "val", np.where(b == 1, "test", "train"))
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


DOC_TRAIN_SPLIT_SQL = f"""
SELECT doc_id,
       CASE CAST(((CAST(doc_id AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B})
                  % 18446744073709551616) % 20 AS BIGINT)
            WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def events_hourly_anomalies(sf_dir: str):
    """Traffic-anomaly screen: per event type, the z-score of each hourly
    event count against that type's own hourly distribution — the standard
    burst/outage detector run before trusting event-derived training
    signals.

    Scale shape: the corpus-sized work is the pre-reduced (type, hour)
    count exchange (``grouped_agg`` partials — identical to
    ``events_hourly``); z-scores are computed per type over the RESULT
    (|hours| rows per group, bounded by the time range, not the corpus).
    The z formula is written identically on both engines over exact
    integer sums — ``(n·k − s1) / sqrt(k·s2 − s1²)`` with the same
    cast-to-double points — so the rounded values hash-match (no
    Welford-vs-two-pass stddev divergence).  Hourly counts come from the
    shared ``_events_calendar_frame`` execution."""
    import math

    hourly = _events_calendar_frame(sf_dir)[["event_type", "hour", "n_events"]]

    def zscore(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_events"].to_numpy().astype(np.int64)
        k = len(n)
        s1 = int(n.sum())
        s2 = int((n * n).sum())
        arg = float(k) * s2 - float(s1) * s1
        # guard BEFORE sqrt: k·s2 − s1² ≥ 0 by Cauchy-Schwarz in exact ints,
        # but once sums pass 2^53 the float expression can round to a tiny
        # negative — which must drop (oracle WHERE), not raise a domain error
        if arg <= 0.0:  # constant traffic: z undefined
            return df.iloc[0:0].assign(z=pd.Series([], dtype="float64"))
        z = (n.astype(np.float64) * k - s1) / math.sqrt(arg)
        return df.assign(z=sql_round(z, 4))

    return (
        hourly.groupby("event_type", group_keys=False)[
            ["event_type", "hour", "n_events"]
        ]
        .apply(zscore)
        .reset_index(drop=True)
    )


EVENTS_HOURLY_ANOMALY_SQL = """
WITH h AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_events) AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM h GROUP BY 1
)
SELECT h.event_type, h.hour, h.n_events,
       round((CAST(h.n_events AS DOUBLE) * s.k - s.s1)
             / sqrt(CAST(s.k AS DOUBLE) * s.s2
                    - CAST(s.s1 AS DOUBLE) * s.s1), 4) AS z
FROM h JOIN s USING (event_type)
WHERE CAST(s.k AS DOUBLE) * s.s2 - CAST(s.s1 AS DOUBLE) * s.s1 > 0
"""


def doc_shuffle_shards(sf_dir: str, num_shards: int = 64):
    """Global deterministic shuffle into training shards — the final step
    before any training run: every document gets the engine's Weyl key
    hash, ``shard = h mod num_shards``, and ``pos`` = rank of (h, doc_id)
    within its shard, so the full corpus order is a reproducible
    permutation with no RNG state and no driver coordination.

    Scale shape: one Ray group per shard assembles one output shard (the
    shard file must be built somewhere); ``num_shards`` is the knob that
    must scale with the corpus so corpus/num_shards fits a worker — the
    same contract as ``doc_pack_sequences`` (the oracle embeds 64)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = _sample_hash_u64(ids)
        shard = (h % np.uint64(num_shards)).astype(np.int64)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(shard), pa.array(h)],
            names=["doc_id", "shard", "h"],
        )

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], ignore_index=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g.drop(columns=["h"])

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order, batch_format="pandas")
    )


DOC_SHUFFLE_SQL = f"""
WITH k AS (
  SELECT doc_id,
         (CAST(doc_id AS HUGEINT) * {_SAMPLE_A} + {_SAMPLE_B})
         % 18446744073709551616 AS h
  FROM documents
)
SELECT doc_id,
       CAST(h % 64 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id) - 1
            AS BIGINT) AS pos
FROM k
"""


def doc_bm25_topk(sf_dir: str, k: int = 10, k1: float = 1.2, b: float = 0.75):
    """BM25 relevance top-k for a fixed query ("hash join query") — the
    retrieval-style ranking a curation pipeline uses to pull on-topic
    documents (Robertson & Zaragoza 2009; the Lucene ``ln(1 + (N−df+.5)/
    (df+.5))`` idf variant, which is always positive).

    Scale shape: ONE pass over text reduces each document to a 5-int row
    (doc_id, dl, tf per query term); the compact projection (~40 bytes/doc,
    ≈0.4% of a 10 KB/doc corpus) is materialized so corpus stats and
    scoring don't re-scan text.  Stats (N, Σdl, per-term df) come from
    per-block partials — one row per block reaches the driver — and the
    float score formula is written with identical operation order on both
    engines so rounded values hash-match."""
    import math

    terms = ["hash", "join", "query"]
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def compact(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        arrays = [batch.column("doc_id"), pc.cast(pc.list_value_length(toks), pa.int64())]
        names = ["doc_id", "dl"]
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        n = len(batch)
        for t in terms:
            idx = parent.filter(pc.equal(flat, t)).to_numpy(zero_copy_only=False)
            arrays.append(pa.array(np.bincount(idx, minlength=n).astype(np.int64)))
            names.append(f"tf_{t}")
        return pa.Table.from_arrays(arrays, names=names)

    compact_ds = ds.map_batches(compact, batch_format="pyarrow").materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        row = {
            "n": [t.num_rows],
            "sum_dl": [pc.sum(t.column("dl")).as_py() or 0],
        }
        for q in terms:
            row[f"df_{q}"] = [
                pc.sum(pc.cast(pc.greater(t.column(f"tf_{q}"), 0), pa.int64())).as_py()
                or 0
            ]
        return pa.Table.from_pydict(row)

    parts = compact_ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    avgdl = int(parts["sum_dl"].sum()) / n_docs
    idf = {
        q: math.log((n_docs - int(parts[f"df_{q}"].sum()) + 0.5)
                    / (int(parts[f"df_{q}"].sum()) + 0.5) + 1.0)
        for q in terms
    }

    def score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        norm = k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl))
        s = np.zeros(len(batch), dtype=np.float64)
        for q in terms:
            tf = batch.column(f"tf_{q}").to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[q] * (tf * (k1 + 1.0)) / (tf + norm)
        out = batch.append_column("score", pa.array(sql_round(s, 4)))
        return out.filter(pa.array(s > 0.0))

    return top_k(
        compact_ds.map_batches(score, batch_format="pyarrow"),
        k, [("score", "descending"), ("doc_id", "ascending")],
    )


DOC_BM25_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         CAST(len(list_filter(string_split(text, ' '), t -> t = 'hash')) AS BIGINT) AS tf_hash,
         CAST(len(list_filter(string_split(text, ' '), t -> t = 'join')) AS BIGINT) AS tf_join,
         CAST(len(list_filter(string_split(text, ' '), t -> t = 'query')) AS BIGINT) AS tf_query
  FROM documents
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         CAST(sum(CASE WHEN tf_hash  > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_hash,
         CAST(sum(CASE WHEN tf_join  > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join,
         CAST(sum(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_query
  FROM c
)
SELECT doc_id, dl, tf_hash, tf_join, tf_query,
       round(
           ln((s.n - s.df_hash + 0.5) / (s.df_hash + 0.5) + 1.0)
             * (tf_hash * (1.2 + 1.0))
             / (tf_hash + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(s.sum_dl AS DOUBLE) / s.n))))
         + ln((s.n - s.df_join + 0.5) / (s.df_join + 0.5) + 1.0)
             * (tf_join * (1.2 + 1.0))
             / (tf_join + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(s.sum_dl AS DOUBLE) / s.n))))
         + ln((s.n - s.df_query + 0.5) / (s.df_query + 0.5) + 1.0)
             * (tf_query * (1.2 + 1.0))
             / (tf_query + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(s.sum_dl AS DOUBLE) / s.n)))),
         4) AS score
FROM c, s
WHERE tf_hash + tf_join + tf_query > 0
ORDER BY score DESC, doc_id
LIMIT 10
"""


def source_token_budget(sf_dir: str, budget: int = 800):
    """Per-source token-budget curation (C4/Pile-style mixture capping):
    keep each source's highest-quality documents — rank (quality DESC,
    doc_id ASC) — until the source's token budget is spent; the doc whose
    cumulative count would cross the budget is dropped, exactly as the
    oracle's windowed ``cum <= budget``.

    Scale shape: ONE text pass reduces each doc to a 4-field compact row
    (reusing ``quality_score_batch`` so the score can never drift from
    ``doc_quality``); the exchange carries per-(source, quality-bucket)
    token partials (≤ |sources| × 10⁴ rows — quality is rounded to 4
    decimals); the driver walks each source's bucket histogram to place
    the boundary bucket, fetches ONLY boundary-bucket rows to place the
    exact cut (bounded by one quality bucket per source — the documented
    resolution assumption), and the keep decision streams back as a
    vectorized threshold-compare + tiny id-set filter.  No per-source Ray
    group ever holds a source's full document list."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def compact_fn(batch: pa.Table) -> pa.Table:
        q = quality_score_batch(batch)
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(batch.column("text"), " ")),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), batch.column("source"), q.column("quality"),
             _quality_e4(q.column("quality")), n_tok],
            names=["doc_id", "source", "quality", "e4", "n_tokens"],
        )

    compact = ds.map_batches(compact_fn, batch_format="pyarrow").materialize()

    # bucket histogram folds from the shared _doc_quality_hist_frame
    # (lang folded away — exact integer token sums); thresholds live in
    # the e4 INT domain so the boundary compare can never drift a float
    # ulp from the score recomputation
    hist = (
        _doc_quality_hist_frame(sf_dir)
        .groupby(["source", "e4"], as_index=False)["tok"].sum()
    )

    # driver: walk each source's buckets best-first to place the boundary
    thresholds: Dict[str, tuple] = {}
    for src, g in hist.groupby("source"):
        g = g.sort_values("e4", ascending=False)
        cum, q_star, before = 0, None, None
        for qv, tok in zip(g["e4"], g["tok"]):
            if cum + tok > budget:
                q_star, before = int(qv), int(cum)
                break
            cum += int(tok)
        thresholds[str(src)] = (q_star, before)

    src_list = list(thresholds)
    src_arr = pa.array(src_list)
    qstar_np = np.array(
        [thresholds[s][0] if thresholds[s][0] is not None else np.iinfo(np.int64).min
         for s in src_list],
        dtype=np.int64,
    )

    def qstar_of(t: pa.Table) -> np.ndarray:
        idx = pc.index_in(t.column("source"), value_set=src_arr).to_numpy(
            zero_copy_only=False
        )
        return qstar_np[idx.astype(np.int64)]

    # boundary rows only: each source's single threshold bucket
    def is_boundary(t: pa.Table) -> pa.Table:
        e4 = t.column("e4").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(e4 == qstar_of(t)))

    boundary_keep: set = set()
    if any(q is not None for q, _ in thresholds.values()):
        brows = compact.map_batches(is_boundary, batch_format="pyarrow").to_pandas()
        for src, g in brows.groupby("source"):
            _, before = thresholds[str(src)]
            g = g.sort_values("doc_id")
            run = before + g["n_tokens"].cumsum()
            boundary_keep.update(int(i) for i in g.loc[run <= budget, "doc_id"])
    keep_ids = np.fromiter(boundary_keep, dtype=np.int64, count=len(boundary_keep))

    def final_filter(t: pa.Table) -> pa.Table:
        e4 = t.column("e4").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (e4 > qstar_of(t)) | np.isin(ids, keep_ids)
        return t.filter(pa.array(keep)).drop_columns(["e4"])

    return compact.map_batches(final_filter, batch_format="pyarrow")


SOURCE_TOKEN_BUDGET_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens_d,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_unique,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, source, n_tokens, n_tokens_d, n_unique,
         CASE WHEN n_tokens_d > 0
              THEN (n_chars - (n_tokens_d - 1)) / greatest(n_tokens_d, 1)
              ELSE 0 END AS mean_wl,
         least(n_tokens_d / 50.0, 1.0) AS len_score
  FROM t
), q AS (
  SELECT doc_id, source, n_tokens,
         round(0.4 * len_score
               + 0.2 * (CASE WHEN mean_wl >= 2 AND mean_wl <= 12 THEN 1.0 ELSE 0.3 END)
               + 0.4 * (CASE WHEN n_tokens_d > 0
                             THEN n_unique / greatest(n_tokens_d, 1) ELSE 0 END),
               4) AS quality
  FROM s
), r AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
)
SELECT doc_id, source, quality, n_tokens FROM r WHERE cum <= 800
"""


def events_grouping_sets(sf_dir: str):
    """CUBE(event_type, day) — all four grouping sets of the standard
    daily-traffic cube ((type, day), (type), (day), grand total) from ONE
    pass over the fact table.

    Scale shape: ONE scan and ONE exchange for the whole cube.  Each
    batch first reduces to its in-batch (type, day) groups with the
    Arrow C group-by, then derives all four grouping-set partials FROM
    that tiny pre-reduced table (coarser sets re-group |in-batch
    groups| rows, not the batch), tagging each with its ``grouping_id``
    and 'ALL' dimension sentinels.  The single exchange is keyed on
    (grouping_id, event_type, day) — cardinality = the sum of the four
    levels' result sizes — and carries only partial rows.  A literal
    GROUPING SETS evaluation scans the fact table once per set and
    shuffles each separately; this emits the union of partials through
    one shuffle.  ``grouping_id`` is the SQL-standard bitmask
    2·grouping(event_type) + grouping(day); rounding happens only at
    the output edge — the exchange re-reduces RAW in-batch sums.  The
    finest (type, day) statistics fold exactly from the shared
    ``_events_calendar_frame`` hourly grain (day = hour-string prefix);
    all four grouping sets derive from that calendar-bounded frame on the
    driver."""
    frame = _events_calendar_frame(sf_dir)
    base = (
        frame.assign(day=frame["hour"].str[:10])
        .groupby(["event_type", "day"], as_index=False)
        .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
    )

    def level(keys, gid: int) -> pd.DataFrame:
        if keys:
            g = base.groupby(keys, as_index=False).agg(
                n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
            )
        else:
            g = pd.DataFrame(
                [{"n_events": int(base["n_events"].sum()),
                  "sum_value": float(base["sum_value"].sum())}]
            )
        if "event_type" not in keys:
            g["event_type"] = "ALL"
        if "day" not in keys:
            g["day"] = "ALL"
        g["grouping_id"] = gid
        return g

    out = pd.concat(
        [level(["event_type", "day"], 0), level(["event_type"], 1),
         level(["day"], 2), level([], 3)],
        ignore_index=True,
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = sql_round(out["sum_value"], 2)
    out["grouping_id"] = out["grouping_id"].astype("int64")
    return out[["event_type", "day", "n_events", "sum_value", "grouping_id"]]


EVENTS_GROUPING_SETS_SQL = """
WITH e AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(day, 'ALL') AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(grouping(event_type) * 2 + grouping(day) AS BIGINT) AS grouping_id
FROM e
GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
"""


# docs per posting-list bucket: one (term, bucket) posting row is bounded by
# this many ids even for a stopword that appears in EVERY document
INDEX_BUCKET_DOCS = 20_000


def corpus_inverted_index(sf_dir: str, num_buckets: int = None):
    """Distributed inverted-index build: term → ascending postings list of
    the doc_ids containing it — the retrieval artifact a training-data
    pipeline materializes for contamination lookups and BM25 serving.

    Postings shard into ``doc_id % B`` buckets so one output row's list is
    bounded by |corpus|/B even for stopword-frequency terms; B scales with
    the corpus from footer row-count metadata (floor 64, power of two,
    same POWER/CEIL/LOG2 derivation the oracle recomputes from count(*) —
    the ``doc_pack_sequences`` pattern).

    Scale shape: one text pass explodes distinct (doc, term) pairs with an
    in-batch Arrow C group-by (a document is one row, so per-batch
    distinct IS globally distinct); the single exchange is keyed on the
    bucket (cardinality B — a coarse partition, never one Ray group per
    term); postings assemble inside each bucket fully in Arrow C:
    sort_by(term, doc_id) → hash_list → ``binary_join``.  Output:
    (term, bucket, n_docs, postings) with postings a comma-joined
    ascending doc_id string."""
    from .sources.tables import salted_partitions, table_rows

    if num_buckets is None:
        num_buckets = salted_partitions(
            table_rows(sf_dir, "documents"), target_rows=INDEX_BUCKET_DOCS
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        parent = pc.list_parent_indices(tok_lists)
        doc = pc.take(batch.column("doc_id").combine_chunks(), parent)
        pairs = pa.Table.from_arrays(
            [doc, tok_lists.flatten()], names=["doc_id", "term"]
        )
        distinct = pairs.group_by(["doc_id", "term"], use_threads=False).aggregate([])
        # doc_id % B == bit-and for power-of-two B and non-negative ids
        bucket = pc.bit_wise_and(distinct.column("doc_id"), num_buckets - 1)
        return distinct.append_column("bucket", bucket)

    empty_out = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "bucket": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "postings": pa.array([], type=pa.string()),
        }
    )

    def assemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty_out
        g = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        t = pa.Table.from_arrays(
            [g.column("term"), pc.cast(g.column("doc_id"), pa.string())],
            names=["term", "doc_str"],
        )
        # hash_list aggregates in encounter order, so pre-sorted input
        # yields ascending per-term lists
        agg = t.group_by(["term"], use_threads=False).aggregate(
            [("doc_str", "list"), ([], "count_all")]
        )
        assert agg.column_names[0] == "term", agg.column_names
        return pa.Table.from_arrays(
            [
                agg.column(0),
                pa.array(
                    np.full(agg.num_rows, group.column("bucket")[0].as_py()),
                    type=pa.int64(),
                ),
                pc.cast(agg.column(2), pa.int64()),
                pc.binary_join(agg.column(1), ","),
            ],
            names=["term", "bucket", "n_docs", "postings"],
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(assemble, batch_format="pyarrow")
    )


def corpus_skew_report(sf_dir: str, key_columns=("source", "lang")):
    """Key-skew diagnostics for shuffle planning: per candidate partition
    column, the key cardinality, the hottest key's share of rows, and the
    Gini coefficient of the key-count distribution — the report an
    operator reads BEFORE keying a 100 TB shuffle on a column (a 0.9-Gini
    column needs the skew join / salting path, see ``functions/joins.py``).

    Scale shape: per column, one partial-count exchange (grouped_agg —
    the exchange carries one row per (key, block)); the driver then folds
    the ≤|keys| (key, count) rows — bounded by the column's cardinality,
    the same bound the diagnostics themselves report (a 10M-domain corpus
    folds 10M int pairs: ~160 MB, one numpy sort).  Gini uses the exact
    rank formula 2·Σ(rank·cnt)/(n·total) − (n+1)/n over ascending counts
    (tie-order-insensitive), mirrored float-op-for-float-op in SQL."""
    rows = []
    for col in key_columns:
        counts = grouped_agg(
            read_table(sf_dir, "documents", columns=[col]),
            [col],
            [(None, "count", "cnt")],
        ).to_pandas()
        c = np.sort(counts["cnt"].to_numpy().astype(np.int64))
        n, tot = len(c), int(c.sum())
        s = int((np.arange(1, n + 1, dtype=np.int64) * c).sum())
        rows.append(
            {
                "key_column": col,
                "n_keys": n,
                "total": tot,
                "top_share": float(sql_round(np.array([c[-1] / tot]), 4)[0]),
                "gini": float(
                    sql_round(np.array([2.0 * s / (n * float(tot)) - (n + 1.0) / n]), 4)[0]
                ),
            }
        )
    return pd.DataFrame(rows)


CORPUS_SKEW_REPORT_SQL = """
WITH sc AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn
  FROM (SELECT count(*) AS cnt FROM documents GROUP BY source)
),
lc AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn
  FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)
)
SELECT 'source' AS key_column,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 4) AS top_share,
       round(2.0 * sum(rn * cnt) / (count(*) * CAST(sum(cnt) AS DOUBLE))
             - (count(*) + 1.0) / count(*), 4) AS gini
FROM sc
UNION ALL
SELECT 'lang', CAST(count(*) AS BIGINT), CAST(sum(cnt) AS BIGINT),
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 4),
       round(2.0 * sum(rn * cnt) / (count(*) * CAST(sum(cnt) AS DOUBLE))
             - (count(*) + 1.0) / count(*), 4)
FROM lc
"""


CORPUS_INVERTED_INDEX_SQL = f"""
WITH nb AS (
  SELECT CAST(POWER(2, CEIL(LOG2(GREATEST(64,
              CEIL(count(*) / {float(INDEX_BUCKET_DOCS)}))))) AS BIGINT) AS b
  FROM documents
),
dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
)
SELECT term,
       CAST(doc_id % (SELECT b FROM nb) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM dt
GROUP BY term, bucket
"""


def embedding_pca(sf_dir: str):
    """Distributed PCA projection of the embeddings table to 8 components
    (see ``functions.ann.pca_project``).  Rows-only: an eigendecomposition
    is not SQL-expressible; the operator is pinned by isometry (full-rank
    pairwise-distance preservation), variance-ordering, diagonal-projected-
    covariance, and determinism tests in tests/test_dedup_ann.py."""
    from .functions.ann import pca_project

    return pca_project(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        n_components=8,
    )


def dedup_semantic(sf_dir: str):
    """SemDeDup semantic near-dedup over the embeddings table (see
    ``functions.dedup.semantic_dedup``).  Rows-only: k-means clustering is
    not SQL-expressible; the operator is pinned by planted-duplicate and
    keep-first-policy tests in tests/test_dedup_ann.py."""
    from .functions.dedup import semantic_dedup
    from .sources.tables import table_rows

    # cluster count grows with the corpus so the per-cluster O(n²) kernel
    # stays bounded (~2k expected rows/cluster), floored at 16 for small
    # inputs — the same footer-metadata sizing trick as the join gate
    n_rows = table_rows(sf_dir, "embeddings")
    return semantic_dedup(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        n_clusters=max(16, n_rows // 2000),
        eps=0.1,
    )


def corpus_bpe_train(sf_dir: str, num_merges: int = 10):
    """Distributed BPE tokenizer training: learn the first ``num_merges``
    merges over the documents table (see ``functions.bpe.bpe_train`` for the
    scale shape: one corpus exchange to the word-frequency table, then
    vocabulary-bounded pair-count folds per merge).  Rows-only: the
    iterative argmax is not SQL-expressible; pinned by forced-gate equality
    (distributed path ≡ driver path ≡ hand-rolled classic BPE) and a
    first-merge ground-truth test in tests/test_components.py."""
    from .functions.bpe import bpe_train

    return bpe_train(
        read_table(sf_dir, "documents", columns=["text"]), num_merges=num_merges
    )


def corpus_bpe_apply(sf_dir: str, num_merges: int = 10):
    """Tokenize the corpus with the merge table ``corpus_bpe_train`` learns
    — the train → broadcast → apply half of tokenizer deployment (see
    ``functions.bpe.bpe_apply``: the M-row merge table ships in the task
    closure, a per-worker distinct-word memo makes encode cost
    vocabulary-bounded, and per-word token counts broadcast back by
    ``index_in``).  Rows-only
    (merge learning is iterative); pinned by a pure-Python per-document
    encode differential in tests/test_components.py."""
    from .functions.bpe import bpe_apply, bpe_train

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(read_table(sf_dir, "documents", columns=["text"]),
                       num_merges=num_merges)
    return bpe_apply(docs, merges)


def corpus_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary-growth audit — distinct-word count of each
    corpus prefix (first ⌈f·N⌉ documents in doc_id order, f ∈ {⅛, ¼, ½, 1}),
    the companion diagnostic to ``corpus_zipf_slope`` (sub-linear growth is
    what the law predicts; a kink signals a source boundary or dedup bug).

    Scale shape: ONE word-keyed exchange.  Each batch pre-reduces to
    (word, min doc_id) with Arrow C group-by; the exchange min-folds those
    per word; each result block then collapses to |thresholds| ints (words
    first seen below each prefix cut) and the driver folds
    blocks × |thresholds| rows.  Thresholds come from the parquet footer
    row count — no driver-side scan."""
    import math

    from ray.data.aggregate import Min

    from .sources.tables import table_rows

    n_docs = table_rows(sf_dir, "documents")
    thresholds = sorted({int(math.ceil(f * n_docs)) for f in (0.125, 0.25, 0.5, 1.0)})
    thr = np.asarray(thresholds, dtype=np.int64)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def first_seen_partial(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        toks = tok_lists.flatten()
        docs = pc.take(batch.column("doc_id"), pc.list_parent_indices(tok_lists))
        t = pa.Table.from_arrays([toks, docs], names=["word", "first_doc"])
        out = t.group_by(["word"], use_threads=False).aggregate([("first_doc", "min")])
        return out.rename_columns(["word", "first_doc"])

    def bucket_counts(batch: pa.Table) -> pa.Table:
        fd = batch.column("first_doc").to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = (fd[None, :] < thr[:, None]).sum(axis=1).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(thr), pa.array(vocab)], names=["prefix_docs", "vocab"]
        )

    partials = (
        ds.map_batches(first_seen_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Min("first_doc", alias_name="first_doc"))
        .map_batches(bucket_counts, batch_format="pyarrow")
        .to_pandas()
    )
    out = partials.groupby("prefix_docs", as_index=False)["vocab"].sum()
    return out.sort_values("prefix_docs", ignore_index=True)


CORPUS_VOCAB_GROWTH_SQL = """
WITH n AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT word, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
t AS (
  SELECT DISTINCT CAST(ceil(u.f * n.n) AS BIGINT) AS prefix_docs
  FROM n, unnest([0.125, 0.25, 0.5, 1.0]) AS u(f)
)
SELECT t.prefix_docs, CAST(count(w.word) AS BIGINT) AS vocab
FROM t LEFT JOIN w ON w.first_doc < t.prefix_docs
GROUP BY t.prefix_docs ORDER BY t.prefix_docs
"""


def source_overlap_jaccard(sf_dir: str, num_partitions: int = None):
    """Source-pair vocabulary overlap — exact Jaccard similarity between
    every pair of sources' distinct-token sets, the corpus-level companion
    to the per-document dedup family: a high-overlap source pair signals
    mirrored / re-crawled content worth a targeted near-dup pass, and the
    matrix is the evidence behind mixture decisions (``doc_mixture_resample``
    weights overlapping sources down).

    Scale shape: one word-keyed salted exchange.  Each batch pre-reduces to
    distinct (word, source) pairs in Arrow C; words hash-salt into P coarse
    partitions (``token_hash64`` per batch-distinct word — the
    ``window_hashes`` dictionary-encode trick), so a word's rows meet in
    exactly ONE partition and partition-local distinct is globally distinct.
    In-partition the pair counts come from one incidence matmul
    (|words| × |sources| 0/1 matrix, MᵀM), and each partition emits only
    S(S+1)/2 partial count rows — the driver folds P × 210 ints for 20
    sources, corpus-size-independent.  The S² pair matrix bounds the
    operator to modest source counts (≲10³ — the usual scale of crawl
    provenance labels); a 10⁶-domain breakdown needs the LSH near-dup
    family instead, which never enumerates pairs."""
    from .functions.textstats import token_hash64
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(
            table_rows(sf_dir, "documents"), target_rows=PACK_TARGET_DOCS
        )

    ds = read_table(sf_dir, "documents", columns=["text", "source"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        parent = pc.list_parent_indices(tok_lists)
        src = pc.take(batch.column("source").combine_chunks(), parent)
        pairs = pa.Table.from_arrays(
            [tok_lists.flatten(), src], names=["word", "source"]
        )
        distinct = pairs.group_by(["word", "source"], use_threads=False).aggregate([])
        w = distinct.column("word").combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.chunk(0) if w.num_chunks else pa.array([], type=pa.string())
        enc = w.dictionary_encode()
        vocab_part = np.fromiter(
            (token_hash64(t) % num_partitions for t in enc.dictionary.to_pylist()),
            np.int64,
            len(enc.dictionary),
        )
        part = (
            vocab_part[enc.indices.to_numpy()]
            if len(enc)
            else np.empty(0, dtype=np.int64)
        )
        return distinct.append_column("part", pa.array(part, type=pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "source_a": pd.Series([], dtype=object),
                "source_b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        # cross-batch (word, source) duplicates collapse here; the word's
        # rows are all in this partition, so this distinct is global
        g = g.drop_duplicates(["word", "source"])
        suniq, scodes = np.unique(g["source"].to_numpy(), return_inverse=True)
        _, wcodes = np.unique(g["word"].to_numpy(), return_inverse=True)
        n_words, n_src = wcodes.max() + 1, len(suniq)
        m = np.zeros((n_words, n_src), dtype=np.int64)
        m[wcodes, scodes] = 1
        counts = m.T @ m
        iu, ju = np.triu_indices(n_src)
        return pd.DataFrame(
            {
                "source_a": suniq[iu],
                "source_b": suniq[ju],
                "n": counts[iu, ju].astype(np.int64),
            }
        )

    parts = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["source_a", "source_b"], as_index=False)["n"].sum()
    sizes = agg[agg["source_a"] == agg["source_b"]].set_index("source_a")["n"]
    pr = agg[(agg["source_a"] != agg["source_b"]) & (agg["n"] > 0)].copy()
    n_union = (
        sizes.loc[pr["source_a"]].to_numpy()
        + sizes.loc[pr["source_b"]].to_numpy()
        - pr["n"].to_numpy()
    )
    return pd.DataFrame(
        {
            "source_a": pr["source_a"].to_numpy(),
            "source_b": pr["source_b"].to_numpy(),
            "n_common": pr["n"].to_numpy().astype(np.int64),
            "n_union": n_union.astype(np.int64),
            "jaccard": sql_round(pr["n"].to_numpy() / n_union.astype(np.float64), 6),
        }
    )


DSIR_BUCKETS = 64

# per-WORKER token→bucket memo (module-level, same vocabulary-bounded
# pattern as the BPE apply memo): the md5 is the one Python-loop cost in
# the DSIR passes and a corpus token recurs in nearly every batch
_DSIR_BUCKET_MEMO: Dict[str, int] = {}


def _dsir_bucket(tok: str) -> int:
    b = _DSIR_BUCKET_MEMO.get(tok)
    if b is None:
        import hashlib

        b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % DSIR_BUCKETS
        _DSIR_BUCKET_MEMO[tok] = b
    return b


def doc_dsir_weights(sf_dir: str, target_lang: str = "en"):
    """DSIR-style importance weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*): score every document by
    log p_target(x) − log p_raw(x) under two add-one-smoothed bag-of-
    hashed-unigram models — the target model fit on the in-corpus target
    slice (``lang = target_lang``), the raw model on the whole corpus.
    Positive log-ratio ⇒ more target-like than the corpus average ⇒
    selected.

    The feature hash is md5-derived (``int(md5(w)[:8], 16) % 64``) so the
    oracle reproduces it bucket-for-bucket in SQL (DuckDB ``md5`` + hex
    arithmetic on the last two nibbles — 16² ≡ 0 mod 64 so only they
    matter); one md5 per batch-distinct token via dictionary-encode.

    Scale shape: two streaming passes.  Pass 1 folds 64-int bucket-count
    partials per block (raw + target in the same pass) into the two
    models; λ = ln θ_t − ln θ_r (64 floats) broadcasts in the task
    closure.  Pass 2 scores map-side: per-doc bucket counts via
    ``np.add.at`` then one (docs × 64) @ 64 matmul.  Nothing corpus-sized
    ever reaches the driver."""
    m = DSIR_BUCKETS
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _buckets(batch: pa.Table):
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tok_lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
        enc = tok_lists.flatten().dictionary_encode()
        vocab_b = np.fromiter(
            (_dsir_bucket(t) for t in enc.dictionary.to_pylist()),
            np.int64,
            len(enc.dictionary),
        )
        b = vocab_b[enc.indices.to_numpy()] if len(enc) else np.empty(0, np.int64)
        return b, pc.list_parent_indices(tok_lists).to_numpy()

    def count_partial(batch: pa.Table) -> pa.Table:
        b, parent = _buckets(batch)
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        is_t = pc.equal(lang, target_lang).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": np.arange(m, dtype=np.int64),
                "raw": np.bincount(b, minlength=m).astype(np.int64),
                "tgt": np.bincount(b[is_t[parent]], minlength=m).astype(np.int64),
            }
        )

    agg = grouped_agg(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["b"],
        [("raw", "sum", "raw"), ("tgt", "sum", "tgt")],
        max_groups=m,  # fixed DSIR bucket count (gated inside grouped_agg)
    ).to_pandas()
    cr = np.zeros(m, dtype=np.float64)
    ct = np.zeros(m, dtype=np.float64)
    cr[agg["b"].to_numpy()] = agg["raw"].to_numpy().astype(np.float64)
    ct[agg["b"].to_numpy()] = agg["tgt"].to_numpy().astype(np.float64)
    tr, tt = float(cr.sum()), float(ct.sum())
    # mirror the oracle float-op-for-float-op: ln((c+1)/(T+m)) both sides
    lam = np.log((ct + 1.0) / (tt + m)) - np.log((cr + 1.0) / (tr + m))

    def score(batch: pa.Table) -> pa.Table:
        b, parent = _buckets(batch)
        cnt = np.zeros((batch.num_rows, m), dtype=np.float64)
        np.add.at(cnt, (parent, b), 1.0)
        s = sql_round(cnt @ lam, 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "dsir_logratio": s,
                "selected": s > 0,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


DOC_DSIR_SQL = """
WITH tok AS (
  SELECT doc_id, lang,
         ((strpos('0123456789abcdef', substr(md5(word), 7, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(md5(word), 8, 1)) - 1) % 64 AS b
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        FROM documents)
),
raw AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY b),
tgt AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM tok WHERE lang = 'en'
        GROUP BY b),
tot AS (SELECT (SELECT sum(c) FROM raw) AS tr, (SELECT sum(c) FROM tgt) AS tt),
lam AS (
  SELECT r.b,
         ln((COALESCE(t.c, 0) + 1) / (tot.tt + 64))
           - ln((r.c + 1) / (tot.tr + 64)) AS l
  FROM raw r LEFT JOIN tgt t ON t.b = r.b, tot
),
dc AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS c FROM tok
       GROUP BY doc_id, b)
SELECT dc.doc_id,
       round(sum(dc.c * lam.l), 6) AS dsir_logratio,
       round(sum(dc.c * lam.l), 6) > 0 AS selected
FROM dc JOIN lam ON lam.b = dc.b
GROUP BY dc.doc_id
"""


SOURCE_OVERLAP_SQL = """
WITH tok AS (
  SELECT DISTINCT source, word FROM (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
),
sizes AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
pr AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM tok a JOIN tok b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(na.n + nb.n - n_common AS BIGINT) AS n_union,
       round(n_common / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
FROM pr
JOIN sizes na ON na.source = pr.source_a
JOIN sizes nb ON nb.source = pr.source_b
"""


def _session_bigram_frame(sf_dir: str, gap_minutes: int = 30,
                          num_partitions: int = None) -> pd.DataFrame:
    """(prev_type, next_type, n) counts of consecutive in-session event
    pairs — ONE salted user-partition exchange (the ``events_sessionize``
    shape) shared by ``events_session_bigrams`` and
    ``events_session_markov``.  A user's whole event stream lands in one
    coarse partition, the in-group pass is one sort + one shifted
    comparison (fully vectorized), and each partition emits at most
    |event_type|^2 = 25 partial rows, so the final fold is a driver-side
    integer sum over P*25 rows (exact — derivations fold before any float
    math).  Tie-break on event_id makes the sequence deterministic even
    under equal timestamps (the oracles order BY ts, event_id too)."""
    from .sources.tables import salted_partitions, table_rows

    if num_partitions is None:
        num_partitions = salted_partitions(table_rows(sf_dir, "events"))
    P = num_partitions

    def compute() -> pd.DataFrame:
        ds = read_table(sf_dir, "events",
                        columns=["user_id", "ts", "event_type", "event_id"])

        def add_part(batch: pa.Table) -> pa.Table:
            part = pc.cast(
                pc.bit_wise_and(batch.column("user_id"), P - 1), pa.int32()
            )
            return batch.append_column("part", part)

        gap_ns = np.timedelta64(gap_minutes * 60 * 1_000_000_000, "ns")
        empty = pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                              "next_type": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64")})

        def bigrams_part(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
            uid = g["user_id"].to_numpy()
            if len(uid) < 2:
                return empty
            ts = g["ts"].to_numpy(dtype="datetime64[ns]")
            et = g["event_type"].to_numpy()
            keep = (uid[1:] == uid[:-1]) & ((ts[1:] - ts[:-1]) <= gap_ns)
            if not keep.any():
                return empty
            return (
                pd.DataFrame({"prev_type": et[:-1][keep],
                              "next_type": et[1:][keep]})
                .groupby(["prev_type", "next_type"], as_index=False)
                .agg(n=("prev_type", "size"))
            )

        partials = (
            ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: bigrams_part(g.drop(columns=["part"])),
                batch_format="pandas",
            )
        ).to_pandas()  # bounded: <= P * |event_type|^2 partial rows
        return partials.groupby(
            ["prev_type", "next_type"], as_index=False
        ).agg(n=("n", "sum"))

    return _cached_frame(
        f"session_bigrams_g{gap_minutes}_p{P}", sf_dir, "events", compute
    )


def events_session_bigrams(sf_dir: str, gap_minutes: int = 30,
                           num_partitions: int = None):
    """Sequence mining within sessions: consecutive event-type bigram
    counts.  Derives from the shared ``_session_bigram_frame`` execution
    (one exchange per family per corpus; ``events_session_markov`` is the
    sibling)."""
    f = _session_bigram_frame(sf_dir, gap_minutes, num_partitions)
    out = pd.DataFrame(
        {"bigram": f["prev_type"] + "->" + f["next_type"], "n": f["n"]}
    )
    return out.sort_values("bigram", ignore_index=True)


EVENTS_SESSION_BIGRAMS_SQL = """
SELECT prev_type || '->' || event_type AS bigram, count(*) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS gap
  FROM events
) t
WHERE prev_type IS NOT NULL AND gap <= INTERVAL 30 MINUTE
GROUP BY 1
"""


def events_session_markov(sf_dir: str):
    """First-order Markov transition matrix of in-session event types:
    P(next | prev) row-normalized from the shared bigram frame — zero
    additional executions after any sibling ran this session.  Division
    happens AFTER the exact integer fold (float op order mirrors the
    oracle: n / per-prev total, rounded to 6)."""
    f = _session_bigram_frame(sf_dir).copy()
    totals = f.groupby("prev_type")["n"].transform("sum")
    f["p"] = sql_round(
        f["n"].to_numpy().astype(np.float64)
        / totals.to_numpy().astype(np.float64),
        6,
    )
    return f.sort_values(["prev_type", "next_type"], ignore_index=True)


EVENTS_SESSION_MARKOV_SQL = """
WITH bg AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type,
           ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS gap
    FROM events
  ) t
  WHERE prev_type IS NOT NULL AND gap <= INTERVAL 30 MINUTE
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
FROM bg
"""


def part_name_edit1_pairs(sf_dir: str):
    """String-similarity self-join: all pairs of distinct part names at
    Levenshtein distance exactly 1, weighted by occurrence-count product.
    The oracle is the O(|vocab|^2) all-pairs levenshtein join; the engine
    uses deletion-neighborhood blocking (``functions/simjoin.py``) — one
    vocabulary-scaled grouped count, one key-salted exchange of (key, name)
    rows, exact O(len) verification inside neighborhood-sized groups.  At
    100 TB the cost scales with distinct-name vocabulary and true-pair
    output, never with corpus rows or vocab^2."""
    from .functions.simjoin import edit1_pairs
    from .sources.tables import salted_partitions, table_rows

    ds = read_table(sf_dir, "part", columns=["p_name"])
    names = grouped_agg(
        ds,
        ["p_name"],
        [(None, "count", "n")],
        salt_key="p_name",
        salt_hash=True,
        salt_partitions=salted_partitions(
            table_rows(sf_dir, "part"), floor=16
        ),
    )
    return edit1_pairs(
        names,
        name_col="p_name",
        count_col="n",
        # footer rows upper-bound the distinct-name vocabulary; simjoin
        # derives its exchange P from the ~32× deletion-key fan-out
        source_rows=table_rows(sf_dir, "part"),
    )


PART_NAME_EDIT1_SQL = """
WITH names AS (SELECT p_name, count(*) AS n FROM part GROUP BY p_name)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(a.n * b.n AS BIGINT) AS n_pairs
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) = 1
"""


# exact-kNN broadcast bound: 10M × 64-dim float64 ≈ 5 GB per worker heap —
# the last size where shipping the whole matrix beats cluster-local joins
KNN_BROADCAST_MAX_ROWS = 10_000_000


def _knn_broadcast_plan(ds, ids: np.ndarray, mat: np.ndarray, k: int):
    """The exact-kNN broadcast kernel over a candidate set: broadcast the
    normalized (N, d) candidate matrix once (``ray.put`` + per-worker
    cache); each block of ``ds`` answers its OWN rows completely with one
    (n, d)·(d, N) matmul — no reduce, linear N·k output.  Top-k per row is
    fully vectorized: (rounded score, id) packed into ONE int64 composite
    key (score·10⁵ in the high 32 bits, bit-inverted id in the low) so
    ``argpartition`` + ``argsort`` give the SQL total order (score DESC,
    nbr ASC) with no per-row Python and exact 5-dp boundary ties.

    Loud precondition checks (not silent corruption): the composite key
    assumes 0 ≤ vec_id < 2³² (an out-of-range id would overflow into the
    score bits and corrupt neighbor order) and k < N (argpartition would
    raise an opaque kth-out-of-bounds otherwise)."""
    import ray

    from .functions.ann import embedding_matrix
    from .functions.broadcast import get_cached

    if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= (1 << 32)):
        raise ValueError(
            "embedding_knn_join requires 0 <= vec_id < 2^32 (composite-key "
            f"packing); got range [{ids.min()}, {ids.max()}]"
        )
    if k >= len(ids):
        raise ValueError(
            f"k={k} needs at least k+1 candidate vectors (self excluded); "
            f"candidate set has {len(ids)}"
        )
    ref = ray.put((ids, mat))
    # self-mask sentinel: i64min would OVERFLOW under the -key negation
    # below (-i64min == i64min, flipping the self entry into the best
    # candidate); i64min+1 negates to i64max = provably-worst
    self_key = np.iinfo(np.int64).min + 1

    def knn(batch: pa.Table) -> pa.Table:
        cids, cmat = get_cached(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bmat = embedding_matrix(batch.column("embedding"))
        bmat = bmat / np.maximum(
            np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12
        )
        scores = sql_round(bmat @ cmat.T, 5)  # (n, N), rounded once
        key = (
            np.rint(scores * 1e5).astype(np.int64) * (1 << 32)
            + ((1 << 32) - 1 - cids)
        )
        key[cids[None, :] == bids[:, None]] = self_key  # exclude self
        top = np.argpartition(-key, k - 1, axis=1)[:, :k]
        topkey = np.take_along_axis(key, top, axis=1)
        order = np.argsort(-topkey, axis=1, kind="stable")
        top = np.take_along_axis(top, order, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(bids, k)),
                "nbr": pa.array(cids[top.ravel()]),
                "score": pa.array(
                    np.take_along_axis(scores, top, axis=1).ravel()
                ),
            }
        )

    return ds.map_batches(knn, batch_format="pyarrow", batch_size=1024)


def embedding_knn_join(sf_dir: str, k: int = 3):
    """Exact/approximate k-NN SELF-join: every vector's k nearest neighbors
    by cosine (self excluded) — the all-rows-are-queries primitive under
    SemDeDup / embedding near-dup clustering, where the LSH pair generators
    trade exactness for scale.  The oracle is the O(N²) cross join.

    Size-gated plan (same doctrine as ``functions/joins.py``):

    * ``rows ≤ KNN_BROADCAST_MAX_ROWS`` — EXACT broadcast plan
      (``_knn_broadcast_plan`` over the whole table).  The broadcast matrix
      is the gate: it holds to ~10⁷×10³ dims (8 GB) per worker.
    * past the gate — AUTO-ROUTED through the IVF partition layout: train a
      coarse quantizer on a bounded sample, materialize the corpus ONCE as
      ``cluster=N/`` partitioned parquet (``IVFIndex.write_index``), then
      run the exact broadcast kernel WITHIN each cluster directory and
      union the per-partition answers.  Each partition's candidate matrix
      is ~rows/n_clusters — sized back under the broadcast bound — and the
      partitioned read touches each vector exactly once.  This trades
      exactness only where a true neighbor lands across a centroid
      boundary (nprobe=1 locality); recall vs the exact plan is pinned by
      test, the same guarantee shape as ``ann_ivf_topk``."""
    from .functions.ann import embedding_matrix
    from .sources.tables import table_rows

    rows = table_rows(sf_dir, "embeddings")
    if rows is not None and rows > KNN_BROADCAST_MAX_ROWS:
        return _knn_ivf_partitioned(sf_dir, k, rows)
    tbl = read_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = embedding_matrix(tbl.column("embedding"))
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return _knn_broadcast_plan(ds, ids, mat, k)


def _knn_ivf_partitioned(sf_dir: str, k: int, rows: int):
    """The past-the-gate kNN plan: IVF cluster partitioning → per-partition
    exact broadcast self-join → union.  Partition count is sized so each
    cluster's candidate matrix sits comfortably under the broadcast bound
    (target rows/cluster = gate/4, floor 256 so a forced-gate test at tiny
    scale still exercises a genuinely partitioned plan)."""
    import glob
    import os
    import tempfile

    import pyarrow.parquet as pq
    import ray.data

    from .functions.ann import IVFIndex, embedding_matrix

    per_cluster_target = max(256, KNN_BROADCAST_MAX_ROWS // 4)
    n_clusters = max(2, min(4096, -(-rows // per_cluster_target)))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    idx = IVFIndex.train(ds, n_clusters=n_clusters)
    index_dir = tempfile.mkdtemp(prefix="knn_ivf_", dir="/tmp")
    idx.write_index(ds, index_dir)

    out = None
    for cdir in sorted(glob.glob(os.path.join(index_dir, "cluster=*"))):
        files = sorted(glob.glob(os.path.join(cdir, "*.parquet")))
        # cluster candidate set: bounded to ~per_cluster_target rows by
        # construction — the same driver-side footprint class as the
        # under-gate broadcast, per partition instead of per corpus
        ctbl = pa.concat_tables(
            [pq.read_table(f, columns=["vec_id", "embedding"]) for f in files]
        )
        cids = ctbl.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(cids) < 2:
            continue  # a 1-vector cluster has no non-self neighbor
        cmat = embedding_matrix(ctbl.column("embedding"))
        cmat = cmat / np.maximum(
            np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12
        )
        cds = ray.data.read_parquet(files, columns=["vec_id", "embedding"])
        part = _knn_broadcast_plan(cds, cids, cmat, min(k, len(cids) - 1))
        out = part if out is None else out.union(part)
    if out is None:
        raise ValueError("embeddings table has no cluster with >= 2 vectors")
    return out


EMBEDDING_KNN_SQL = """
WITH sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 5) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
SELECT vec_id, nbr, score FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY score DESC, nbr) AS rn
  FROM sims
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: Dict[str, Callable] = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_order_priority": q4_order_priority,
    "customers_without_orders": customers_without_orders,
    "doc_embedding_join": doc_embedding_join,
    "parts_price_band_join": parts_price_band_join,
    "approx_distinct_orders": approx_distinct_orders,
    "orders_priority_counts": orders_priority_counts,
    "customer_nation_rollup": customer_nation_rollup,
    "top_parts_by_retail": top_parts_by_retail,
    "distinct_segments": distinct_segments,
    "events_hourly": events_hourly,
    "events_type_stats": events_type_stats,
    "events_sessionize": events_sessionize,
    "events_session_bigrams": events_session_bigrams,
    "part_name_edit1_pairs": part_name_edit1_pairs,
    "embedding_knn_join": embedding_knn_join,
    "events_session_markov": events_session_markov,
    "lineitem_table_profile": lineitem_table_profile,
    "events_daily_top_user": events_daily_top_user,
    "events_hourly_moving_avg": events_hourly_moving_avg,
    "events_asof_attribution": events_asof_attribution,
    "doc_sample_hash": doc_sample_hash,
    "doc_token_stats": doc_token_stats,
    "doc_bpe_tokens": doc_bpe_tokens,
    "doc_term_freq": doc_term_freq,
    "lang_counts": lang_counts,
    "top_sources_by_chars": top_sources_by_chars,
    "dedup_exact_docs": dedup_exact_docs,
    "extract_docs": extract_docs,
    "doc_lang_id": doc_lang_id,
    "doc_quality": doc_quality,
    "doc_fingerprints": doc_fingerprints,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embeddings": dedup_embeddings,
    "ann_topk": ann_topk,
    "ann_filtered_topk": ann_filtered_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_norms": embedding_norms,
    "html_main_content": html_main_content,
    "dedup_ngram_verify": dedup_ngram_verify,
    "media_image_features": media_image_features,
    "media_audio_features": media_audio_features,
    "media_video_frames": media_video_frames,
    "extract_rollup_by_strategy": extract_rollup_by_strategy,
    "span_roundtrip_stats": span_roundtrip_stats,
    "doc_media_captions": doc_media_captions,
    "extract_media_captions": extract_media_captions,
    "extract_pdf_bytes": extract_pdf_bytes,
    "extract_pdf_media_assets": extract_pdf_media_assets,
    "extract_pdf_caption_pairs": extract_pdf_caption_pairs,
    "extract_multi_source": extract_multi_source,
    "customer_yoy_outer": customer_yoy_outer,
    "events_type_distinct_approx": events_type_distinct_approx,
    "media_ref_fanout": media_ref_fanout,
    "doc_pack_interleaved": doc_pack_interleaved,
    "source_overlap_jaccard": source_overlap_jaccard,
    "doc_dsir_weights": doc_dsir_weights,
    "doc_chunk_interleaved": doc_chunk_interleaved,
    "doc_top_terms": doc_top_terms,
    "doc_pack_sequences": doc_pack_sequences,
    "customer_sample_per_segment": customer_sample_per_segment,
    "events_json_props": events_json_props,
    "doc_normalize_text": doc_normalize_text,
    "corpus_tfidf_top_terms": corpus_tfidf_top_terms,
    "doc_pii_scrub": doc_pii_scrub,
    "dedup_exact_keep": dedup_exact_keep,
    "doc_length_histogram": doc_length_histogram,
    "doc_top_bigrams": doc_top_bigrams,
    "doc_repetition_stats": doc_repetition_stats,
    "lang_top_docs": lang_top_docs,
    "doc_decontaminate": doc_decontaminate,
    "doc_length_quantiles": doc_length_quantiles,
    "customer_rollup_hierarchy": customer_rollup_hierarchy,
    "customer_order_distribution": customer_order_distribution,
    "events_user_running_total": events_user_running_total,
    "doc_lang_length_quantiles": doc_lang_length_quantiles,
    "orders_monthly_trend": orders_monthly_trend,
    "events_daily_type_pivot": events_daily_type_pivot,
    "orders_price_decile_counts": orders_price_decile_counts,
    "dedup_jaccard_pairs": dedup_jaccard_pairs,
    "dedup_cluster_docs": dedup_cluster_docs,
    "dedup_near_keep": dedup_near_keep,
    "events_type_share": events_type_share,
    "q7_nation_pair_volume": q7_nation_pair_volume,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_bracket_revenue": q19_bracket_revenue,
    "purchase_error_user_overlap": purchase_error_user_overlap,
    "doc_length_quantiles_cont": doc_length_quantiles_cont,
    "events_value_hour_corr": events_value_hour_corr,
    "corpus_heavy_hitters": corpus_heavy_hitters,
    "corpus_freq_bounds": corpus_freq_bounds,
    "lang_first_docs": lang_first_docs,
    "orders_weighted_sample": orders_weighted_sample,
    "events_cohort_retention": events_cohort_retention,
    "embedding_label_centroids": embedding_label_centroids,
    "q10_returned_items": q10_returned_items,
    "embedding_quantize_int8": embedding_quantize_int8,
    "dedup_streaming_index": dedup_streaming_index,
    "orders_price_quantiles_approx": orders_price_quantiles_approx,
    "doc_lm_score": doc_lm_score,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q8_market_share": q8_market_share,
    "doc_mixture_resample": doc_mixture_resample,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_lapsed_high_balance": q22_lapsed_high_balance,
    "q9_product_profit": q9_product_profit,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_priority_class_lines": q12_priority_class_lines,
    "q16_supplier_variety": q16_supplier_variety,
    "q20_potential_promotion": q20_potential_promotion,
    "doc_quality_filter": doc_quality_filter,
    "doc_fixed_k_sample": doc_fixed_k_sample,
    "doc_chunk_windows": doc_chunk_windows,
    "events_funnel_counts": events_funnel_counts,
    "dedup_exact_keep_best": dedup_exact_keep_best,
    "doc_quality_pct_rank": doc_quality_pct_rank,
    "nation_party_mix": nation_party_mix,
    "ann_multi_topk": ann_multi_topk,
    "corpus_build_pipeline": corpus_build_pipeline,
    "lang_confusion_matrix": lang_confusion_matrix,
    "doc_source_quality_gate": doc_source_quality_gate,
    "cross_source_leakage": cross_source_leakage,
    "corpus_zipf_slope": corpus_zipf_slope,
    "dedup_repeated_windows": dedup_repeated_windows,
    "dedup_substring_cut": dedup_substring_cut,
    "dedup_substring_cut_keep_first": dedup_substring_cut_keep_first,
    "layout_reading_order": layout_reading_order,
    "doc_train_split": doc_train_split,
    "events_hourly_anomalies": events_hourly_anomalies,
    "doc_shuffle_shards": doc_shuffle_shards,
    "dedup_semantic": dedup_semantic,
    "doc_bm25_topk": doc_bm25_topk,
    "embedding_pca": embedding_pca,
    "source_token_budget": source_token_budget,
    "events_grouping_sets": events_grouping_sets,
    "corpus_inverted_index": corpus_inverted_index,
    "corpus_skew_report": corpus_skew_report,
    "corpus_bpe_train": corpus_bpe_train,
    "corpus_bpe_apply": corpus_bpe_apply,
    "corpus_vocab_growth": corpus_vocab_growth,
}

ORACLE_SQL: Dict[str, str] = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_revenue_orders": Q3_SQL,
    "q5_nation_revenue": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q4_order_priority": Q4_SQL,
    "customers_without_orders": CUSTOMERS_NO_ORDERS_SQL,
    "doc_embedding_join": DOC_EMB_JOIN_SQL,
    "parts_price_band_join": PARTS_BAND_SQL,
    # exact-path-gated (rows ≤ APPROX_DISTINCT_EXACT_CAP → sketch is exact);
    # the sketch path above the cap stays tolerance-asserted in pytest
    "approx_distinct_orders": APPROX_DISTINCT_SQL,
    "orders_priority_counts": ORDERS_PRIORITY_SQL,
    "customer_nation_rollup": CUSTOMER_NATION_SQL,
    "top_parts_by_retail": TOP_PARTS_SQL,
    "distinct_segments": DISTINCT_SEGMENTS_SQL,
    "events_hourly": EVENTS_HOURLY_SQL,
    "events_type_stats": EVENTS_TYPE_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_session_bigrams": EVENTS_SESSION_BIGRAMS_SQL,
    "part_name_edit1_pairs": PART_NAME_EDIT1_SQL,
    "embedding_knn_join": EMBEDDING_KNN_SQL,
    "events_session_markov": EVENTS_SESSION_MARKOV_SQL,
    "lineitem_table_profile": LINEITEM_PROFILE_SQL,
    "events_daily_top_user": EVENTS_DAILY_TOP_SQL,
    "events_hourly_moving_avg": EVENTS_MOVING_AVG_SQL,
    "events_asof_attribution": EVENTS_ASOF_SQL,
    "doc_sample_hash": DOC_SAMPLE_SQL,
    "doc_token_stats": DOC_TOKEN_SQL,
    "doc_term_freq": DOC_TERM_SQL,
    "lang_counts": LANG_COUNTS_SQL,
    "top_sources_by_chars": TOP_SOURCES_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "extract_docs": EXTRACT_DOCS_SQL,
    "ann_topk": ANN_TOPK_SQL,
    "ann_filtered_topk": ANN_FILTERED_TOPK_SQL,
    "embedding_norms": EMBEDDING_NORMS_SQL,
    "html_main_content": HTML_MAIN_SQL,
    "doc_bpe_tokens": DOC_BPE_SQL,
    "doc_lang_id": DOC_LANG_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "doc_top_terms": DOC_TOP_TERMS_SQL,
    "doc_pack_sequences": DOC_PACK_SQL,
    "customer_sample_per_segment": CUSTOMER_SAMPLE_SQL,
    "events_json_props": EVENTS_JSON_SQL,
    "doc_normalize_text": DOC_NORMALIZE_SQL,
    "span_roundtrip_stats": SPAN_ROUNDTRIP_SQL,
    "doc_media_captions": MEDIA_CAPTIONS_SQL,
    "media_ref_fanout": MEDIA_REF_FANOUT_SQL,
    "doc_pack_interleaved": DOC_PACK_INTERLEAVED_SQL,
    "source_overlap_jaccard": SOURCE_OVERLAP_SQL,
    "doc_dsir_weights": DOC_DSIR_SQL,
    "doc_chunk_interleaved": DOC_CHUNK_INTERLEAVED_SQL,
    "corpus_tfidf_top_terms": CORPUS_TFIDF_SQL,
    "doc_pii_scrub": DOC_PII_SQL,
    "dedup_exact_keep": DEDUP_KEEP_SQL,
    "doc_length_histogram": DOC_LENGTH_HIST_SQL,
    "doc_top_bigrams": DOC_TOP_BIGRAMS_SQL,
    "doc_repetition_stats": DOC_REPETITION_SQL,
    "lang_top_docs": LANG_TOP_DOCS_SQL,
    "doc_decontaminate": DECONTAM_SQL,
    "doc_length_quantiles": DOC_LENGTH_QUANTILES_SQL,
    "customer_rollup_hierarchy": CUSTOMER_ROLLUP_SQL,
    "customer_order_distribution": CUSTOMER_ORDER_DIST_SQL,
    "customer_yoy_outer": CUSTOMER_YOY_OUTER_SQL,
    "events_user_running_total": EVENTS_RUNNING_TOTAL_SQL,
    "doc_lang_length_quantiles": DOC_LANG_QUANTILES_SQL,
    "orders_monthly_trend": ORDERS_MONTHLY_TREND_SQL,
    "events_daily_type_pivot": EVENTS_PIVOT_SQL,
    "orders_price_decile_counts": ORDERS_DECILE_SQL,
    "dedup_jaccard_pairs": DEDUP_JACCARD_SQL,
    "dedup_cluster_docs": DEDUP_CLUSTER_SQL,
    "events_type_share": EVENTS_TYPE_SHARE_SQL,
    "q7_nation_pair_volume": Q7_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_bracket_revenue": Q19_SQL,
    "purchase_error_user_overlap": USER_OVERLAP_SQL,
    "doc_length_quantiles_cont": DOC_LENGTH_QUANTILES_CONT_SQL,
    "events_value_hour_corr": EVENTS_CORR_SQL,
    "lang_first_docs": LANG_FIRST_DOCS_SQL,
    "orders_weighted_sample": WEIGHTED_SAMPLE_SQL,
    "events_cohort_retention": EVENTS_COHORT_SQL,
    "embedding_label_centroids": EMBEDDING_CENTROIDS_SQL,
    "q10_returned_items": Q10_SQL,
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_SQL,
    "dedup_streaming_index": DEDUP_STREAMING_SQL,
    "doc_lm_score": DOC_LM_SCORE_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q8_market_share": Q8_SQL,
    "doc_mixture_resample": DOC_MIXTURE_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_lapsed_high_balance": Q22_SQL,
    "q9_product_profit": Q9_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_priority_class_lines": Q12_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q20_potential_promotion": Q20_SQL,
    "doc_quality_filter": DOC_QUALITY_FILTER_SQL,
    "doc_fixed_k_sample": DOC_FIXED_K_SAMPLE_SQL,
    "doc_chunk_windows": DOC_CHUNK_SQL,
    "events_funnel_counts": EVENTS_FUNNEL_SQL,
    "dedup_exact_keep_best": DEDUP_KEEP_BEST_SQL,
    "doc_quality_pct_rank": DOC_QUALITY_PCT_RANK_SQL,
    "nation_party_mix": NATION_PARTY_MIX_SQL,
    "ann_multi_topk": ANN_MULTI_TOPK_SQL,
    "corpus_build_pipeline": CORPUS_BUILD_SQL,
    "lang_confusion_matrix": LANG_CONFUSION_SQL,
    "doc_source_quality_gate": DOC_SOURCE_GATE_SQL,
    "cross_source_leakage": CROSS_SOURCE_LEAKAGE_SQL,
    "corpus_zipf_slope": CORPUS_ZIPF_SQL,
    "dedup_repeated_windows": DEDUP_REPEATED_WINDOWS_SQL,
    "dedup_substring_cut": DEDUP_SUBSTRING_CUT_SQL,
    "dedup_substring_cut_keep_first": DEDUP_SUBSTRING_CUT_KEEP_FIRST_SQL,
    "layout_reading_order": LAYOUT_READING_ORDER_SQL,
    "doc_train_split": DOC_TRAIN_SPLIT_SQL,
    "events_hourly_anomalies": EVENTS_HOURLY_ANOMALY_SQL,
    "doc_shuffle_shards": DOC_SHUFFLE_SQL,
    "doc_bm25_topk": DOC_BM25_SQL,
    "source_token_budget": SOURCE_TOKEN_BUDGET_SQL,
    "events_grouping_sets": EVENTS_GROUPING_SETS_SQL,
    "corpus_inverted_index": CORPUS_INVERTED_INDEX_SQL,
    "corpus_skew_report": CORPUS_SKEW_REPORT_SQL,
    "corpus_vocab_growth": CORPUS_VOCAB_GROWTH_SQL,
    # corpus_bpe_train: iterative merge-table learning → rows-only; pinned
    # by forced-gate path equality + first-merge ground truth in pytest
    # corpus_bpe_apply: encodes with the learned (iterative) merge table →
    # rows-only; pinned by pure-Python per-document encode differential
    # dedup_semantic: k-means cluster-then-pairwise (SemDeDup) → rows-only;
    # planted-dup recall + keep-first policy pinned in tests/test_dedup_ann.py
    # embedding_pca: eigendecomposition → rows-only; isometry/variance-order/
    # determinism pinned in tests/test_dedup_ann.py
    # corpus_heavy_hitters: Misra-Gries sketch (undercounted estimates by
    # design) → rows-only; the 2N/(k+1) guarantee is asserted in pytest
    # exact-path-gated (rows ≤ QUANTILES_EXACT_CAP → sample = population);
    # the sketch path above the cap stays rank-error-asserted in pytest
    "orders_price_quantiles_approx": ORDERS_QUANTILES_APPROX_SQL,
    # dedup_near_keep: MinHash-sketch keep list → rows-only; composition
    # pinned against union-find ground truth in tests/test_components.py
    # doc_fingerprints / dedup_minhash / dedup_simhash / dedup_embeddings /
    # dedup_ngram_verify / ann_ivf_topk / approx_distinct_orders / media_*:
    # not SQL-expressible → rows-only driver check (sketch/heuristic/
    # iterative/DOM/codec operators), each pinned by goldens or
    # recall/precision/tolerance tests in pytest
}
