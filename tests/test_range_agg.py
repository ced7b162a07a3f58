"""Range-partitioned (exchange-free) aggregation — functions/agg.py.

The plan's correctness rests on one claim: ``key_range_tasks`` never puts
the same key value in two different tasks.  These tests pin the claim's
edges (boundary-spanning keys, unsorted inputs, missing statistics), the
plan-vs-exchange output equality, and the query-level fallback when the
statistics can't prove the plan.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from b_pdf_parser_ray.functions.agg import (
    grouped_agg,
    key_range_tasks,
    range_partitioned_agg,
    range_partitioned_apply,
)

SF_DIR = "/root/testdata/sf0.001"


def _write(path, keys, vals, row_group_size=None, write_statistics=True):
    t = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.float64())})
    pq.write_table(
        t, path, row_group_size=row_group_size or len(keys),
        write_statistics=write_statistics,
    )
    return t


def _expected(keys, vals):
    return (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k", sort=True)["v"].sum().reset_index(name="s")
    )


def test_matches_exchange_plan_on_testdata(ray_session):
    p = os.path.join(SF_DIR, "lineitem.parquet")
    spec = (["l_orderkey"], [("l_quantity", "sum", "total_qty")])
    got = (
        range_partitioned_agg(p, *spec, columns=["l_orderkey", "l_quantity"])
        .to_pandas().sort_values("l_orderkey").reset_index(drop=True)
    )
    import ray.data

    exch = (
        grouped_agg(
            ray.data.read_parquet(p, columns=["l_orderkey", "l_quantity"]), *spec
        )
        .to_pandas().sort_values("l_orderkey").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exch)


def test_multi_row_group_sorted_splits_into_tasks(ray_session, tmp_path):
    keys = np.repeat(np.arange(200), 5)  # sorted, 1000 rows
    vals = np.arange(1000, dtype=np.float64)
    p = str(tmp_path / "sorted.parquet")
    _write(p, keys, vals, row_group_size=100)
    tasks = key_range_tasks(p, "k")
    assert tasks is not None and len(tasks) > 1
    got = (
        range_partitioned_agg(p, ["k"], [("v", "sum", "s")])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _expected(keys, vals))


def test_boundary_spanning_key_stays_in_one_task(ray_session, tmp_path):
    # key 9 spans row groups 0 and 1 (equal min/max boundary) — the groups
    # must merge into one task or its sum would split
    keys = np.array([0] * 5 + [9] * 10 + [20] * 5, dtype=np.int64)
    vals = np.ones(20, dtype=np.float64)
    p = str(tmp_path / "boundary.parquet")
    _write(p, keys, vals, row_group_size=10)
    tasks = key_range_tasks(p, "k")
    assert tasks is not None
    got = (
        range_partitioned_agg(p, ["k"], [("v", "sum", "s")])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got.loc[got["k"] == 9, "s"].item() == 10.0
    pd.testing.assert_frame_equal(got, _expected(keys, vals))


def test_unsorted_small_collapses_to_one_correct_task(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=400)
    vals = rng.random(400)
    p = str(tmp_path / "shuffled.parquet")
    _write(p, keys, vals, row_group_size=50)
    tasks = key_range_tasks(p, "k")
    assert tasks is not None and len(tasks) == 1  # overlap chains merge
    got = (
        range_partitioned_agg(p, ["k"], [("v", "sum", "s")])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _expected(keys, vals))


def test_unsorted_past_row_cap_returns_none(tmp_path):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=400)
    p = str(tmp_path / "big_shuffled.parquet")
    _write(p, keys, np.ones(400), row_group_size=50)
    assert key_range_tasks(p, "k", max_task_rows=100) is None
    assert (
        range_partitioned_agg(
            p, ["k"], [("v", "sum", "s")], max_task_rows=100
        )
        is None
    )


def test_missing_statistics_returns_none(tmp_path):
    p = str(tmp_path / "nostats.parquet")
    _write(p, np.arange(10), np.ones(10), write_statistics=False)
    assert key_range_tasks(p, "k") is None


def test_missing_key_column_returns_none():
    p = os.path.join(SF_DIR, "lineitem.parquet")
    assert key_range_tasks(p, "no_such_column") is None


def test_directory_of_fragments(ray_session, tmp_path):
    # production layout: one fragment per shard, ranges disjoint across files
    d = tmp_path / "frags"
    d.mkdir()
    _write(str(d / "a.parquet"), np.arange(0, 100), np.ones(100))
    _write(str(d / "b.parquet"), np.arange(100, 200), np.ones(100))
    tasks = key_range_tasks(str(d), "k")
    assert tasks is not None and len(tasks) == 2
    got = range_partitioned_agg(str(d), ["k"], [("v", "sum", "s")]).to_pandas()
    assert len(got) == 200 and (got["s"] == 1.0).all()


def test_mean_spec(ray_session, tmp_path):
    keys = np.repeat([1, 2], 4)
    vals = np.array([1.0, 2, 3, 4, 10, 20, 30, 40])
    p = str(tmp_path / "mean.parquet")
    _write(p, keys, vals)
    got = (
        range_partitioned_agg(p, ["k"], [("v", "mean", "m")])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["m"].tolist() == [2.5, 25.0]
    assert list(got.columns) == ["k", "m"]


def test_apply_sees_every_row_of_each_key(ray_session, tmp_path):
    # per-key row counts computed in-task must be globally exact — the
    # sibling-test precondition q21's range plan relies on
    keys = np.repeat(np.arange(50), 7)
    p = str(tmp_path / "apply.parquet")
    _write(p, keys, np.ones(350), row_group_size=70)

    def fn(t: pa.Table) -> pa.Table:
        out = t.group_by(["k"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["k", "n"])

    got = range_partitioned_apply(str(p), "k", fn).to_pandas()
    assert sorted(got["k"].tolist()) == list(range(50))
    assert (got["n"] == 7).all()


@pytest.mark.parametrize("qname", ["q18", "q3", "q21"])
def test_query_fallback_plan_equality(ray_session, monkeypatch, qname):
    """Force the statistics gate shut: the exchange fallback must produce
    the identical result the range plan does."""
    from b_pdf_parser_ray import queries
    from b_pdf_parser_ray.functions import agg as agg_mod

    fn = {
        "q18": queries.q18_large_orders,
        "q3": queries.q3_top_revenue_orders,
        "q21": queries.q21_waiting_suppliers,
    }[qname]
    fast = fn(SF_DIR).to_pandas()
    monkeypatch.setattr(agg_mod, "key_range_tasks", lambda *a, **k: None)
    slow = fn(SF_DIR).to_pandas()
    cols = sorted(fast.columns)
    fast = fast[cols].sort_values(cols).reset_index(drop=True)
    slow = slow[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


# ---------------------------------------------------------------------------
# Domain-bounded vector aggregation (column_min_max + summed_vector) and the
# dense-histogram decile plan built on them
# ---------------------------------------------------------------------------


def test_column_min_max_reads_footer_stats(tmp_path):
    from b_pdf_parser_ray.functions.agg import column_min_max

    p = str(tmp_path / "mm.parquet")
    _write(p, [5, 3, 9, 7], [1.0, 2.0, 3.0, 4.0], row_group_size=2)
    assert column_min_max(p, "k") == (3, 9)
    assert column_min_max(p, "v") == (1.0, 4.0)
    assert column_min_max(p, "missing") is None


def test_column_min_max_none_without_statistics(tmp_path):
    from b_pdf_parser_ray.functions.agg import column_min_max

    p = str(tmp_path / "nostat.parquet")
    _write(p, [1, 2], [1.0, 2.0], write_statistics=False)
    assert column_min_max(p, "k") is None


def test_summed_vector_sums_across_blocks(ray_session):
    import ray.data

    from b_pdf_parser_ray.functions.agg import summed_vector

    vals = np.arange(1000) % 7
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.int64())})
    ).repartition(8)  # force multiple single-vector partials
    got = summed_vector(
        ds,
        lambda b: np.bincount(
            b.column("x").to_numpy(zero_copy_only=False), minlength=7
        ),
        7,
    )
    assert got.tolist() == np.bincount(vals, minlength=7).tolist()


def test_summed_vector_empty_dataset(ray_session):
    import ray.data

    from b_pdf_parser_ray.functions.agg import summed_vector

    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    got = summed_vector(ds, lambda b: np.zeros(3, dtype=np.int64), 3)
    assert got.tolist() == [0, 0, 0]


def test_summed_vector_tree_level_same_result(ray_session):
    # source_rows past the threshold engages the intermediate fold level;
    # the result must be identical
    import ray.data

    from b_pdf_parser_ray.functions.agg import summed_vector

    vals = np.arange(500) % 5
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(4)
    fn = lambda b: np.bincount(
        b.column("x").to_numpy(zero_copy_only=False), minlength=5
    )
    assert (
        summed_vector(ds, fn, 5, source_rows=60_000_000).tolist()
        == np.bincount(vals, minlength=5).tolist()
    )


def test_decile_dense_plan_matches_exchange_fallback(ray_session, monkeypatch):
    """The statistics-proven dense-histogram plan and the distinct-value
    exchange plan must agree bin-for-bin (zero-count bins cannot move a
    boundary)."""
    from b_pdf_parser_ray import queries
    from b_pdf_parser_ray.functions import agg as agg_mod

    fast = queries.orders_price_decile_counts(SF_DIR)
    monkeypatch.setattr(agg_mod, "column_min_max", lambda *a, **k: None)
    slow = queries.orders_price_decile_counts(SF_DIR)
    pd.testing.assert_frame_equal(
        fast.sort_values("decile", ignore_index=True),
        slow.sort_values("decile", ignore_index=True),
    )


def test_cohort_partition_count_invariance(ray_session):
    # users never split across salt partitions, so the retention matrix is
    # P-invariant — the scale knob cannot change the answer
    from b_pdf_parser_ray import queries

    a = queries.events_cohort_retention(SF_DIR, num_partitions=4).to_pandas()
    b = queries.events_cohort_retention(SF_DIR, num_partitions=64).to_pandas()
    key = ["cohort_week", "week_offset"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True)[key + ["n_users"]],
        b.sort_values(key, ignore_index=True)[key + ["n_users"]],
    )


def test_grouped_agg_salted_plan_equals_exchange_plan(ray_session):
    """salt_key replaces the key-grain sort with a coarse salted exchange;
    both plans must agree on every key, aggregate, and the mean expansion."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(11)
    n = 50_000
    t = pa.table({
        "k": pa.array(rng.integers(0, 3000, n), pa.int64()),
        "v": pa.array(rng.normal(size=n)),
    })
    ds = ray.data.from_arrow(t).repartition(6)
    specs = [("v", "sum", "s"), (None, "count", "n"),
             ("v", "min", "mn"), ("v", "mean", "avg")]
    a = grouped_agg(ds, ["k"], specs).to_pandas().sort_values("k", ignore_index=True)
    b = (
        grouped_agg(ds, ["k"], specs, salt_key="k", salt_partitions=8)
        .to_pandas().sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=False, rtol=0, atol=1e-12)


def test_grouped_agg_salt_key_validation():
    with pytest.raises(ValueError, match="salt_key"):
        grouped_agg(None, ["k"], [("v", "sum", "s")], salt_key="other")


def test_grouped_agg_salt_hash_string_keys(ray_session):
    """salt_hash routes string keys via the memoized token_hash64; the
    salted plan must equal the sort-exchange plan on every key."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(5)
    words = np.array([f"w{i}" for i in range(800)])
    t = pa.table({
        "w": pa.array(words[rng.integers(0, len(words), 20_000)]),
        "v": pa.array(rng.integers(0, 100, 20_000).astype(np.int64)),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    specs = [("v", "sum", "s"), (None, "count", "n")]
    a = grouped_agg(ds, ["w"], specs).to_pandas().sort_values("w", ignore_index=True)
    b = (
        grouped_agg(ds, ["w"], specs, salt_key="w", salt_hash=True, salt_partitions=8)
        .to_pandas().sort_values("w", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_grouped_agg_salted_plan_under_hot_key_skew(ray_session):
    """90% of rows on one key: the hot key's partials all land in one salt
    partition, whose vectorized combine must still be exact (the salted
    plan's worst case — per-partition volume is bounded by map-side
    pre-reduction to |distinct keys per block|, not by row count)."""
    import numpy as np
    import ray.data

    rng = np.random.default_rng(23)
    k = np.where(rng.random(40_000) < 0.9, 7, rng.integers(0, 500, 40_000))
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "v": pa.array(np.ones(40_000, dtype=np.int64))})
    ds = ray.data.from_arrow(t).repartition(7)
    specs = [("v", "sum", "s"), (None, "count", "n")]
    a = grouped_agg(ds, ["k"], specs).to_pandas().sort_values("k", ignore_index=True)
    b = (
        grouped_agg(ds, ["k"], specs, salt_key="k", salt_partitions=16)
        .to_pandas().sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    hot = b.loc[b["k"] == 7, "n"].iloc[0]
    assert hot == (k == 7).sum()
