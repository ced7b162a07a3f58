"""Size-gated join planner: both physical plans must produce identical
results; the gate must pick broadcast under the cap and hash above it."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from b_pdf_parser_ray.functions.joins import anti_join, lookup_join, semi_join


@pytest.fixture()
def sides(ray_session):
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": list(range(100)), "v": [i * 10 for i in range(100)]})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": [i for i in range(0, 100, 3)], "name": [f"n{i}" for i in range(0, 100, 3)]})
    )
    return left, right


def _sorted(ds):
    return ds.to_pandas().sort_values("k").reset_index(drop=True)


def test_semi_join_both_plans_agree(sides):
    left, right = sides
    bcast = _sorted(semi_join(left, right, "k", "rk", right_source_rows=34))
    hash_ = _sorted(
        semi_join(left, right, "k", "rk", right_source_rows=34, max_broadcast_rows=0)
    )
    assert len(bcast) == 34  # multiples of 3 in [0, 100)
    pd.testing.assert_frame_equal(bcast, hash_[bcast.columns], check_dtype=False)


def test_anti_join_both_plans_agree(sides):
    left, right = sides
    bcast = _sorted(anti_join(left, right, "k", "rk", right_source_rows=34))
    hash_ = _sorted(
        anti_join(left, right, "k", "rk", right_source_rows=34, max_broadcast_rows=0)
    )
    assert len(bcast) == 66
    pd.testing.assert_frame_equal(bcast, hash_[bcast.columns], check_dtype=False)


def test_lookup_join_both_plans_agree(sides):
    left, right = sides
    bcast = _sorted(
        lookup_join(left, right, "k", "rk", ["name"], right_source_rows=34)
    )
    hash_ = _sorted(
        lookup_join(
            left, right, "k", "rk", ["name"], right_source_rows=34, max_broadcast_rows=0
        )
    )
    assert len(bcast) == 34
    assert set(bcast.columns) >= {"k", "v", "name"}
    pd.testing.assert_frame_equal(
        bcast[["k", "v", "name"]], hash_[["k", "v", "name"]], check_dtype=False
    )
    # inner semantics: unmatched left rows dropped, values correctly aligned
    assert (bcast["name"] == bcast["k"].map(lambda k: f"n{k}")).all()


@pytest.mark.parametrize(
    "name", ["q3_top_revenue_orders", "q4_order_priority",
             "customers_without_orders", "q5_nation_revenue"]
)
def test_gated_queries_identical_on_hash_plan(ray_session, ddb_sf, name, monkeypatch):
    """Force the hash plan (cap=0) on the real catalog queries: results must
    stay oracle-green — proving the scale path, not just the fast path."""
    import b_pdf_parser_ray.functions.joins as joins
    from b_pdf_parser_ray.queries import ORACLE_SQL, QUERIES

    monkeypatch.setattr(joins, "BROADCAST_MAX_SOURCE_ROWS", 0)
    got = QUERIES[name]("/root/testdata/sf0.001")
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    want = ddb_sf.sql(ORACLE_SQL[name]).df()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    pd.testing.assert_frame_equal(
        norm(got), norm(want), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


@pytest.fixture(scope="module")
def ddb_sf():
    import duckdb

    from b_pdf_parser_ray.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    return con


def test_null_keys_sql_semantics_both_plans(ray_session):
    """NULL keys follow SQL EXISTS/NOT EXISTS semantics on BOTH physical
    plans: a null left key matches nothing (excluded from semi, kept in
    anti, dropped by lookup); null right keys match nothing."""
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, None, 4], type=pa.int64()),
                  "v": [10, 20, 30, 40]})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, None], type=pa.int64()),
                  "name": ["two", "null"]})
    )
    for cap in (100, 0):  # broadcast plan, then hash plan
        s = semi_join(left, right, "k", "rk",
                      right_source_rows=2, max_broadcast_rows=cap).to_pandas()
        a = anti_join(left, right, "k", "rk",
                      right_source_rows=2, max_broadcast_rows=cap).to_pandas()
        assert sorted(s["v"]) == [20], f"semi cap={cap}"
        assert sorted(a["v"]) == [10, 30, 40], f"anti cap={cap}"
    lk = lookup_join(left, right, "k", "rk", ["name"],
                     right_source_rows=2).to_pandas()
    assert sorted(lk["v"]) == [20] and list(lk["name"]) == ["two"]
