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
             "customers_without_orders", "q5_nation_revenue",
             "q7_nation_pair_volume", "q18_large_orders",
             "events_type_share", "purchase_error_user_overlap",
             "doc_lm_score", "q15_top_supplier",
             "q17_small_quantity_revenue", "q8_market_share",
             "q21_waiting_suppliers", "q22_lapsed_high_balance",
             "q9_product_profit", "q2_min_cost_supplier",
             "q16_supplier_variety", "q20_potential_promotion",
             "dedup_exact_keep_best", "corpus_build_pipeline",
             "doc_embedding_join"]
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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_joins_match_duckdb(ray_session, seed):
    """Randomized differential: semi/anti/lookup on random key sets with
    duplicates and nulls must match DuckDB on both physical plans."""
    import duckdb
    import numpy as np
    import ray.data

    rng = np.random.RandomState(seed)

    def col(n, null_rate):
        vals = rng.randint(0, 30, size=n).astype("float64")
        vals[rng.random(n) < null_rate] = np.nan
        return pa.array([None if np.isnan(v) else int(v) for v in vals],
                        type=pa.int64())

    n_l, n_r = 80, 25
    lt = pa.table({"k": col(n_l, 0.1), "v": pa.array(range(n_l), type=pa.int64())})
    rt = pa.table({"rk": col(n_r, 0.1),
                   "name": pa.array([f"n{i}" for i in range(n_r)])})
    # lookup needs unique right keys: dedup by first occurrence
    seen, keep = set(), []
    for i, x in enumerate(rt.column("rk").to_pylist()):
        keep.append(x not in seen)
        seen.add(x)
    rt_uniq = rt.filter(pa.array(keep))

    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    con.register("ru", rt_uniq)
    want_semi = sorted(con.sql(
        "SELECT v FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.rk = l.k)").df()["v"])
    want_anti = sorted(con.sql(
        "SELECT v FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.rk = l.k)").df()["v"])
    want_lookup = con.sql(
        "SELECT v, name FROM l JOIN ru ON l.k = ru.rk ORDER BY v").df()

    lds = ray.data.from_arrow(lt)
    rds = ray.data.from_arrow(rt)
    ruds = ray.data.from_arrow(rt_uniq)
    for cap in (1000, 0):
        s = sorted(semi_join(lds, rds, "k", "rk", right_source_rows=n_r,
                             max_broadcast_rows=cap).to_pandas()["v"])
        a = sorted(anti_join(lds, rds, "k", "rk", right_source_rows=n_r,
                             max_broadcast_rows=cap).to_pandas()["v"])
        assert s == want_semi, f"semi cap={cap} seed={seed}"
        assert a == want_anti, f"anti cap={cap} seed={seed}"
        lk = (lookup_join(lds, ruds, "k", "rk", ["name"], right_source_rows=n_r,
                          max_broadcast_rows=cap)
              .to_pandas().sort_values("v").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            lk[["v", "name"]], want_lookup, check_dtype=False)


def test_empty_key_side_broadcast_plan(ray_session):
    """A fully-filtered key side yields zero block refs; the broadcast plan
    must return the trivial result, not crash in concat_tables."""
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [10, 20, 30]}))
    right = ray.data.from_arrow(pa.table({"rk": [99]})).filter(
        lambda r: r["rk"] < 0
    )
    assert semi_join(left, right, "k", "rk", right_source_rows=1).count() == 0
    assert sorted(
        anti_join(left, right, "k", "rk", right_source_rows=1).to_pandas()["v"]
    ) == [10, 20, 30]
    assert (
        lookup_join(
            left,
            ray.data.from_arrow(pa.table({"rk": [99], "name": ["x"]})).filter(
                lambda r: r["rk"] < 0
            ),
            "k",
            "rk",
            ["name"],
            right_source_rows=1,
        ).count()
        == 0
    )


def test_skew_join_plans_agree_and_match_duckdb(ray_session):
    """skew_join's three plans (broadcast-right, plain hash, hot-key
    hybrid) must all equal the DuckDB inner join on a corpus where one key
    owns 60% of the left rows."""
    import duckdb
    import numpy as np
    import ray.data

    from b_pdf_parser_ray.functions.joins import _hot_keys, skew_join

    rng = np.random.default_rng(7)
    keys = np.where(
        rng.random(20_000) < 0.6, 7, rng.integers(100, 1100, 20_000)
    ).astype(np.int64)
    ltbl = pa.table({"k": keys, "v": np.arange(20_000, dtype=np.int64)})
    rtbl = pa.table(
        {"rk": pa.array(np.arange(1200), type=pa.int64()),
         "name": [f"n{i}" for i in range(1200)]}
    )
    left = ray.data.from_arrow(ltbl).repartition(8)
    right = ray.data.from_arrow(rtbl).repartition(4)

    # detection: the planted hot key and only plausible hot keys
    hot = set(_hot_keys(left, "k", frac=0.5 / 8).to_pylist())
    assert 7 in hot and len(hot) <= 4

    ldf, rdf = ltbl.to_pandas(), rtbl.to_pandas()
    want = duckdb.sql(
        "SELECT k, v, name FROM ldf JOIN rdf ON k = rk ORDER BY v"
    ).df()

    def run(**kw):
        out = skew_join(
            left, right, "k", "rk", ["name"], right_source_rows=1200, **kw
        )
        return (
            out.to_pandas()[["k", "v", "name"]]
            .sort_values("v")
            .reset_index(drop=True)
        )

    bcast = run()  # right under the cap → broadcast lookup plan
    hybrid = run(max_broadcast_rows=0)  # forced → hot-key hybrid
    nohot = run(max_broadcast_rows=0, hot_key_fraction=2.0)  # forced → plain hash
    for got in (bcast, hybrid, nohot):
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_skew_join_null_keys_dropped_both_branches(ray_session):
    """Null left keys never inner-join — both the hot branch and the rest
    branch must drop them (a null sneaking into either side's is_in mask
    would leak rows)."""
    import ray.data

    from b_pdf_parser_ray.functions.joins import skew_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 1, 1, 2, None], type=pa.int64()),
                  "v": list(range(6))})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, 2], type=pa.int64()), "name": ["a", "b"]})
    )
    out = skew_join(
        left, right, "k", "rk", ["name"], right_source_rows=2,
        max_broadcast_rows=0, hot_key_fraction=0.3,
    ).to_pandas()
    assert len(out) == 5 and set(out["name"]) == {"a", "b"}


def test_hash_join_survives_empty_first_blocks(ray_session):
    """Ray 2.49's hash shuffle drops the schema broadcast when the first
    shuffled block is empty (rayfix.py) — a selective filter ahead of a
    hash join makes most blocks empty and the failure arrival-order
    dependent.  Repeat a q18-shaped join (3 surviving keys out of 1.5k,
    12/16 left blocks empty) to pin the fix."""
    import pyarrow.compute as pc
    import ray.data

    from b_pdf_parser_ray.functions.agg import grouped_agg
    from b_pdf_parser_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    for _ in range(3):
        qty = grouped_agg(
            read_table(sf, "lineitem", columns=["l_orderkey", "l_quantity"]),
            ["l_orderkey"],
            [("l_quantity", "sum", "total_qty")],
        )
        left = qty.map_batches(
            lambda b: b.filter(pc.greater(b.column("total_qty"), pa.scalar(300.0))),
            batch_format="pyarrow",
        )
        right = read_table(sf, "orders", columns=["o_orderkey", "o_custkey"])
        j = left.join(
            right, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
        got = j.to_pandas()
        import duckdb

        want = duckdb.sql(
            f"SELECT count(*) AS n FROM (SELECT l_orderkey FROM "
            f"read_parquet('{sf}/lineitem.parquet') GROUP BY l_orderkey "
            f"HAVING sum(l_quantity) > 300.0)"
        ).df()["n"].iloc[0]
        assert len(got) == want > 0 and set(got.columns) == {
            "l_orderkey", "total_qty", "o_custkey"
        }


def test_bloom_prefiltered_semi_join_exact_and_prunes(ray_session):
    """bloom_prefilter=True on the hash plan must stay EXACT (the join
    verifies survivors) and the filter itself must prune definite
    non-matches at roughly its design false-positive rate."""
    import numpy as np
    import ray.data

    from b_pdf_parser_ray.functions.joins import (
        _bloom_bits,
        bloom_probe_mask,
        build_bloom,
        semi_join,
    )

    rng = np.random.RandomState(3)
    lk = pa.array(
        [None if rng.random() < 0.05 else int(v)
         for v in rng.randint(0, 5000, 400)],
        type=pa.int64(),
    )
    left = ray.data.from_arrow(pa.table({"k": lk, "v": list(range(400))}))
    right_keys = pa.array(sorted(set(rng.randint(0, 5000, 120).tolist())),
                          type=pa.int64())
    right = ray.data.from_arrow(pa.table({"rk": right_keys}))

    plain = sorted(
        semi_join(left, right, "k", "rk", right_source_rows=len(right_keys),
                  max_broadcast_rows=0).to_pandas()["v"]
    )
    bloomed = sorted(
        semi_join(left, right, "k", "rk", right_source_rows=len(right_keys),
                  max_broadcast_rows=0, bloom_prefilter=True).to_pandas()["v"]
    )
    assert bloomed == plain and len(plain) > 0

    # direct fp-rate check: disjoint probe keys must almost all miss
    bitmap, m = build_bloom(right, "rk", source_rows=len(right_keys))
    probes = np.arange(10_000, 20_000, dtype=np.int64)  # disjoint from [0,5000)
    fp = bloom_probe_mask(probes, bitmap, m).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f} too high for m={m}"
    assert m == _bloom_bits(len(right_keys))


def test_copartition_lookup_join_nested_payload(ray_session):
    """The co-partition hash plan (hash_plan='copartition') must agree with
    the broadcast plan on a left side whose payload acero REJECTS (a
    list<struct> column — Dataset.join raises 'not supported in join
    non-key field'), including dropping unmatched left rows and surviving
    partitions that hold only one side's rows."""
    import ray.data

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string())])
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([f"d{i}" for i in range(40)]),
                "payload": pa.array(
                    [[{"kind": "text", "text": f"t{i}"}] for i in range(40)],
                    pa.list_(span_t),
                ),
            }
        )
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([f"d{i}" for i in range(0, 40, 2)]),
                "val": pa.array([f"v{i}" for i in range(0, 40, 2)]),
            }
        )
    )
    bcast = lookup_join(
        left, right, "k", "rk", ["val"], right_source_rows=20
    ).to_pandas()
    copart = lookup_join(
        left, right, "k", "rk", ["val"], right_source_rows=20,
        max_broadcast_rows=0, hash_plan="copartition",
    ).to_pandas()
    assert len(bcast) == len(copart) == 20
    for df in (bcast, copart):
        df.sort_values("k", ignore_index=True, inplace=True)
        assert (df["val"] == df["k"].str.replace("d", "v")).all()
        assert [p[0]["text"] for p in df["payload"]] == [
            "t" + k[1:] for k in df["k"]
        ]
