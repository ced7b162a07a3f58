"""Invariant tests for the GROUPING SETS cube and the inverted-index build
beyond the parameterized oracle match: internal consistency between rollup
levels, postings structure on a planted corpus, and bucket-parameter scaling.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from b_pdf_parser_ray.queries import corpus_inverted_index, events_grouping_sets

SF_DIR = "/root/testdata/sf0.001"


def test_grouping_sets_levels_are_consistent(ray_session):
    """The four rollup levels must reconcile: each coarser level's counts
    are the sums of the finest level it aggregates, and the grand total
    matches the whole fact table — a wrong single-pass derivation (e.g.
    double-counting a union branch) breaks these identities."""
    df = events_grouping_sets(SF_DIR)  # pandas since the shared-frame rewrite
    finest = df[df["grouping_id"] == 0]
    by_type = df[df["grouping_id"] == 1].set_index("event_type")
    by_day = df[df["grouping_id"] == 2].set_index("day")
    grand = df[df["grouping_id"] == 3]

    assert len(grand) == 1
    assert grand["n_events"].iloc[0] == finest["n_events"].sum()
    assert (grand["event_type"].iloc[0], grand["day"].iloc[0]) == ("ALL", "ALL")

    type_sums = finest.groupby("event_type")["n_events"].sum()
    pd.testing.assert_series_equal(
        by_type["n_events"].sort_index(), type_sums.sort_index(),
        check_names=False,
    )
    assert (by_type.index != "ALL").all() and (by_type["day"] == "ALL").all()

    day_sums = finest.groupby("day")["n_events"].sum()
    pd.testing.assert_series_equal(
        by_day["n_events"].sort_index(), day_sums.sort_index(), check_names=False
    )
    # value sums reconcile too (re-reduced from raw partials, not from
    # rounded output — allow only rounding residue)
    assert abs(grand["sum_value"].iloc[0] - finest["sum_value"].sum()) < 0.05


def test_inverted_index_postings_planted(ray_session, tmp_path):
    """Planted corpus: a stopword present in EVERY doc must spread across
    all occupied buckets with complete ascending postings; a singleton term
    appears in exactly one bucket; per-doc repeats collapse (postings are
    distinct doc_ids)."""
    docs = {
        0: "the alpha", 1: "the the beta", 2: "the gamma",
        65: "the alpha", 64: "the omega unique_term",
    }
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(docs), type=pa.int64()),
            "text": pa.array(list(docs.values())),
        }),
        tmp_path / "documents.parquet",
    )
    out = corpus_inverted_index(str(tmp_path)).to_pandas()

    the = out[out["term"] == "the"].sort_values("bucket")
    # floor B=64: doc_id % 64 → buckets {0: [0,64], 1: [1,65], 2: [2]}
    assert list(the["bucket"]) == [0, 1, 2]
    assert list(the["postings"]) == ["0,64", "1,65", "2"]
    assert list(the["n_docs"]) == [2, 2, 1]  # doc 1's repeat collapsed

    uniq = out[out["term"] == "unique_term"]
    assert len(uniq) == 1 and uniq["postings"].iloc[0] == "64"

    alpha = out[out["term"] == "alpha"]  # docs 0 and 65 → two buckets
    assert set(alpha["postings"]) == {"0", "65"}


def test_inverted_index_bucket_count_scales_output(ray_session):
    """num_buckets is part of the OUTPUT contract (like pack's P): doubling
    it must split postings without losing any (doc, term) pair."""
    a = corpus_inverted_index(SF_DIR, num_buckets=64).to_pandas()
    b = corpus_inverted_index(SF_DIR, num_buckets=128).to_pandas()

    def pairs(df):
        out = set()
        for term, postings in zip(df["term"], df["postings"]):
            out.update((term, int(d)) for d in postings.split(","))
        return out

    assert pairs(a) == pairs(b)
    assert b["n_docs"].max() <= a["n_docs"].max()
    # every posting id actually belongs to its row's bucket
    for bk, p in zip(b["bucket"], b["postings"]):
        assert all(int(d) % 128 == bk for d in p.split(","))


def test_inverted_index_df_matches_duckdb(ray_session):
    """Cross-engine document frequencies: summing a term's n_docs across
    buckets must equal DuckDB's exact distinct-doc count per token."""
    import duckdb

    idx = corpus_inverted_index(SF_DIR).to_pandas()
    got = idx.groupby("term")["n_docs"].sum().sort_index()
    want = duckdb.sql(
        "SELECT term, count(DISTINCT doc_id) AS n FROM ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS term"
        f"  FROM read_parquet('{SF_DIR}/documents.parquet')"
        ") GROUP BY term ORDER BY term"
    ).df().set_index("term")["n"]
    pd.testing.assert_series_equal(got, want, check_names=False, check_dtype=False)
