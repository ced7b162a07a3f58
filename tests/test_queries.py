"""Driver-contract tests: every queries() entry runs; every oracle_sql()
entry matches DuckDB exactly (row count, schema, order-insensitive values) —
the same comparison the driver performs at sf=0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from b_pdf_parser_ray.queries import ORACLE_SQL, QUERIES
from b_pdf_parser_ray.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(ray_session, ddb, name):
    got = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    want = _normalize(ddb.sql(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)


# pair-producing dedup queries legitimately return empty on corpora with no
# duplicates (the driver testdata is random text / random embeddings)
_MAY_BE_EMPTY = {
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embeddings",
    "dedup_ngram_verify",
    "dedup_semantic",
}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(ray_session, name):
    df = _to_pandas(QUERIES[name](SF_DIR))
    assert df is not None
    if name not in _MAY_BE_EMPTY:
        assert len(df.columns) > 0 and len(df) > 0


def test_approx_distinct_within_tolerance(ray_session, ddb):
    """The query ships the sketch only; exactness is asserted here against
    DuckDB's count(distinct) — rel error ≤ 2/√k for KMV with k=1024."""
    from b_pdf_parser_ray.queries import approx_distinct_orders

    df = _to_pandas(approx_distinct_orders(SF_DIR))
    exact = ddb.sql("SELECT count(DISTINCT l_orderkey) AS n FROM lineitem").df()["n"].iloc[0]
    k = int(df["sketch_k"].iloc[0])
    est = df["estimated_distinct"].iloc[0]
    assert exact > 0
    assert abs(est - exact) / exact <= 2 / k**0.5


@pytest.mark.parametrize(
    "name",
    ["doc_lang_id", "doc_quality", "doc_fingerprints", "dedup_minhash",
     "media_image_features", "doc_bpe_tokens"],
)
def test_rows_only_queries_deterministic(ray_session, name):
    """Rows-only ops have no oracle — assert run-to-run determinism instead."""
    a = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    b = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_salted_partitions_formula_and_duckdb_parity():
    """P derivation: floor 64 at bench sizes, grows with rows, power of two;
    the Python formula must agree with the SQL formula the pack oracle
    embeds (POWER/CEIL/LOG2 over doubles) for row counts spanning 9 orders
    of magnitude — P is part of doc_pack_sequences' OUTPUT."""
    import duckdb

    from b_pdf_parser_ray.queries import PACK_TARGET_DOCS
    from b_pdf_parser_ray.sources.tables import salted_partitions

    assert salted_partitions(0) == 64
    assert salted_partitions(500) == 64
    assert salted_partitions(2_000_000 * 64) == 64
    assert salted_partitions(2_000_000 * 64 + 1) == 128
    assert salted_partitions(10_000_000_000) > 64
    for n in (1, 500, 5_000, 64_000_000, 64_000_001, 10**9, 10**12, 7 * 10**10):
        p = salted_partitions(n, target_rows=PACK_TARGET_DOCS)
        assert p & (p - 1) == 0  # power of two
        sql_p = duckdb.sql(
            f"SELECT CAST(POWER(2, CEIL(LOG2(GREATEST(64, "
            f"CEIL({n} / {float(PACK_TARGET_DOCS)}))))) AS BIGINT)"
        ).fetchone()[0]
        assert p == sql_p, (n, p, sql_p)


def test_sessionize_partition_count_invariance(ray_session):
    """Salted-partition operators must be P-invariant: same results at any
    partition count (the dynamic-P derivation changes P with corpus size)."""
    from b_pdf_parser_ray.queries import events_sessionize

    a = _normalize(_to_pandas(events_sessionize(SF_DIR, num_partitions=64)))
    b = _normalize(_to_pandas(events_sessionize(SF_DIR, num_partitions=256)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pii_scrub_redacts_planted_pii(ray_session, tmp_path):
    """The sf corpus carries no PII, so the oracle hash alone can't prove
    redaction — plant emails/phones in a tmp documents table and pin
    counts + placeholders."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import doc_pii_scrub

    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": [
                "contact alice.smith+x@example-corp.io or bob@x.co today",
                "call +1 (555) 123-4567 or 021 7654 321 now",
                "email a@b.io then call 555-123-4567 done",
            ],
        }),
        tmp_path / "documents.parquet",
    )
    out = {r["doc_id"]: r for r in doc_pii_scrub(str(tmp_path)).take_all()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert "<EMAIL>" in out[1]["clean_text"] and "@" not in out[1]["clean_text"]
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 2
    assert "<PHONE>" in out[2]["clean_text"]
    assert not any(ch.isdigit() for ch in out[2]["clean_text"])
    assert out[3]["n_emails"] == 1 and out[3]["n_phones"] == 1
    assert out[3]["clean_text"] == "email <EMAIL> then call <PHONE> done"


def test_heavy_hitters_misra_gries_guarantee(ray_session, ddb):
    """MG sketch invariants vs DuckDB's exact term counts: every term with
    true frequency > 2N/(k+1) must survive, and every surviving estimate
    undercounts by at most 2N/(k+1) (and never overcounts)."""
    from b_pdf_parser_ray.queries import corpus_heavy_hitters

    k = 64
    got = corpus_heavy_hitters(SF_DIR, k=k)
    est = dict(zip(got["term"], got["est_count"]))
    exact = ddb.sql(
        "SELECT term, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) "
        "AS term FROM documents) GROUP BY term"
    ).df()
    n_total = int(exact["n"].sum())
    bound = 2 * n_total / (k + 1)
    truth = dict(zip(exact["term"], exact["n"]))
    for term, n in truth.items():
        if n > bound:
            assert term in est, f"heavy term {term!r} (n={n}) missing"
    for term, e in est.items():
        t = truth.get(term, 0)
        assert e <= t, f"{term!r} overcounted: est {e} > true {t}"
        assert t - e <= bound, f"{term!r} undercounted beyond bound"


def test_layout_invariance_weighted_sample_and_first_docs(ray_session, tmp_path):
    """Operators with per-block partials must be block-layout invariant:
    the same table written as one file vs four fragments must produce
    identical results (the associativity claim, tested directly)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import lang_first_docs, orders_weighted_sample

    rng = __import__("numpy").random.RandomState(11)
    n = 2000
    orders = pa.table({
        "o_orderkey": pa.array(range(1, n + 1), type=pa.int64()),
        "o_totalprice": pa.array(rng.uniform(10, 500000, n).round(2)),
    })
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
    })

    one = tmp_path / "one"
    four = tmp_path / "four"
    for d in (one, four):
        os.makedirs(d / "orders.parquet")
        os.makedirs(d / "documents.parquet")
    pq.write_table(orders, one / "orders.parquet" / "part0.parquet")
    pq.write_table(docs, one / "documents.parquet" / "part0.parquet")
    for i in range(4):
        sl = slice(i * n // 4, (i + 1) * n // 4)
        pq.write_table(orders.slice(sl.start, sl.stop - sl.start),
                       four / "orders.parquet" / f"part{i}.parquet")
        pq.write_table(docs.slice(sl.start, sl.stop - sl.start),
                       four / "documents.parquet" / f"part{i}.parquet")

    def run(fn, sf):
        out = fn(str(sf))
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        return df.sort_values(list(df.columns), ignore_index=True)

    pd.testing.assert_frame_equal(
        run(orders_weighted_sample, one), run(orders_weighted_sample, four)
    )
    pd.testing.assert_frame_equal(
        run(lang_first_docs, one), run(lang_first_docs, four)
    )


def test_int8_quantization_preserves_retrieval(ray_session):
    """The audit's implicit claim — int8 is safe for retrieval — checked
    directly: cosine top-10 over reconstructed int8 vectors must overlap
    the full-precision top-10 at ≥ 0.8 recall."""
    import numpy as np
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.functions.ann import embedding_matrix

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = embedding_matrix(tbl.column("embedding"))
    scale = np.abs(mat).max(axis=1, keepdims=True) / 127.0
    recon = np.round(mat / scale) * scale

    def topk(m, q, k=10):
        qn = q / np.linalg.norm(q)
        scores = (m @ qn) / np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        return set(np.argsort(-scores)[:k])

    rng = np.random.RandomState(5)
    recalls = []
    for qi in rng.choice(len(mat), 10, replace=False):
        q = mat[qi]
        recalls.append(len(topk(mat, q) & topk(recon, q)) / 10)
    assert np.mean(recalls) >= 0.8, f"mean recall {np.mean(recalls):.2f}"


def test_approx_quantile_sketch_rank_error(ray_session, ddb):
    """Hash-sample quantile sketch: each estimate's TRUE rank (from the
    exact CDF) must sit within 3/√k of the target quantile."""
    from b_pdf_parser_ray.queries import orders_price_quantiles_approx

    k = 1024
    got = orders_price_quantiles_approx(SF_DIR, k=k).iloc[0]
    n = ddb.sql("SELECT count(*) AS n FROM orders").df()["n"].iloc[0]
    tol = 3 / k**0.5
    assert got["sample_k"] == min(k, n)
    for name, q in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75),
                    ("p90", 0.9), ("p99", 0.99)]:
        true_rank = ddb.sql(
            f"SELECT count(*) / CAST({n} AS DOUBLE) AS r FROM orders "
            f"WHERE o_totalprice <= {got[name]}"
        ).df()["r"].iloc[0]
        assert abs(true_rank - q) <= tol, f"{name}: rank {true_rank} vs {q}"


def test_chunk_windows_edge_cases(ray_session, tmp_path):
    """doc_chunk_windows boundary behavior vs the oracle on a synthetic
    table: empty text (split('') == ['']), single token, exactly one
    stride (48), exactly one window (64), stride+1, and a long multi-chunk
    doc — the cases the sf corpus never hits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import DOC_CHUNK_SQL, doc_chunk_windows

    texts = {
        0: "",
        1: "one",
        2: " ".join(f"t{i}" for i in range(48)),
        3: " ".join(f"t{i}" for i in range(64)),
        4: " ".join(f"t{i}" for i in range(49)),
        5: " ".join(f"t{i}" for i in range(200)),
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts.values()], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = _normalize(_to_pandas(doc_chunk_windows(str(tmp_path))))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = _normalize(con.sql(DOC_CHUNK_SQL).df())
    # 200 tokens -> ceil(200/48) = 5 chunks; singles -> 1 chunk each
    assert len(want) == 1 + 1 + 1 + 2 + 2 + 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_keep_best_policy_on_planted_duplicates(ray_session, tmp_path):
    """dedup_exact_keep_best's survivor policy on a corpus the sf tables
    never provide (they have no duplicate texts): cross-source duplicates
    must collapse to the most-curated source's copy, same-source ties to
    the smallest doc_id, unknown sources rank after every known one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import (
        DEDUP_KEEP_BEST_SQL,
        dedup_exact_keep_best,
    )

    rows = [
        # text A duplicated across sources: src2 (id 0), src0 (id 5), src9 (id 1)
        (0, "alpha beta gamma", "src2"),
        (5, "alpha beta gamma", "src0"),
        (1, "alpha beta gamma", "src9"),
        # text B duplicated within one source: min doc_id wins
        (7, "delta epsilon", "src1"),
        (3, "delta epsilon", "src1"),
        # text C unique, unknown source
        (4, "zeta", "src9"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = _normalize(_to_pandas(dedup_exact_keep_best(str(tmp_path))))
    survivors = dict(zip(got["doc_id"], got["n_copies"]))
    assert survivors == {5: 3, 3: 2, 4: 1}  # src0 beats src2/src9; min id; unique

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = _normalize(con.sql(DEDUP_KEEP_BEST_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, source) — writes a documents.parquet with the
    full column set the catalog's readers expect."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "source": pa.array([r[2] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in rows],
                type=pa.int64(),
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_cross_source_leakage_planted(ray_session, tmp_path):
    """The sf corpus has no duplicate texts, so its histogram is the
    trivial n_sources=1 row — plant cross-source and same-source copies
    to exercise the distinct-source counting: a text re-hosted by three
    sources counts 3 (same-source repeats count once), and the result
    must match the oracle and be partition-count invariant."""
    from b_pdf_parser_ray.queries import (
        CROSS_SOURCE_LEAKAGE_SQL,
        cross_source_leakage,
    )

    _write_docs(tmp_path, [
        (0, "mirrored page", "src0"),
        (1, "mirrored page", "src1"),
        (2, "mirrored page", "src2"),
        (3, "mirrored page", "src2"),   # same-source repeat: still 3 sources
        (4, "self duplicate", "src3"),
        (5, "self duplicate", "src3"),  # one source only
        (6, "unique page", "src4"),
        (7, None, "src5"),              # NULL ≡ '' — same text as doc 8,
        (8, "", "src6"),                # re-hosted by two sources
    ])
    got = _normalize(_to_pandas(cross_source_leakage(str(tmp_path))))
    hist = dict(zip(got["n_sources"], got["n_texts"]))
    assert hist == {3: 1, 2: 1, 1: 2}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(CROSS_SOURCE_LEAKAGE_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    again = _normalize(_to_pandas(cross_source_leakage(str(tmp_path), num_partitions=4)))
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_source_quality_gate_drops_bad_source(ray_session, tmp_path):
    """Domain-level filtering policy on a planted corpus: every doc from
    the low-mean source must vanish (including its individually-good doc
    — that is the point of gating by source, not by doc), and the result
    must match the oracle."""
    from b_pdf_parser_ray.queries import (
        DOC_SOURCE_GATE_SQL,
        doc_source_quality_gate,
    )

    good = "the quick brown fox jumps over the lazy dog near a quiet river " * 3
    bad = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    _write_docs(tmp_path, [
        (0, good + "one", "src_good"),
        (1, good + "two", "src_good"),
        (2, bad, "src_bad"),
        (3, bad + " b", "src_bad"),
        (4, good + "stranded good doc", "src_bad"),
    ])
    got = _to_pandas(doc_source_quality_gate(str(tmp_path)))
    assert set(got["source"]) == {"src_good"}
    assert sorted(got["doc_id"]) == [0, 1]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(DOC_SOURCE_GATE_SQL).df())
    pd.testing.assert_frame_equal(_normalize(got), want, check_dtype=False)


def test_repeated_windows_planted(ray_session, tmp_path):
    """ExactSubstr-style span signal on a planted corpus: a boilerplate
    paragraph quoted by two otherwise-distinct docs must mark exactly its
    windows as repeated in BOTH (doc-level dedup sees nothing here); a
    window repeated WITHIN one doc counts too; docs shorter than the
    window width drop out.  Must match the oracle and be partition-count
    invariant."""
    from b_pdf_parser_ray.queries import (
        DEDUP_REPEATED_WINDOWS_SQL,
        dedup_repeated_windows,
    )

    boiler = "all rights reserved contact the publisher for permissions worldwide"  # 9 toks
    _write_docs(tmp_path, [
        (0, "alpha beta gamma delta " + boiler, "src0"),
        (1, boiler + " epsilon zeta eta theta", "src1"),
        (2, "one two three four five six seven eight one two three four"
            " five six seven eight", "src2"),   # self-repeat, shifted by 8
        (3, "too short to window", "src3"),
    ])
    got = _normalize(_to_pandas(dedup_repeated_windows(str(tmp_path))))
    by_doc = got.set_index("doc_id")
    # 9-token boilerplate → two 8-token windows, both shared across docs 0/1
    assert by_doc.loc[0, "n_repeated"] == 2 and by_doc.loc[1, "n_repeated"] == 2
    assert by_doc.loc[2, "n_repeated"] >= 2   # within-doc repetition counts
    assert 3 not in by_doc.index              # < width tokens → no windows

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(DEDUP_REPEATED_WINDOWS_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    again = _normalize(
        _to_pandas(dedup_repeated_windows(str(tmp_path), num_partitions=4))
    )
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_substring_cut_planted(ray_session, tmp_path):
    """The cut ACTION on the same planted corpus: the shared boilerplate
    must vanish from both quoting docs while their unique prose survives,
    the self-repeating doc must collapse to nothing, the short doc passes
    through untouched — and everything matches the oracle and is
    partition-count invariant."""
    from b_pdf_parser_ray.queries import (
        DEDUP_SUBSTRING_CUT_SQL,
        dedup_substring_cut,
    )

    boiler = "all rights reserved contact the publisher for permissions worldwide"
    _write_docs(tmp_path, [
        (0, "alpha beta gamma delta " + boiler, "src0"),
        (1, boiler + " epsilon zeta eta theta", "src1"),
        (2, "one two three four five six seven eight one two three four"
            " five six seven eight", "src2"),
        (3, "too short to window", "src3"),
        (4, None, "src4"),                        # NULL text ≡ '' end to end
    ])
    got = _normalize(_to_pandas(dedup_substring_cut(str(tmp_path))))
    by_doc = got.set_index("doc_id")
    assert by_doc.loc[0, "clean_text"] == "alpha beta gamma delta"
    assert by_doc.loc[1, "clean_text"] == "epsilon zeta eta theta"
    assert by_doc.loc[2, "clean_text"] == ""      # every window repeats
    assert by_doc.loc[3, "clean_text"] == "too short to window"
    assert by_doc.loc[4, "clean_text"] == "" and int(by_doc.loc[4, "n_cut"]) == 0
    assert int(by_doc.loc[0, "n_cut"]) == 9

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(DEDUP_SUBSTRING_CUT_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    again = _normalize(
        _to_pandas(dedup_substring_cut(str(tmp_path), num_partitions=4))
    )
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_substring_cut_keep_first_planted(ray_session, tmp_path):
    """keep_first policy: each repeated window's globally-first occurrence
    (min (doc_id, start)) survives — doc 0 keeps the boilerplate it hosts
    first, doc 1 loses its copy, the self-repeating doc keeps exactly its
    first period."""
    from b_pdf_parser_ray.queries import (
        DEDUP_SUBSTRING_CUT_KEEP_FIRST_SQL,
        dedup_substring_cut_keep_first,
    )

    boiler = "all rights reserved contact the publisher for permissions worldwide"
    full0 = "alpha beta gamma delta " + boiler
    _write_docs(tmp_path, [
        (0, full0, "src0"),
        (1, boiler + " epsilon zeta eta theta", "src1"),
        (2, "one two three four five six seven eight one two three four"
            " five six seven eight", "src2"),
        (3, "too short to window", "src3"),
    ])
    got = _normalize(_to_pandas(dedup_substring_cut_keep_first(str(tmp_path))))
    by_doc = got.set_index("doc_id")
    assert by_doc.loc[0, "clean_text"] == full0            # first occurrence kept
    assert by_doc.loc[1, "clean_text"] == "epsilon zeta eta theta"
    assert by_doc.loc[2, "clean_text"] == (
        "one two three four five six seven eight"          # first period kept
    )
    assert by_doc.loc[3, "clean_text"] == "too short to window"

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(DEDUP_SUBSTRING_CUT_KEEP_FIRST_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_media_captions_planted(ray_session, tmp_path):
    """Caption mining on the boundary texts the sf corpus never hits:
    empty text (split('') == [''] → no media), exactly 6/7/8 tokens, and a
    long doc whose trailing sub-7-token segment must pair with nothing."""
    from b_pdf_parser_ray.queries import MEDIA_CAPTIONS_SQL, doc_media_captions

    _write_docs(tmp_path, [
        (0, "", "s"),
        (1, "a b c d e f", "s"),                    # 6 toks → no media
        (2, "a b c d e f g", "s"),                  # exactly 7 → one pair
        (3, "a b c d e f g h", "s"),                # 8 → one pair, 'h' dropped
        (4, " ".join(f"t{i}" for i in range(20)), "s"),  # 2 pairs, 6 dropped
    ])
    got = _normalize(_to_pandas(doc_media_captions(str(tmp_path))))
    assert list(got["doc_id"]) == [2, 3, 4, 4]
    assert list(got["caption"])[:2] == ["a b c d e f g"] * 2
    assert list(got["media_ref"]) == ["Im7", "Im7", "Im7", "Im15"]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(MEDIA_CAPTIONS_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_media_caption_pairs_kernel_edges():
    """The pairing kernel on span layouts the synthesizer never produces:
    a media-first document (empty caption), consecutive media spans (the
    second pairs with nothing in its segment), and trailing text after the
    last media (dropped) — pure-function test, no Ray."""
    import pyarrow as pa

    from b_pdf_parser_ray.queries import media_caption_pairs

    def doc(doc_id, seq):
        spans = []
        for off, item in enumerate(seq):
            if item.startswith("Im"):
                spans.append({"kind": "media", "text": "", "media_ref": item,
                              "offset": off})
            else:
                spans.append({"kind": "text", "text": item, "media_ref": "",
                              "offset": off})
        return {"doc_id": doc_id, "spans": spans}

    batch = pa.Table.from_pylist([
        doc(1, ["Im0", "a", "b", "Im1", "Im2", "c"]),  # media-first + consecutive
        doc(2, ["x", "y", "Im9", "z"]),                # trailing 'z' dropped
    ])
    out = media_caption_pairs(batch).to_pylist()
    assert out == [
        {"doc_id": 1, "media_ref": "Im0", "caption": ""},
        {"doc_id": 1, "media_ref": "Im1", "caption": "a b"},
        {"doc_id": 1, "media_ref": "Im2", "caption": ""},
        {"doc_id": 2, "media_ref": "Im9", "caption": "x y"},
    ]


def test_extract_media_captions_matches_span_layout(ray_session):
    """The fixture-corpus caption run must equal an independent per-doc
    Python recomputation from the same span lists: one pair per media span,
    caption = text spans since the previous media joined by ' ' (the
    fixture's media-first docs pin the empty-caption edge on
    production-shaped data)."""
    from b_pdf_parser_ray.fixtures import corpus_table
    from b_pdf_parser_ray.queries import extract_media_captions

    got = _to_pandas(extract_media_captions(SF_DIR))
    want = []
    for row in corpus_table(500).to_pylist():
        run = []
        for s in row["spans"]:
            if s["kind"] == "media":
                want.append((row["doc_id"], s["media_ref"], " ".join(run)))
                run = []
            else:
                run.append(s["text"])
    assert len(got) == len(want) > 0
    got_t = list(zip(got["doc_id"], got["media_ref"], got["caption"]))
    assert sorted(got_t) == sorted(want)
    assert any(c == "" for _, _, c in want)  # media-first docs exercised


def test_funnel_partition_count_invariance(ray_session):
    """events_funnel_counts must be P-invariant like every salted-partition
    operator: user rows are partition-local at any P, so the three stage
    counters cannot change with the partition count."""
    from b_pdf_parser_ray.queries import events_funnel_counts

    a = _normalize(_to_pandas(events_funnel_counts(SF_DIR, num_partitions=4)))
    b = _normalize(_to_pandas(events_funnel_counts(SF_DIR, num_partitions=128)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_vocab_growth_planted_and_tiny_corpus(ray_session, tmp_path):
    """Vocabulary growth on a planted corpus: words introduced late must
    not count toward early prefixes, and a 2-doc corpus (where the ⅛/¼/½
    thresholds collide after ceil) still matches the oracle with deduped
    threshold rows."""
    from b_pdf_parser_ray.queries import CORPUS_VOCAB_GROWTH_SQL, corpus_vocab_growth

    _write_docs(tmp_path, [
        (0, "alpha beta", "s"), (1, "alpha beta", "s"),
        (2, "alpha beta", "s"), (3, "alpha beta", "s"),
        (4, "gamma", "s"),      (5, "gamma delta", "s"),
        (6, "alpha", "s"),      (7, "epsilon", "s"),
    ])
    got = _normalize(_to_pandas(corpus_vocab_growth(str(tmp_path))))
    # thresholds ceil(8f) = 1, 2, 4, 8 → vocab 2, 2, 2, 5
    assert list(zip(got["prefix_docs"], got["vocab"])) == [
        (1, 2), (2, 2), (4, 2), (8, 5)
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(CORPUS_VOCAB_GROWTH_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    tiny = tmp_path / "tiny"
    tiny.mkdir()
    _write_docs(tiny, [(0, "a b", "s"), (1, "a c", "s")])
    got2 = _normalize(_to_pandas(corpus_vocab_growth(str(tiny))))
    # ceil(2f) = 1, 1, 1, 2 → deduped thresholds {1, 2}; vocab 2, 3
    assert list(zip(got2["prefix_docs"], got2["vocab"])) == [(1, 2), (2, 3)]
    con2 = duckdb.connect()
    con2.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tiny}/documents.parquet')")
    want2 = _normalize(con2.sql(CORPUS_VOCAB_GROWTH_SQL).df())
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)


def test_source_overlap_planted(ray_session, tmp_path):
    """Known vocab overlap: srcA={a,b,c,d,e}, srcB={c,d,e,f} → common 3,
    union 6, jaccard 0.5; srcC disjoint → its pairs (n_common=0) are
    omitted, matching the oracle's inner join.  Must match the oracle and
    be partition-count invariant."""
    from b_pdf_parser_ray.queries import SOURCE_OVERLAP_SQL, source_overlap_jaccard

    _write_docs(tmp_path, [
        (0, "a b c d", "srcA"),
        (1, "c d e", "srcA"),
        (2, "c d e f", "srcB"),
        (3, "x y", "srcC"),
    ])
    got = _normalize(_to_pandas(source_overlap_jaccard(str(tmp_path))))
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["source_a"], row["source_b"]) == ("srcA", "srcB")
    assert row["n_common"] == 3 and row["n_union"] == 6 and row["jaccard"] == 0.5

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(SOURCE_OVERLAP_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    again = _normalize(_to_pandas(source_overlap_jaccard(str(tmp_path), num_partitions=4)))
    pd.testing.assert_frame_equal(got, again, check_dtype=False)


def test_dsir_planted_target_like_doc(ray_session, tmp_path):
    """DSIR selection on a planted corpus: a non-target-language document
    written in the target slice's vocabulary must score positive (get
    selected) while raw-typical documents score negative — the whole point
    of importance resampling vs a hard language filter.  Engine must match
    the oracle exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import DOC_DSIR_SQL, doc_dsir_weights

    # token counts must dominate the 64-bucket add-one smoothing mass, so
    # the planted documents repeat their vocabulary at realistic scale
    rows = [
        (0, " ".join(["alpha"] * 50 + ["beta"] * 30 + ["gamma"]), "en"),
        (1, " ".join(["alpha"] * 20 + ["beta"] * 30), "en"),
        (2, " ".join(["delta"] * 40 + ["epsilon"] * 30 + ["zeta"] * 30), "fr"),
        (3, " ".join(["epsilon"] * 20 + ["zeta"] * 30 + ["delta"] * 10), "fr"),
        (4, "alpha beta alpha", "fr"),   # target-like impostor
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array(["s"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )
    got = _normalize(_to_pandas(doc_dsir_weights(str(tmp_path))))
    sel = dict(zip(got["doc_id"], got["selected"]))
    assert sel[4] is True or sel[4] == True  # noqa: E712 — numpy bool
    assert not sel[2] and not sel[3]
    assert sel[0] and sel[1]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
    want = _normalize(con.sql(DOC_DSIR_SQL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_kmv_within_tolerance(ray_session, ddb):
    """Per-type KMV estimates vs DuckDB exact per-type distinct users:
    every group within 3/sqrt(k) relative error, and the tiny-cardinality
    exact path (merged < k) returns the exact count."""
    import math

    from b_pdf_parser_ray.queries import events_type_distinct_approx

    k = 1024
    got = _to_pandas(events_type_distinct_approx(SF_DIR, k=k))
    want = ddb.sql(
        "SELECT event_type, count(DISTINCT user_id) AS d FROM events GROUP BY 1"
    ).df().set_index("event_type")["d"]
    assert set(got["event_type"]) == set(want.index)
    tol = 3.0 / math.sqrt(k)
    for _, row in got.iterrows():
        exact = int(want[row["event_type"]])
        err = abs(row["estimated_distinct"] - exact) / exact
        assert err <= tol, (row["event_type"], row["estimated_distinct"], exact)
        if exact < k:  # saw-everything path must be exact
            assert row["estimated_distinct"] == exact


def test_grouped_kmv_estimation_path_planted(ray_session, tmp_path):
    """The sf corpus has fewer users than k, so only the exact path runs
    there — plant a high-cardinality events table (distinct user counts
    far above k per type) to exercise the real estimation path per group."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import events_type_distinct_approx

    rng = np.random.default_rng(7)
    rows = []
    truth = {"a": 5000, "b": 20000, "c": 600}
    for t, n_users in truth.items():
        users = rng.choice(n_users * 10, size=n_users, replace=False)
        users = np.repeat(users, 2)  # repeats must not inflate the count
        rows.append(pa.table({
            "event_id": pa.array(np.arange(len(users)), type=pa.int64()),
            "ts": pa.array([0] * len(users), type=pa.timestamp("us")),
            "user_id": pa.array(users, type=pa.int64()),
            "event_type": pa.array([t] * len(users)),
            "value": pa.array([1.0] * len(users)),
            "props": pa.array(["{}"] * len(users)),
        }))
    pq.write_table(pa.concat_tables(rows), tmp_path / "events.parquet")

    k = 256
    got = events_type_distinct_approx(str(tmp_path), k=k).to_pandas()
    tol = 3.0 / math.sqrt(k)
    for _, row in got.iterrows():
        exact = truth[row["event_type"]]
        err = abs(row["estimated_distinct"] - exact) / exact
        assert err <= tol, (row["event_type"], row["estimated_distinct"], exact)


def test_lm_score_vocab_boundary_ties_across_partitions(ray_session, tmp_path):
    """The salted vocab fold's top-k must survive maximal tie pressure at
    the k boundary: 2,600 distinct terms where ranks past 100 all tie at
    count 1, so the LM_VOCAB_K=2000 cut falls inside the tie block and is
    decided purely by the (c DESC, w ASC) tiebreak — any per-partition
    top-k that orders differently from the oracle's ORDER BY changes
    which singletons become <unk> and shifts every score."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import DOC_LM_SCORE_SQL, doc_lm_score

    rng = np.random.default_rng(13)
    head = [f"t{i:04d}" for i in range(100)]          # count 3 each
    tail = [f"t{i:04d}" for i in range(100, 2600)]    # count 1 each — ties
    stream = head * 3 + tail
    rng.shuffle(stream)
    docs = [
        " ".join(stream[i: i + 10]) for i in range(0, len(stream), 10)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
        }),
        tmp_path / "documents.parquet",
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    got = _normalize(_to_pandas(doc_lm_score(str(tmp_path))))
    want = _normalize(con.sql(DOC_LM_SCORE_SQL).df())
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)
