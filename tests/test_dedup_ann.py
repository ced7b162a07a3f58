"""Behavioral tests for dedup + similarity search with PLANTED duplicates
(the driver corpus has none, so these synthesize their own ground truth)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from b_pdf_parser_ray.functions.ann import IVFIndex, topk_cosine
from b_pdf_parser_ray.functions.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _mutate(rng, text, k):
    toks = text.split()
    for _ in range(k):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


@pytest.fixture(scope="module")
def dup_corpus():
    import random

    rng = random.Random(5)
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": _doc(rng)})
    # exact dups: 100/101 copy doc 0; near dups: 200 mutates doc 1 slightly
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[0]["text"]})
    rows.append({"doc_id": 200, "text": _mutate(rng, rows[1]["text"], 2)})
    return pa.Table.from_pylist(rows)


def test_exact_dedup_finds_copies(ray_session, dup_corpus):
    import ray.data

    out = exact_dedup(ray.data.from_arrow(dup_corpus)).to_pandas()
    assert len(out) == 41  # 43 docs, 3 sharing one text
    rep = out[out["n_copies"] == 3]
    assert len(rep) == 1 and rep.iloc[0]["doc_id"] == 0
    assert (out[out["n_copies"] == 1]["doc_id"] != 100).all()


def test_minhash_lsh_finds_exact_and_near_dups(ray_session, dup_corpus):
    import ray.data

    pairs = minhash_lsh_pairs(
        ray.data.from_arrow(dup_corpus), threshold=0.5
    ).to_pandas()
    found = {tuple(p) for p in pairs[["a", "b"]].to_numpy()}
    assert (0, 100) in found and (0, 101) in found and (100, 101) in found
    assert (1, 200) in found  # near-dup (2 token edits out of 60)
    # estimated jaccard of exact dup is 1.0
    exact = pairs[(pairs["a"] == 0) & (pairs["b"] == 100)]
    assert float(exact["est_jaccard"].iloc[0]) == 1.0


def test_ngram_jaccard_kernel():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    mid = ngram_jaccard("a b c d e f g h", "a b c d e f g x")
    assert 0.0 < mid < 1.0


def test_simhash_finds_near_dups(ray_session, dup_corpus):
    import ray.data

    pairs = simhash_pairs(
        ray.data.from_arrow(dup_corpus), max_hamming=6
    ).to_pandas()
    found = {tuple(p) for p in pairs[["a", "b"]].to_numpy()}
    assert (0, 100) in found and (0, 101) in found
    exact = pairs[(pairs["a"] == 0) & (pairs["b"] == 100)]
    assert int(exact["hamming"].iloc[0]) == 0


def test_embedding_near_dups_finds_planted(ray_session):
    import ray.data

    rng = np.random.RandomState(2)
    base = rng.normal(size=(50, 64))
    # plant: vec 100 ≈ vec 0 (tiny noise), vec 101 == vec 3 exactly
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(50)]
    rows.append({"vec_id": 100, "embedding": (base[0] + rng.normal(scale=0.02, size=64)).tolist()})
    rows.append({"vec_id": 101, "embedding": base[3].tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_near_dups(ds, threshold=0.95).to_pandas()
    found = {tuple(p) for p in pairs[["a", "b"]].to_numpy()}
    assert (0, 100) in found
    assert (3, 101) in found


def test_brute_force_topk_is_exact(ray_session):
    import ray.data

    rng = np.random.RandomState(4)
    mat = rng.normal(size=(300, 64))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    q = mat[7]
    got = topk_cosine(ds, q, k=10).to_pandas()
    # numpy ground truth
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = m @ (q / np.linalg.norm(q))
    want_ids = set(np.argsort(-scores)[:10].tolist())
    assert set(got["vec_id"]) == want_ids
    assert got.iloc[0]["vec_id"] == 7 and got.iloc[0]["score"] == 1.0


def test_ivf_recall_against_brute_force(ray_session):
    import ray.data

    rng = np.random.RandomState(9)
    # clustered data so IVF partitions are meaningful
    centers = rng.normal(size=(8, 64)) * 3
    vecs = np.concatenate([c + rng.normal(size=(40, 64)) for c in centers])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    q = vecs[5]

    brute = set(topk_cosine(ds, q, k=10).to_pandas()["vec_id"])
    index = IVFIndex.train(ds, n_clusters=8, sample_fraction=0.5)
    assigned = index.assign(ds)
    approx = set(index.search(assigned, q, k=10, nprobe=3).to_pandas()["vec_id"])
    recall = len(brute & approx) / 10
    assert recall >= 0.8, f"IVF recall {recall}"


# ---------------------------------------------------------------------------
# Recall/precision + goldens pinning the rows-only operators (VERDICT r1 #8)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def graded_corpus():
    """200 base docs + 30 planted near-dup pairs at graded mutation levels
    (0..5 of 60 tokens changed) — ground truth for recall/precision."""
    import random

    rng = random.Random(17)
    rows = [{"doc_id": i, "text": _doc(rng)} for i in range(200)]
    planted = []
    for j in range(30):
        base = rows[j]["text"]
        k = j % 6  # mutation strength 0..5 tokens of 60
        rows.append({"doc_id": 1000 + j, "text": _mutate(rng, base, k)})
        planted.append((j, 1000 + j, k))
    return pa.Table.from_pylist(rows), planted


def test_minhash_recall_precision_vs_exact_jaccard(ray_session, graded_corpus):
    """MinHash-LSH at threshold 0.5 must (a) recover every planted pair whose
    EXACT shingle Jaccard is comfortably above threshold, and (b) report no
    pair whose exact Jaccard is far below it — recall AND precision against
    the exact kernel, not just 'returns rows'."""
    import ray.data

    tbl, planted = graded_corpus
    texts = {r["doc_id"]: r["text"] for r in tbl.to_pylist()}
    pairs = minhash_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.5
    ).to_pandas()
    found = {tuple(sorted(p)) for p in pairs[["a", "b"]].to_numpy()}

    strong = [
        (a, b) for a, b, _ in planted
        if ngram_jaccard(texts[a], texts[b]) >= 0.7
    ]
    assert strong, "corpus must plant strong pairs"
    recall = sum((a, b) in found for a, b in strong) / len(strong)
    assert recall >= 0.9, f"recall {recall} over {len(strong)} strong pairs"

    # precision: every reported pair is genuinely similar (est_jaccard is a
    # 64-hash estimate; allow its sampling noise below the 0.5 threshold)
    for a, b in found:
        jac = ngram_jaccard(texts[a], texts[b])
        assert jac >= 0.3, f"false positive pair ({a},{b}) exact jaccard {jac}"


def test_simhash_pairs_exactly_match_bruteforce_hamming(ray_session, graded_corpus):
    """Pigeonhole guarantee: on a corpus with no truncated buckets, the
    reported pairs must be EXACTLY the set with Hamming(simhash) <= 3."""
    import itertools

    import ray.data

    from b_pdf_parser_ray.functions.dedup import SimHasher

    tbl, _ = graded_corpus
    rows = tbl.to_pylist()
    sh = SimHasher()
    sigs = {r["doc_id"]: sh.simhash(r["text"]) for r in rows}

    def ham(x, y):
        return bin(x ^ y).count("1")

    want = {
        tuple(sorted((a, b)))
        for a, b in itertools.combinations(sigs, 2)
        if ham(sigs[a], sigs[b]) <= 3
    }
    got_df = simhash_pairs(ray.data.from_arrow(tbl), max_hamming=3).to_pandas()
    got = {tuple(sorted(p)) for p in got_df[["a", "b"]].to_numpy()}
    assert want, "corpus must contain close simhash pairs"
    assert got == want
    # reported distances are the true distances
    for _, r in got_df.iterrows():
        assert r["hamming"] == ham(sigs[r["a"]], sigs[r["b"]])


def test_fingerprint_goldens(ray_session):
    """Pin the fingerprint function to golden values: any change to the
    rolling-hash constants, token hashing, or tokenization breaks this."""
    from b_pdf_parser_ray.functions.textstats import fingerprint_batch

    batch = pa.Table.from_pylist(
        [
            {"doc_id": 1, "text": "alpha beta gamma delta alpha beta"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "alpha beta gamma delta alpha  beta"},
        ]
    )
    out = fingerprint_batch(batch).to_pylist()
    assert out[0]["fingerprint"] == "8154a13e11f71a8c"
    assert out[1]["fingerprint"] == "4bc51d1bf278056b"
    # whitespace is significant (double space tokenizes differently)
    assert out[2]["fingerprint"] != out[0]["fingerprint"]


def test_ngram_verify_both_plans_agree(ray_session, dup_corpus, tmp_path):
    """dedup_ngram_verify is size-gated: the broadcast plan (candidate texts
    fetched + broadcast) and the hash plan (two partitioned Dataset.joins)
    must produce identical verified pairs.  max_broadcast_docs=0 forces the
    hash plan the way tests pin the joins planner."""
    import pandas as pd
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import dedup_ngram_verify

    pq.write_table(dup_corpus, tmp_path / "documents.parquet")
    sf = str(tmp_path)

    def run(**kw):
        out = dedup_ngram_verify(sf, threshold=0.5, **kw)
        if not isinstance(out, pa.Table):
            out = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
        return (
            out.to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    bcast = run()
    hash_ = run(max_broadcast_docs=0)
    assert len(bcast) > 0  # planted dups must verify
    found = {tuple(p) for p in bcast[["doc_a", "doc_b"]].to_numpy()}
    assert (0, 100) in found and (0, 101) in found and (100, 101) in found
    pd.testing.assert_frame_equal(bcast, hash_, check_dtype=False)


def test_ivf_partitioned_search_prunes_to_probe_dirs(ray_session, tmp_path):
    """write_index + search_partitioned must (a) read ONLY the probed
    cluster directories, (b) scan strictly less than the corpus, and
    (c) keep recall vs brute force."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    rng = np.random.RandomState(9)
    centers = rng.normal(size=(8, 64)) * 3
    vecs = np.concatenate([c + rng.normal(size=(40, 64)) for c in centers])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    q = vecs[5]

    index = IVFIndex.train(ds, n_clusters=8, sample_fraction=0.5)
    index_dir = str(tmp_path / "ivf")
    index.write_index(ds, index_dir)

    # (a) probe paths are exactly the existing dirs of the probed clusters
    probe = index.probe_clusters(q, nprobe=3)
    paths = IVFIndex.probe_paths(index_dir, probe)
    assert paths and all(
        os.path.basename(p) in {f"cluster={c}" for c in probe} for p in paths
    )
    all_dirs = {d for d in os.listdir(index_dir) if d.startswith("cluster=")}
    assert len(all_dirs) > len(paths)  # unprobed partitions exist and are skipped

    # (b) rows under the probed dirs (parquet footers) < corpus rows
    def dir_rows(d):
        return sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    scanned = sum(dir_rows(p) for p in paths)
    assert 0 < scanned < len(vecs)

    # (c) recall against brute force
    brute = set(topk_cosine(ds, q, k=10).to_pandas()["vec_id"])
    approx = set(
        index.search_partitioned(index_dir, q, k=10, nprobe=3).to_pandas()["vec_id"]
    )
    assert len(brute & approx) / 10 >= 0.8


def test_jaccard_pairs_survive_fully_filtered_blocks(ray_session, tmp_path):
    """A parquet fragment whose doc_ids all miss the sample (doc_id % MOD
    != 0) reaches the driver as a schema-less empty block (Ray skips map
    UDFs on empties) — the collection must drop those instead of crashing
    concat_tables, and an entirely-missed corpus must return the empty
    pairs table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.queries import (
        JACCARD_SAMPLE_MOD,
        dedup_cluster_docs,
        dedup_jaccard_pairs,
    )

    d = tmp_path / "documents.parquet"
    os.makedirs(d)
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    # fragment 0: no sampled ids at all; fragment 1: two near-identical
    # sampled docs (both % MOD == 0)
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": [text + "one", text + "two", text]}),
        d / "part0.parquet",
    )
    m = JACCARD_SAMPLE_MOD
    pq.write_table(
        pa.table({"doc_id": [m, 2 * m], "text": [text, text + " tail"]}),
        d / "part1.parquet",
    )
    got = dedup_jaccard_pairs(str(tmp_path)).to_pandas()
    assert {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])} == {(m, 2 * m)}

    clusters = dedup_cluster_docs(str(tmp_path)).to_pandas()
    assert sorted(clusters["doc_id"]) == [m, 2 * m]
    assert set(clusters["cluster_size"]) == {2}

    # corpus with zero sampled docs: empty result, not a crash
    d2 = tmp_path / "empty_case"
    os.makedirs(d2)
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [text, text]}),
        d2 / "documents.parquet",
    )
    assert dedup_jaccard_pairs(str(d2)).num_rows == 0


def test_ivf_refine_monotone_objective(ray_session):
    """Distributed spherical-k-means refinement must not decrease the
    Σ max-cosine objective (argmax assignment and normalized-mean update
    are each non-decreasing), and a refined index keeps working."""
    import ray.data

    rng = np.random.RandomState(11)
    centers = rng.normal(size=(6, 32)) * 3
    vecs = np.concatenate([c + rng.normal(size=(50, 32)) for c in centers])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    # deliberately under-trained: tiny sample, one iteration
    index = IVFIndex.train(ds, n_clusters=6, sample_fraction=0.1, iters=1)
    before = index.objective(ds)
    obj = before
    for _ in range(3):
        index.refine(ds, iters=1)
        nxt = index.objective(ds)
        assert nxt >= obj - 1e-9, f"objective decreased: {obj} -> {nxt}"
        obj = nxt
    assert obj >= before - 1e-9

    q = vecs[7]
    got = index.search(index.assign(ds), q, k=5, nprobe=3).to_pandas()
    assert len(got) == 5


def test_semantic_dedup_finds_planted_keep_first(ray_session):
    import ray.data

    from b_pdf_parser_ray.functions.dedup import semantic_dedup

    rng = np.random.RandomState(13)
    # 4 well-separated k-means clusters; intra-cluster noise large enough
    # that ordinary cluster-mates stay well below the 0.95 cosine threshold
    centers = rng.normal(size=(4, 64)) * 3
    vecs = np.concatenate([c + rng.normal(size=(30, 64)) * 2.0 for c in centers])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    # plant: 200 ≈ 5 (tiny noise), 201 == 17 exactly, 202 ≈ 5 again (chain)
    rows.append({"vec_id": 200, "embedding": (vecs[5] + rng.normal(scale=0.01, size=64)).tolist()})
    rows.append({"vec_id": 201, "embedding": vecs[17].tolist()})
    rows.append({"vec_id": 202, "embedding": (vecs[5] + rng.normal(scale=0.01, size=64)).tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    drops = semantic_dedup(ds, n_clusters=4, eps=0.05).to_pandas()
    by_dup = {int(r.dup_id): int(r.kept_id) for r in drops.itertuples()}
    # keep-first: the lowest id of each semantic group survives, later
    # members are dropped and point back at it
    assert by_dup.get(200) == 5
    assert by_dup.get(201) == 17
    assert by_dup.get(202) == 5
    assert 5 not in by_dup and 17 not in by_dup
    # no false positives among ordinary cluster-mates
    assert set(by_dup) == {200, 201, 202}
    assert not drops["truncated"].any()


def test_semantic_dedup_truncates_oversized_cluster(ray_session):
    import ray.data

    from b_pdf_parser_ray.functions.dedup import semantic_dedup

    rng = np.random.RandomState(21)
    base = rng.normal(size=64)
    # 30 near-identical vectors in one cluster, cap at 10: the kernel must
    # truncate (flagging it) instead of scanning the full O(n^2) block
    rows = [
        {"vec_id": i, "embedding": (base + rng.normal(scale=0.001, size=64)).tolist()}
        for i in range(30)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    drops = semantic_dedup(ds, n_clusters=1, eps=0.05, max_cluster=10).to_pandas()
    assert len(drops) == 9  # ids 1..9 all dup of 0 within the truncated head
    assert drops["truncated"].all()
    assert set(drops["dup_id"]) == set(range(1, 10))
    assert (drops["kept_id"] == 0).all()


def test_pca_project_full_rank_is_isometry(ray_session):
    import ray.data

    from b_pdf_parser_ray.functions.ann import pca_project

    rng = np.random.RandomState(31)
    dim, n = 16, 200
    X = rng.normal(size=(n, dim)) * rng.uniform(0.5, 3.0, size=dim)
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(n)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    out = pca_project(ds, n_components=dim).to_pandas().sort_values("vec_id")
    P = np.stack(out["pca"].to_numpy())
    # full-rank PCA is a rotation of centered data: pairwise distances match
    ii = rng.choice(n, 50)
    jj = rng.choice(n, 50)
    d_orig = np.linalg.norm(X[ii] - X[jj], axis=1)
    d_proj = np.linalg.norm(P[ii] - P[jj], axis=1)
    np.testing.assert_allclose(d_proj, d_orig, atol=1e-4)
    # projected covariance is diagonal with non-increasing diagonal = top
    # eigenvalues of the directly-computed covariance
    C = np.cov(P, rowvar=False, bias=True)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-6
    evals = np.sort(np.linalg.eigvalsh(np.cov(X, rowvar=False, bias=True)))[::-1]
    np.testing.assert_allclose(np.diag(C), evals, atol=1e-5)
    assert (np.diff(np.diag(C)) <= 1e-9).all()


def test_pca_project_truncated_and_deterministic(ray_session):
    import ray.data

    from b_pdf_parser_ray.functions.ann import pca_project

    rng = np.random.RandomState(37)
    X = rng.normal(size=(150, 16)) * np.linspace(3.0, 0.1, 16)
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(150)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    a = pca_project(ds, n_components=4).to_pandas().sort_values("vec_id")
    b = pca_project(ds, n_components=4).to_pandas().sort_values("vec_id")
    Pa = np.stack(a["pca"].to_numpy())
    Pb = np.stack(b["pca"].to_numpy())
    assert Pa.shape == (150, 4)
    np.testing.assert_array_equal(Pa, Pb)  # bit-identical across runs
    # top-4 projected variance matches the top-4 covariance eigenvalues
    evals = np.sort(np.linalg.eigvalsh(np.cov(X, rowvar=False, bias=True)))[::-1][:4]
    np.testing.assert_allclose(
        np.var(Pa, axis=0), evals, rtol=1e-4
    )


def test_exact_dedup_salted_equals_sort_exchange_plan(ray_session, dup_corpus):
    """The salted hash-grain plan and the any-cardinality sort-exchange
    fallback (forced via a past-cap P) must agree row-for-row."""
    import ray

    from b_pdf_parser_ray.functions import dedup as dmod

    ds = ray.data.from_arrow(dup_corpus)
    fast = (
        exact_dedup(ds, num_partitions=16).to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    slow = (
        exact_dedup(ds, num_partitions=dmod._SALTED_DEDUP_MAX_P * 2)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        fast[["doc_id", "n_copies"]].astype("int64"),
        slow[["doc_id", "n_copies"]].astype("int64"),
    )


def test_minhash_lsh_verify_plans_agree(ray_session, graded_corpus, monkeypatch):
    """Round-5 two-phase LSH: the broadcast verify (sig matrix ray.put) and
    the past-the-gate verify (size-gated sig-blob joins, forced with cap=0)
    must produce the IDENTICAL pair set, est values and truncated flags —
    the exchange got 22x lighter, the answer must not move."""
    import pandas as pd
    import ray.data

    import b_pdf_parser_ray.functions.joins as joins

    tbl, _ = graded_corpus
    a = (
        minhash_lsh_pairs(ray.data.from_arrow(tbl), threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    monkeypatch.setattr(joins, "BROADCAST_MAX_SOURCE_ROWS", 0)
    b = (
        minhash_lsh_pairs(ray.data.from_arrow(tbl), threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a[["a", "b", "est_jaccard", "truncated"]],
        b[["a", "b", "est_jaccard", "truncated"]],
        check_dtype=False,
    )


def test_embedding_near_dups_verify_plans_agree(ray_session, monkeypatch):
    """Round-5 two-phase embedding LSH: broadcast verify vs forced-gate
    (cap=0) blob-join verify must produce identical pairs and cosines."""
    import pandas as pd
    import ray.data

    import b_pdf_parser_ray.functions.joins as joins
    from b_pdf_parser_ray.functions.dedup import embedding_near_dups

    rng = np.random.RandomState(9)
    base = rng.normal(size=(60, 64))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
    for j in range(8):  # planted near-dups
        rows.append({
            "vec_id": 200 + j,
            "embedding": (base[j] + rng.normal(scale=0.01, size=64)).tolist(),
        })
    tbl = pa.Table.from_pylist(rows)
    a = (
        embedding_near_dups(ray.data.from_arrow(tbl), threshold=0.9)
        .to_pandas().sort_values(["a", "b"], ignore_index=True)
    )
    monkeypatch.setattr(joins, "BROADCAST_MAX_SOURCE_ROWS", 0)
    b = (
        embedding_near_dups(ray.data.from_arrow(tbl), threshold=0.9)
        .to_pandas().sort_values(["a", "b"], ignore_index=True)
    )
    assert len(a) >= 8
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
