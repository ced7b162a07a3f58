"""Distributed connected components vs a driver-side union-find oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from b_pdf_parser_ray.functions.dedup import connected_components


def union_find_labels(n_nodes, edges):
    """Reference: min-id component labels by plain union-find."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label = root (root is the min id because
    # unions always hang the larger root under the smaller)
    return {v: find(v) for v in range(n_nodes)}


def run_cc(edges, n_nodes, **kw):
    edge_tbl = pa.table(
        {
            "a": pa.array([a for a, _ in edges], type=pa.int64()),
            "b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    nodes_tbl = pa.table({"node": pa.array(range(n_nodes), type=pa.int64())})
    out = connected_components(
        ray.data.from_arrow(edge_tbl),
        nodes_ds=ray.data.from_arrow(nodes_tbl),
        **kw,
    ).to_pandas()
    return dict(zip(out["node"], out["component"]))


# gate=None → driver-side vectorized union-find; gate=0 → the distributed
# alternating-star rounds.  Both plans must produce identical labels.
GATES = [None, 0]


@pytest.mark.parametrize("gate", GATES)
@pytest.mark.parametrize("seed", [0, 1])
def test_random_graph_matches_union_find(ray_session, seed, gate):
    rng = np.random.default_rng(seed)
    n = 120
    m = int(rng.integers(40, 140))
    edges = [tuple(sorted(rng.integers(0, n, 2))) for _ in range(m)]
    edges = [(int(a), int(b)) for a, b in edges if a != b]
    want = union_find_labels(n, edges)
    got = run_cc(edges, n, num_partitions=8, max_driver_edges=gate)
    assert got == want


@pytest.mark.parametrize("gate", GATES)
def test_path_graph_worst_case(ray_session, gate):
    """A long path maximizes star-algorithm rounds (O(log n) here)."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = run_cc(edges, n, num_partitions=4, max_driver_edges=gate)
    assert got == {v: 0 for v in range(n)}


@pytest.mark.parametrize("gate", GATES)
def test_two_cliques_and_singletons(ray_session, gate):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    got = run_cc(edges, 20, num_partitions=4, max_driver_edges=gate)
    for v in range(5):
        assert got[v] == 0
    for v in range(10, 14):
        assert got[v] == 10
    for v in list(range(5, 10)) + list(range(14, 20)):
        assert got[v] == v


def test_empty_edges_all_singletons(ray_session):
    got = run_cc([], 7, num_partitions=4)
    assert got == {v: v for v in range(7)}


def test_self_loops_and_duplicate_edges_ignored(ray_session):
    edges = [(3, 3), (1, 2), (2, 1), (1, 2), (4, 4)]
    got = run_cc(edges, 5, num_partitions=4)
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4}


def test_near_keep_composition_on_planted_corpus(ray_session):
    """MinHash pairs → connected components → keep-min-per-cluster must
    keep exactly one representative per planted dup family (the min id)
    and every unrelated doc.  Transitivity matters: 0≈100≈101 must
    collapse to ONE cluster even if a band misses one pair."""
    import random

    from b_pdf_parser_ray.functions.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from b_pdf_parser_ray.functions.joins import anti_join

    WORDS = [f"w{i}" for i in range(300)]
    rng = random.Random(5)
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(WORDS) for _ in range(60))}
        for i in range(40)
    ]
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[0]["text"]})
    toks = rows[1]["text"].split()
    toks[3] = "w0"
    toks[40] = "w1"
    rows.append({"doc_id": 200, "text": " ".join(toks)})
    docs = ray.data.from_arrow(pa.Table.from_pylist(rows))

    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_partitions=8)
    labels = connected_components(pairs, a_col="a", b_col="b", node_col="doc_id")
    drops = labels.map_batches(
        lambda t: t.filter(
            __import__("pyarrow.compute", fromlist=["x"]).not_equal(
                t.column("doc_id"), t.column("component")
            )
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    kept = anti_join(
        docs.select_columns(["doc_id"]), drops, "doc_id", "doc_id",
        right_source_rows=len(rows),
    ).to_pandas()
    kept_ids = set(kept["doc_id"])
    assert 0 in kept_ids and 1 in kept_ids
    assert {100, 101, 200}.isdisjoint(kept_ids)
    assert set(range(2, 40)) <= kept_ids
    assert len(kept_ids) == 40


def test_streaming_dedup_index_marks_exactly_one_per_group(ray_session):
    """The sharded mutable index must keep exactly ONE representative per
    distinct content (which one is arrival-order dependent; the count and
    the marking invariants are not)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from b_pdf_parser_ray.state.dedup_index import (
        StreamingDedupMarker,
        make_shards,
        streaming_dedup_counts,
    )

    texts = [f"document body {i % 40}" for i in range(400)]  # 10 copies each
    tbl = pa.table({"doc_id": pa.array(range(400), type=pa.int64()), "text": texts})
    ds = ray.data.from_arrow(tbl).repartition(8)

    shards = make_shards(4)
    marker = StreamingDedupMarker(shards, text_col="text")
    marked = ds.map_batches(marker, batch_format="pyarrow").to_pandas()
    assert len(marked) == 400
    per_hash = marked.groupby("content_hash")["is_first"].sum()
    assert len(per_hash) == 40 and (per_hash == 1).all()

    # retry idempotency: re-marking the SAME rows against the already-
    # populated index must reproduce is_first exactly (a membership-set
    # index would flip every row to False — the lost-representative bug)
    remarked = ds.map_batches(marker, batch_format="pyarrow").to_pandas()
    a = marked.sort_values("doc_id", ignore_index=True)
    b = remarked.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)

    r = streaming_dedup_counts(
        ray.data.from_arrow(tbl).repartition(8), n_shards=4
    )
    assert r == {"n_docs": 400, "n_unique": 40, "index_size": 40}


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training
# ---------------------------------------------------------------------------


def _bpe_reference(texts, num_merges):
    """Hand-rolled classic BPE over raw texts (independent of the module's
    own local path: its own word counting, symbolization, and merge loop)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    seqs = {w: list(w[:-1]) + [w[-1] + "</w>"] for w in words}
    merges = []
    for step in range(num_merges):
        pairs = Counter()
        for w, n in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, n))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return pd.DataFrame(
        merges, columns=["step", "left", "right", "merged", "pair_count"]
    )


BPE_TEXTS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new",
    "the cat sat on the mat the cat sat",
    "aaa aaa aaa ab ab ba",
]


def _bpe_docs_ds():
    return ray.data.from_arrow(
        pa.table({"doc_id": [f"d{i}" for i in range(len(BPE_TEXTS))],
                  "text": pa.array(BPE_TEXTS)})
    )


@pytest.mark.parametrize("gate", [None, 0])
def test_bpe_train_matches_reference_both_paths(ray_session, gate, monkeypatch):
    """Local (driver) path and forced-distributed path (cap=0) both equal an
    independent hand-rolled classic BPE, merge for merge, count for count —
    including the overlapping-pair ('aaa') and tie-break cases."""
    from b_pdf_parser_ray.functions import bpe

    if gate is not None:
        monkeypatch.setattr(bpe, "BPE_LOCAL_CAP_ROWS", gate)
    got = bpe.bpe_train(_bpe_docs_ds(), num_merges=8).reset_index(drop=True)
    want = _bpe_reference(BPE_TEXTS, 8)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_first_merge_is_global_max_pair(ray_session):
    """Ground truth on the real sf0.001 corpus: the first learned merge is
    the globally most frequent adjacent character pair."""
    import pyarrow.parquet as pq
    from collections import Counter

    from b_pdf_parser_ray.queries import corpus_bpe_train

    got = corpus_bpe_train("/root/testdata/sf0.001", num_merges=1)
    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    pairs = Counter()
    for t in texts:
        for w in t.split(" "):
            if not w:
                continue
            s = list(w[:-1]) + [w[-1] + "</w>"]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += 1
    (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["left"], row["right"], int(row["pair_count"])) == (l, r, n)
    assert row["merged"] == l + r


def test_bpe_num_merges_exhaustion(ray_session):
    """Asking for more merges than exist stops cleanly (single repeated
    word collapses to one symbol after len-1 merges)."""
    from b_pdf_parser_ray.functions.bpe import bpe_train

    ds = ray.data.from_arrow(pa.table({"text": ["ab ab ab"]}))
    got = bpe_train(ds, num_merges=10)
    # 'ab' → ['a', 'b</w>'] → one possible merge only
    assert len(got) == 1
    assert list(got["merged"]) == ["ab</w>"]


def test_bpe_apply_matches_python_encode(ray_session):
    """bpe_apply's per-doc token counts equal a pure-Python rank-based
    encode of every word, on the real sf0.001 corpus with real learned
    merges (memo + index_in broadcast must not change semantics)."""
    import pyarrow.parquet as pq

    from b_pdf_parser_ray.functions.bpe import _encode_word, _symbolize, bpe_apply, bpe_train
    from b_pdf_parser_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    merges = bpe_train(read_table(sf, "documents", columns=["text"]), num_merges=6)
    ranks = {(l, r): i for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))}
    got = (
        bpe_apply(read_table(sf, "documents", columns=["doc_id", "text"]), merges)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for d, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        words = t.split(" ")
        want[d] = (len(words), sum(len(_encode_word(w, ranks)) for w in words))
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert (row["n_words"], row["n_bpe_tokens"]) == want[row["doc_id"]], row["doc_id"]
    # merges really compress: fewer tokens than raw symbols for some doc
    raw = {d: sum(len(_symbolize(w)) for w in t.split(" "))
           for d, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())}
    assert any(want[d][1] < raw[d] for d in want)


def test_grouped_agg_small_keys_plan_matches_exchange(ray_session):
    """The no-exchange small-keys plan (coalescing re-reduce +
    repartition(1) single-task combine) must produce exactly the exchange
    plan's result — sum/count/min/max/mean, multi-key, and an input sized
    to span many blocks so the final combine really merges partials."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from b_pdf_parser_ray.functions.agg import grouped_agg

    rng = np.random.default_rng(7)
    n = 50_000
    t = pa.table({
        "k1": rng.integers(0, 5, n),
        "k2": rng.integers(0, 3, n),
        "v": rng.normal(size=n),
    })
    ds = ray.data.from_arrow(t).repartition(37)
    specs = [
        ("v", "sum", "s"), (None, "count", "c"),
        ("v", "min", "lo"), ("v", "max", "hi"), ("v", "mean", "mu"),
    ]

    def norm(df):
        return df.sort_values(["k1", "k2"], ignore_index=True)

    a = norm(grouped_agg(ds, ["k1", "k2"], specs).to_pandas())
    b = norm(grouped_agg(ds, ["k1", "k2"], specs, max_groups=64).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_like=True)

    # empty input: both plans yield zero rows without crashing
    empty = ray.data.from_arrow(t.slice(0, 0))
    assert len(grouped_agg(empty, ["k1"], [("v", "sum", "s")],
                           max_groups=64).to_pandas()) == 0
