"""Deduplication operators — exact and near-duplicate — Ray-Data-first.

These are the corpus-scale versions of the patterns in ray_guide.md
('Exact dedup', 'Near-dup MinHash-LSH'):

* exact:      content-hash inside map_batches → groupby(hash) → first per
              group.  The shuffle moves one short hash + id per row, never
              the text.
* MinHash+LSH: shingle → k minhashes → band rows (band_id, band_hash,
              doc_id) → groupby(band) → candidate pairs within buckets →
              signature-estimated Jaccard filter.  Shuffle payload =
              bands × 16 bytes per doc.
* SimHash:    64-bit simhash → 4×16-bit bands → groupby(band) → candidate
              pairs → Hamming-distance filter on full signatures.
* n-gram Jaccard: exact verification kernel for candidate pairs.
* embedding near-dup: random-hyperplane LSH buckets → within-bucket cosine.

All candidate generation is distributed; only confirmed pairs (a tiny
result at any realistic dup rate) reach the driver.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import token_hash64

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a 16-byte hex content hash per row."""
    hashes = [
        hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(hashes, type=pa.string()))


def window_hashes(
    texts, width: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-window 64-bit hashes for every ``width``-token sliding window
    (stride 1) across a column of document texts — the shared kernel of
    the ExactSubstr operators (`dedup_repeated_windows` /
    `dedup_substring_cut`), single-sourcing the hash definition with
    ``token_hash64`` + ``_pos_consts``.

    NULL text is treated as ``""`` (one empty token — too short to
    window), matching the operators' oracles.  Returns ``None`` when the
    batch has no window, else ``(whash, doc_idx, start)`` numpy arrays:
    the window hash, the batch-row index of its document, and its 0-based
    token start within that document.  Vectorized: one blake2b per unique
    token (``dictionary_encode``), position-weighted xor combine, doc
    boundaries masked via ``list_parent_indices``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tok_lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
    flat = tok_lists.flatten()
    if len(flat) < width:
        return None
    parent = pc.list_parent_indices(tok_lists).to_numpy()
    enc = flat.dictionary_encode()
    vocab_hash = np.fromiter(
        (token_hash64(t) for t in enc.dictionary.to_pylist()),
        np.uint64,
        len(enc.dictionary),
    )
    th = vocab_hash[enc.indices.to_numpy()]
    n_win = len(th) - width + 1
    consts = _pos_consts(width)
    with np.errstate(over="ignore"):
        acc = np.zeros(n_win, dtype=np.uint64)
        for k in range(width):
            acc ^= th[k : k + n_win] * consts[k]
    valid = parent[:n_win] == parent[width - 1 :]
    if not valid.any():
        return None
    doc_idx = parent[:n_win][valid]
    doc_first = np.zeros(len(tok_lists), dtype=np.int64)
    np.cumsum(
        pc.list_value_length(tok_lists).to_numpy().astype(np.int64)[:-1],
        out=doc_first[1:],
    )
    start = np.nonzero(valid)[0] - doc_first[doc_idx]
    return acc[valid], doc_idx, start


# hex-prefix value sets for the vectorized salt decode, keyed by width
_HEX_PREFIX: Dict[int, "pa.Array"] = {}

# above this P the salted plan's per-partition frame bound is unprovable
# from one 16-bit salt — fall back to the any-cardinality sort exchange
_SALTED_DEDUP_MAX_P = 65_536


def _hash_salt(col, num_partitions: int):
    """Salt partition from a hex content hash's leading 1-2 bytes —
    blake2b output is uniform, so the prefix splits evenly; ``index_in``
    against the 16^n prefixes is the vectorized hex decode."""
    n = 2 if num_partitions <= 256 else 4
    vs = _HEX_PREFIX.get(n)
    if vs is None:
        vs = _HEX_PREFIX[n] = pa.array([format(i, f"0{n}x") for i in range(16 ** n)])
    byte = pc.index_in(pc.utf8_slice_codeunits(col, 0, n), value_set=vs)
    return pc.cast(
        pc.bit_wise_and(pc.cast(byte, pa.int32()), num_partitions - 1), pa.int32()
    )


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                num_partitions: Optional[int] = None,
                source_rows: Optional[int] = None):
    """One representative (min id) + copy count per distinct text.

    ONE salted hash-grain exchange: per-block Arrow partials pre-reduce to
    (content_hash, min id, count), salt by the 128-bit hash's leading
    bytes & (P-1) — a hash never splits across salt partitions, so the
    in-partition min/sum are globally final and no key-grain sort
    exchange is needed.  The shuffle never carries document bodies.

    Size-gated like the join planner: P derives from ``source_rows``
    (footer metadata — ``sources.tables.salted_partitions``) so one
    partition-group stays worker-sized; past ``_SALTED_DEDUP_MAX_P``
    (16-bit salt, ~10^11 rows at the 2M-row partition target) the plan
    falls back to Ray's any-cardinality sort-exchange groupby — never a
    wrong answer, the salted plan is the common-case fast path.
    """
    from ray.data.aggregate import Count, Min

    from ..sources.tables import salted_partitions

    if num_partitions is None:
        num_partitions = (
            salted_partitions(source_rows) if source_rows is not None else 64
        )
    if num_partitions > _SALTED_DEDUP_MAX_P:
        hashed = ds.map_batches(
            lambda b: content_hash_batch(b, text_col).select([id_col, "content_hash"]),
            batch_format="pyarrow",
        )
        return (
            hashed.groupby("content_hash")
            .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
            .select_columns([id_col, "n_copies"])
        )
    if num_partitions & (num_partitions - 1):
        raise ValueError(f"num_partitions must be a power of two, got {num_partitions}")

    def partial(b: pa.Table) -> pa.Table:
        t = content_hash_batch(b, text_col).select([id_col, "content_hash"])
        out = t.group_by(["content_hash"], use_threads=False).aggregate(
            [(id_col, "min"), ([], "count_all")]
        )
        out = out.rename_columns(["content_hash", id_col, "n_copies"])
        return out.append_column(
            "part", _hash_salt(out.column("content_hash"), num_partitions)
        )

    def combine(g: "pd.DataFrame") -> "pd.DataFrame":
        out = (
            g.groupby("content_hash", as_index=False)
            .agg({id_col: "min", "n_copies": "sum"})
        )
        return out[[id_col, "n_copies"]].astype({"n_copies": "int64"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: combine(g.drop(columns=["part"])), batch_format="pandas"
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _pos_consts(width: int) -> np.ndarray:
    """Deterministic odd 64-bit mixing constants, one per shingle position."""
    rng = np.random.RandomState(width * 1_000_003 + 17)
    c = rng.randint(1, 1 << 62, size=width).astype(np.uint64)
    return (c << np.uint64(1)) | np.uint64(1)


def shingle_hashes(
    text: str, width: int = 3, token_cache: Optional[Dict[str, int]] = None
) -> np.ndarray:
    """Hashes of word w-shingles (order-sensitive n-grams), vectorized:
    one blake2b per *unique token* (memoized via ``token_cache``), then the
    w-gram hash is a position-weighted xor combine over a numpy window —
    no per-shingle Python or hashing."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if token_cache is None:
        th = np.fromiter((token_hash64(t) for t in toks), np.uint64, len(toks))
    else:
        get, put = token_cache.get, token_cache.setdefault
        th = np.fromiter(
            (get(t) or put(t, token_hash64(t)) for t in toks), np.uint64, len(toks)
        )
    consts = _pos_consts(width)
    with np.errstate(over="ignore"):
        if len(toks) < width:
            return np.array(
                [np.bitwise_xor.reduce(th * consts[: len(toks)])], dtype=np.uint64
            )
        n_sh = len(toks) - width + 1
        acc = np.zeros(n_sh, dtype=np.uint64)
        for k in range(width):
            acc ^= th[k : k + n_sh] * consts[k]
    return np.unique(acc)


class MinHasher:
    """Actor-state minhash signatures: hash params built once per actor."""

    def __init__(self, num_hashes: int = 64, shingle_width: int = 3, seed: int = 7):
        self.a, self.b = _minhash_params(num_hashes, seed)
        self.num_hashes = num_hashes
        self.width = shingle_width
        # vocab ≪ token stream, but unbounded growth would leak on a long
        # worker lifetime — reset past the cap (refill is cheap)
        self.token_cache: Dict[str, int] = {}
        self.cache_cap = 1_000_000

    def signature(self, text: str) -> np.ndarray:
        if len(self.token_cache) > self.cache_cap:
            self.token_cache.clear()
        sh = shingle_hashes(text, self.width, self.token_cache)
        if len(sh) == 0:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (h*a + b) mod p, min over shingles — vectorized outer product
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    # amortize the (H × shingles) pass across whole batches, chunked so the
    # intermediate never exceeds ~num_hashes × chunk_shingles × 8 B (~128 MB)
    _CHUNK_SHINGLES = 262_144

    def signatures(self, texts) -> np.ndarray:
        """(n, num_hashes) signature matrix for a batch of texts in chunked
        2-D passes — identical values to per-doc ``signature`` (same
        arithmetic), ~3× faster than the per-document outer-product loop
        because the minhash transform runs over concatenated shingles with
        one ``np.minimum.reduceat`` per chunk."""
        if len(self.token_cache) > self.cache_cap:
            self.token_cache.clear()
        n = len(texts)
        out = np.full((n, self.num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
        sh_list = [shingle_hashes(t or "", self.width, self.token_cache) for t in texts]
        lens = np.fromiter((len(s) for s in sh_list), np.int64, n)
        nonempty = np.nonzero(lens)[0]
        p = np.uint64(_MERSENNE)
        start = 0
        while start < len(nonempty):
            # grow the chunk doc-by-doc up to the shingle budget
            end, tot = start, 0
            while end < len(nonempty) and (tot == 0 or tot + lens[nonempty[end]] <= self._CHUNK_SHINGLES):
                tot += lens[nonempty[end]]
                end += 1
            idx = nonempty[start:end]
            sh = np.concatenate([sh_list[i] for i in idx])
            starts = np.r_[0, np.cumsum(lens[idx])[:-1]]
            vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % p  # (H, tot)
            out[idx, :] = np.minimum.reduceat(vals, starts, axis=1).T
            start = end
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch.column("text").to_pylist())
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(list(sigs), type=pa.list_(pa.uint64())),
            ],
            names=["doc_id", "minhash"],
        )


def _sig_matrix(batch: pa.Table) -> np.ndarray:
    """(n, num_hashes) uint64 signature matrix from the list<uint64>
    ``minhash`` column — flatten+reshape, no per-row Python lists."""
    col = batch.column("minhash")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.uint64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    return flat.reshape(n, -1)


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int) -> pa.Table:
    """Explode signatures to (doc_id, band_id, band_hash) rows — KEYS ONLY.

    Vectorized: band hashes are a position-weighted xor combine over the
    (n, bands, rows_per_band) signature tensor — no per-band Python/hashing.
    ``band_hash`` is int64 (cheap groupby key vs the former hex string).

    Round-5 scale fix: this stage used to carry the full signature blob on
    EVERY band row (bands × num_hashes × 8 B ≈ 8.6 KB/doc at the 64/16
    defaults — 2× the text itself through the bucket exchange, measured
    OutOfDisk at 10M docs × 12 GB store).  Candidates are now generated
    from keys alone (~24 B/row) and the estimated-Jaccard filter moved to
    a verification join against the materialized signature table — the
    exchange shrinks ~22× and scales with corpus + true-pair output."""
    n = batch.num_rows
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], type=pa.string()), pa.array([], type=pa.int32()),
             pa.array([], type=pa.int64())],
            names=["doc_id", "band_id", "band_hash"],
        )
    sigs = _sig_matrix(batch)
    chunks = sigs.reshape(n, bands, rows_per_band)
    consts = _pos_consts(rows_per_band)
    with np.errstate(over="ignore"):
        bh = np.bitwise_xor.reduce(chunks * consts, axis=2)  # (n, bands)
    doc_rep = np.repeat(np.arange(n), bands)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id").take(pa.array(doc_rep)),
            pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            pa.array(bh.reshape(-1).view(np.int64)),
        ],
        names=["doc_id", "band_id", "band_hash"],
    )


def _bucket_candidates(group: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Unverified candidate pairs (a < b) within one LSH bucket.  Oversized
    buckets (degenerate content, e.g. empty docs) are truncated to the
    ``max_bucket`` smallest doc_ids — logged via the truncated flag rather
    than silently (same truncation set as the pre-round-5 in-bucket
    filter: smallest ids first)."""
    n = len(group)
    if n < 2:
        return pd.DataFrame({"a": [], "b": [], "truncated": []})
    truncated = n > max_bucket
    if truncated:
        group = group.sort_values("doc_id").head(max_bucket)
        n = max_bucket
    ids = np.sort(group["doc_id"].to_numpy())
    ii, jj = np.triu_indices(n, k=1)
    return pd.DataFrame(
        {"a": ids[ii], "b": ids[jj], "truncated": truncated}
    )


_MH_CACHE: Dict[tuple, "MinHasher"] = {}


def _minhash_batch(
    batch: pa.Table, num_hashes: int = 64, shingle_width: int = 3, seed: int = 7
) -> pa.Table:
    """Task-mode signature stage: the MinHasher (hash params + token-hash
    vocabulary cache) lives in a module-level per-worker-process cache, so
    reused Ray task workers keep it warm — and the stage fuses with the
    upstream read (no object-store hop)."""
    key = (num_hashes, shingle_width, seed)
    mh = _MH_CACHE.get(key)
    if mh is None:
        mh = _MH_CACHE[key] = MinHasher(num_hashes, shingle_width, seed)
    return mh(batch)


def _partition_candidates(
    group: pd.DataFrame, max_bucket: int = 200
) -> pd.DataFrame:
    """Unverified candidate pairs for ALL buckets inside one coarse
    partition.

    Singleton buckets (the overwhelming majority) are pruned with one
    vectorized ``duplicated`` pass before any per-bucket Python runs."""
    empty = pd.DataFrame({"a": [], "b": [], "truncated": []})
    dup = group[group.duplicated(["band_id", "band_hash"], keep=False)]
    if dup.empty:
        return empty
    outs = [
        _bucket_candidates(g, max_bucket)
        for _, g in dup.groupby(["band_id", "band_hash"], sort=False)
    ]
    outs = [o for o in outs if len(o)]
    return pd.concat(outs, ignore_index=True) if outs else empty


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    concurrency=None,
    num_partitions: int = 64,
):
    """Near-duplicate candidate pairs by MinHash-LSH.

    Pipeline: signatures (task pool, warm per-process params/vocab cache) →
    vectorized band explode → **salted shuffle**: buckets are grouped by
    ``band_hash % num_partitions`` (one Ray group per coarse partition, a
    pandas groupby over exact buckets inside) instead of one Ray group per
    bucket — per-group machinery over ~|docs|×bands tiny groups was the
    bottleneck (measured 2.7 s → this path at sf0.1).  Pair dedup (a pair
    can fire in several bands) is the final tiny groupby.

    ``num_partitions`` should scale ~with cluster cores; candidate buckets
    are tiny so partition skew is bounded by the salt.

    Round-5 two-phase shape (the 100-TB fix, OutOfDisk-measured at 10M
    docs with the old single-phase plan): the bucket exchange carries
    (doc_id, band_id, band_hash) KEY rows only (~24 B vs ~8.6 KB/doc with
    the signature blob on every band row); the signature table is computed
    ONCE, materialized (object-store blocks, spillable), and the
    estimated-Jaccard filter runs as a verification join of the deduped
    candidate pairs against it through the size-gated planner — cost
    scales with corpus + candidate output, never corpus × bands × sig.
    Pair set and est values are IDENTICAL to the single-phase plan: the
    same buckets yield the same candidates (same smallest-ids truncation),
    and est is a pure pair function, so filtering after dedup equals
    filtering in-bucket."""
    from ray.data.aggregate import Max

    from .joins import lookup_join

    rows_per_band = num_hashes // bands
    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        _minhash_batch,
        fn_kwargs={"num_hashes": num_hashes},
        batch_format="pyarrow",
    ).materialize()  # ONE signature computation: band explode + verify joins
    banded = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows_per_band), batch_format="pyarrow"
    )

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(b.column("band_hash"), num_partitions - 1), pa.int32()
        )
        return b.append_column("part", part)

    cands = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: _partition_candidates(g.drop(columns=["part"])),
            batch_format="pandas",
        )
        # a pair can fire in several bands — dedup BEFORE verification so
        # each pair's signatures ship and compare once
        .groupby(["a", "b"])
        .aggregate(Max("truncated", alias_name="truncated"))
    )

    n_docs = sigs.count()  # metadata-cheap on a materialized dataset

    def finish(b: pa.Table, sa: np.ndarray, sb: np.ndarray) -> pa.Table:
        est = (sa == sb).mean(axis=1) if len(sa) else np.empty(0)
        keep = est >= threshold
        out = b.filter(pa.array(keep))
        return pa.Table.from_arrays(
            [out.column("a"), out.column("b"),
             pa.array(est[keep], type=pa.float64()),
             out.column("truncated")],
            names=["a", "b", "est_jaccard", "truncated"],
        )

    from .joins import BROADCAST_MAX_SOURCE_ROWS, _collect_arrow

    if n_docs <= BROADCAST_MAX_SOURCE_ROWS:
        # broadcast verify: the materialized sig table collects WITHOUT a
        # new execution (refs already exist); one ray.put, est computed
        # inside the candidate map — zero extra streaming executions
        import ray

        from .broadcast import get_cached

        tbl = _collect_arrow(sigs)
        ids = tbl.column("doc_id").combine_chunks()
        ref = ray.put((ids, _sig_matrix(tbl)))

        def verify_broadcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return finish(b, np.empty((0, 0)), np.empty((0, 0)))
            ids_c, mat = get_cached(ref)
            ia = pc.index_in(b.column("a"), value_set=ids_c).to_numpy(
                zero_copy_only=False
            )
            ib = pc.index_in(b.column("b"), value_set=ids_c).to_numpy(
                zero_copy_only=False
            )
            return finish(b, mat[ia.astype(np.int64)], mat[ib.astype(np.int64)])

        return cands.map_batches(verify_broadcast, batch_format="pyarrow")

    # past the gate: verification joins through the size-gated planner —
    # (doc_id, sig blob) sides (binary survives the acero hash join, a
    # list<uint64> column would not); pairs are output-scale, the sig
    # exchange is corpus × num_hashes × 8 B, never × bands
    def blob_side(key_name: str, sig_name: str):
        def to_blobs(b: pa.Table) -> pa.Table:
            m = _sig_matrix(b)
            return pa.Table.from_arrays(
                [
                    b.column("doc_id"),
                    pa.array([m[i].tobytes() for i in range(len(m))],
                             type=pa.binary()),
                ],
                names=[key_name, sig_name],
            )

        return sigs.map_batches(to_blobs, batch_format="pyarrow")

    withsigs = lookup_join(
        lookup_join(
            cands, lambda: blob_side("doc_id", "sig_a"), "a", "doc_id",
            ["sig_a"], right_source_rows=n_docs,
        ),
        lambda: blob_side("doc_id", "sig_b"), "b", "doc_id",
        ["sig_b"], right_source_rows=n_docs,
    )

    def verify_joined(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return finish(b, np.empty((0, 0)), np.empty((0, 0)))
        sa = np.stack([
            np.frombuffer(x, dtype=np.uint64)
            for x in b.column("sig_a").to_pylist()
        ])
        sb = np.stack([
            np.frombuffer(x, dtype=np.uint64)
            for x in b.column("sig_b").to_pylist()
        ])
        return finish(b.drop_columns(["sig_a", "sig_b"]), sa, sb)

    return withsigs.map_batches(verify_joined, batch_format="pyarrow")


def ngram_jaccard(text_a: str, text_b: str, width: int = 3) -> float:
    """Exact n-gram Jaccard — the verification kernel for candidate pairs."""
    a, b = set(shingle_hashes(text_a, width)), set(shingle_hashes(text_b, width))
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over whitespace tokens (weights = term counts).

    Batched across documents: the count-weighted sum over UNIQUE tokens
    equals the plain sum over all token OCCURRENCES, so the whole batch's
    token stream becomes one (total_tokens × 64) ±1 bit matrix reduced per
    document with ``np.add.reduceat`` — no per-document numpy dispatch.
    Token hashes are memoized per worker."""

    # bound the (chunk_tokens × 64) int8 intermediate to ~16 MB
    _CHUNK_TOKENS = 262_144

    def __init__(self):
        self.cache: Dict[str, int] = {}
        self.cache_cap = 1_000_000  # see MinHasher.token_cache
        self._shifts = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        """Single-document form (tests / ground-truth checks)."""
        return int(self.simhashes([text])[0])

    def simhashes(self, texts) -> np.ndarray:
        if len(self.cache) > self.cache_cap:
            self.cache.clear()
        cache = self.cache
        get, put = cache.get, cache.setdefault
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        tok_lists = [(t or "").split() for t in texts]
        lens = np.fromiter((len(t) for t in tok_lists), np.int64, n)
        nonempty = np.nonzero(lens)[0]
        start = 0
        while start < len(nonempty):
            end, tot = start, 0
            while end < len(nonempty) and (
                tot == 0 or tot + lens[nonempty[end]] <= self._CHUNK_TOKENS
            ):
                tot += lens[nonempty[end]]
                end += 1
            idx = nonempty[start:end]
            th = np.fromiter(
                (get(t) or put(t, token_hash64(t))
                 for i in idx for t in tok_lists[i]),
                np.uint64, tot,
            )
            signs = (((th[:, None] >> self._shifts) & np.uint64(1)) << np.uint64(1)
                     ).astype(np.int64) - 1  # ±1 per (occurrence, bit)
            starts = np.r_[0, np.cumsum(lens[idx])[:-1]]
            acc = np.add.reduceat(signs, starts, axis=0)  # (docs, 64)
            bits = (acc > 0).astype(np.uint8)
            out[idx] = np.packbits(bits[:, ::-1], axis=1).view(">u8")[:, 0]
            start = end
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = self.simhashes(batch.column("text").to_pylist())
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(sh, type=pa.uint64())],
            names=["doc_id", "simhash"],
        )


_SH_CACHE: Dict[str, "SimHasher"] = {}


def _simhash_batch(batch: pa.Table) -> pa.Table:
    sh = _SH_CACHE.get("sh")
    if sh is None:
        sh = _SH_CACHE["sh"] = SimHasher()
    return sh(batch)


def simhash_pairs(ds, max_hamming: int = 3, concurrency=None, num_partitions: int = 64):
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    LSH by 4 × 16-bit bands (any pair within Hamming ≤ 3 shares at least one
    exact band — pigeonhole), then exact Hamming check within buckets.
    Bucket pairing runs inside ``num_partitions`` salted coarse partitions
    (see ``minhash_lsh_pairs``) — one Ray group per partition, vectorized
    singleton pruning + pandas groupby inside.
    """
    from ray.data.aggregate import Min

    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        _simhash_batch, batch_format="pyarrow"
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        # vectorized explode (same tensor pattern as minhash ``_band_rows``):
        # (n, 4) band values via one shift+mask broadcast, no per-row Python
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.string()), pa.array([], type=pa.int32()),
                 pa.array([], type=pa.int32()), pa.array([], type=pa.uint64())],
                names=["doc_id", "band_id", "band_val", "simhash"],
            )
        hs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        vals = ((hs[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        doc_rep = np.repeat(np.arange(n), 4)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").take(pa.array(doc_rep)),
                pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                pa.array(vals.reshape(-1)),
                pa.array(np.repeat(hs, 4), type=pa.uint64()),
            ],
            names=["doc_id", "band_id", "band_val", "simhash"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n < 2 or n > 500:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ids = group["doc_id"].to_numpy()
        hs = group["simhash"].to_numpy().astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(n):
            x = hs[i + 1 :] ^ hs[i]
            # vectorized popcount via uint8 view
            dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            for k in np.nonzero(dist <= max_hamming)[0]:
                lo, hi = sorted((ids[i], ids[i + 1 + k]))
                a_out.append(lo)
                b_out.append(hi)
                d_out.append(int(dist[k]))
        return pd.DataFrame({"a": a_out, "b": b_out, "hamming": d_out})

    def partition_pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": [], "b": [], "hamming": []})
        dup = group[group.duplicated(["band_id", "band_val"], keep=False)]
        if dup.empty:
            return empty
        outs = [
            bucket_pairs(g) for _, g in dup.groupby(["band_id", "band_val"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    def add_part(b: pa.Table) -> pa.Table:
        mixed = pc.add(
            pc.multiply(pc.cast(b.column("band_val"), pa.int64()), 4),
            pc.cast(b.column("band_id"), pa.int64()),
        )
        return b.append_column(
            "part", pc.cast(pc.bit_wise_and(mixed, num_partitions - 1), pa.int32())
        )

    pairs = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: partition_pairs(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 11,
    dim: int = 64,
    num_partitions: int = 64,
):
    """Cosine-similarity near-duplicate pairs via random-hyperplane LSH.

    Each vector gets n_tables bucket keys (n_planes sign bits each); pairs
    are generated within buckets and verified by exact cosine.  Recall
    grows with n_tables; candidate cost shrinks with n_planes.

    Round-5 two-phase shape (same fix as ``minhash_lsh_pairs``): the
    bucket exchange carries (vec_id, table_id, bucket) KEYS only — the old
    plan shipped the normalized vector on every table row (n_tables ×
    dim × 8 B ≈ 2 KB/vector, 4× duplication).  The normalized matrix is
    computed once, MATERIALIZED, and exact-cosine verification of the
    deduped candidates runs under the broadcast gate as a ray.put matrix
    verify (zero extra executions) or past it as size-gated blob joins.
    Pair set and cosines identical: skip-oversized-bucket semantics and
    the raw-dot threshold compare are unchanged."""
    from ray.data.aggregate import Count

    from .joins import BROADCAST_MAX_SOURCE_ROWS, _collect_arrow, lookup_join

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)

    def normalize(batch: pa.Table) -> pa.Table:
        from .ann import embedding_matrix

        mat = embedding_matrix(batch.column("embedding"))
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        n = len(mat)
        return pa.Table.from_arrays(
            [
                batch.column("vec_id"),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float64()),
                    mat.shape[1] if n else dim,
                ),
            ],
            names=["vec_id", "vec"],
        )

    norm_ds = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(normalize, batch_format="pyarrow")
        .materialize()
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        from .ann import embedding_matrix

        mat = embedding_matrix(batch.column("vec"))
        n = len(mat)
        out_ids, out_tables, out_buckets = [], [], []
        for t in range(n_tables):
            bits = (mat @ planes[t].T) > 0  # (n, planes)
            keys = bits @ (1 << np.arange(n_planes))
            out_ids.extend(batch.column("vec_id").to_pylist())
            out_tables.extend([t] * n)
            out_buckets.extend(int(k) for k in keys)
        return pa.Table.from_arrays(
            [
                pa.array(out_ids),
                pa.array(out_tables, type=pa.int32()),
                pa.array(out_buckets, type=pa.int64()),
            ],
            names=["vec_id", "table_id", "bucket"],
        )

    def bucket_cands(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n < 2 or n > 1000:  # oversized buckets skipped, as before
            return pd.DataFrame({"a": [], "b": []})
        ids = np.sort(group["vec_id"].to_numpy())
        ii, jj = np.triu_indices(n, k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    def partition_cands(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": [], "b": []})
        dup = group[group.duplicated(["table_id", "bucket"], keep=False)]
        if dup.empty:
            return empty
        outs = [
            bucket_cands(g) for _, g in dup.groupby(["table_id", "bucket"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    def add_part(b: pa.Table) -> pa.Table:
        mixed = pc.add(
            pc.multiply(b.column("bucket"), n_tables),
            pc.cast(b.column("table_id"), pa.int64()),
        )
        return b.append_column(
            "part", pc.cast(pc.bit_wise_and(mixed, num_partitions - 1), pa.int32())
        )

    cands = (
        norm_ds.map_batches(bucketize, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: partition_cands(g.drop(columns=["part"])),
            batch_format="pandas",
        )
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_nb"))
    )

    def finish(b: pa.Table, sa: np.ndarray, sb: np.ndarray) -> pa.Table:
        sims = np.einsum("ij,ij->i", sa, sb) if len(sa) else np.empty(0)
        keep = sims >= threshold
        out = b.filter(pa.array(keep))
        return pa.Table.from_arrays(
            [out.column("a"), out.column("b"),
             pa.array(np.round(sims[keep], 6), type=pa.float64())],
            names=["a", "b", "cosine"],
        )

    from .ann import embedding_matrix

    n_vecs = norm_ds.count()  # metadata-cheap on a materialized dataset
    if n_vecs <= BROADCAST_MAX_SOURCE_ROWS:
        import ray

        from .broadcast import get_cached

        tbl = _collect_arrow(norm_ds)  # no new execution: refs exist
        ref = ray.put(
            (tbl.column("vec_id").combine_chunks(), embedding_matrix(tbl.column("vec")))
        )

        def verify_broadcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return finish(b, np.empty((0, 0)), np.empty((0, 0)))
            ids_c, mat = get_cached(ref)
            ia = pc.index_in(b.column("a"), value_set=ids_c).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ib = pc.index_in(b.column("b"), value_set=ids_c).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            return finish(b, mat[ia], mat[ib])

        return cands.map_batches(verify_broadcast, batch_format="pyarrow")

    def blob_side(key_name: str, vec_name: str):
        def to_blobs(b: pa.Table) -> pa.Table:
            m = embedding_matrix(b.column("vec"))
            return pa.Table.from_arrays(
                [
                    b.column("vec_id"),
                    pa.array([m[i].tobytes() for i in range(len(m))],
                             type=pa.binary()),
                ],
                names=[key_name, vec_name],
            )

        return norm_ds.map_batches(to_blobs, batch_format="pyarrow")

    withvecs = lookup_join(
        lookup_join(
            cands, lambda: blob_side("vec_id", "vec_a"), "a", "vec_id",
            ["vec_a"], right_source_rows=n_vecs,
        ),
        lambda: blob_side("vec_id", "vec_b"), "b", "vec_id",
        ["vec_b"], right_source_rows=n_vecs,
    )

    def verify_joined(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return finish(b, np.empty((0, 0)), np.empty((0, 0)))
        sa = np.stack([
            np.frombuffer(x, dtype=np.float64)
            for x in b.column("vec_a").to_pylist()
        ])
        sb = np.stack([
            np.frombuffer(x, dtype=np.float64)
            for x in b.column("vec_b").to_pylist()
        ])
        return finish(b.drop_columns(["vec_a", "vec_b"]), sa, sb)

    return withvecs.map_batches(verify_joined, batch_format="pyarrow")


def semantic_dedup(
    ds,
    n_clusters: int = 16,
    eps: float = 0.05,
    max_cluster: int = 4096,
    seed: int = 3,
):
    """Semantic dedup via cluster-then-pairwise (SemDeDup, Abbas et al.
    2023, arXiv:2303.09540): k-means-cluster the embedding space, then
    within each cluster mark a vector as a duplicate when its cosine
    similarity to a lower-id cluster member is ≥ 1 − eps (keep-first —
    the lowest id in each semantic group survives).

    Scale shape: the corpus-sized passes are the bounded-sample k-means
    (``IVFIndex.train``, ≤100k rows on the driver) and the streaming
    centroid ``assign`` (one map_batches); the O(n²) pairwise kernel runs
    per cluster, whose expected size is corpus / n_clusters — n_clusters
    is the knob that must scale with the corpus (the paper used 50k
    clusters for LAION-scale).  Oversized clusters are truncated at
    ``max_cluster`` with an explicit ``truncated`` flag rather than
    silently OOMing a worker.

    Returns a drop-list Dataset: (dup_id, kept_id, cosine, truncated).
    """
    from .ann import IVFIndex

    index = IVFIndex.train(ds, n_clusters=n_clusters, seed=seed)
    assigned = index.assign(ds.select_columns(["vec_id", "embedding"]))
    thr = 1.0 - eps

    def cluster_dups(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "dup_id": pd.Series([], dtype="int64"),
                "kept_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
                "truncated": pd.Series([], dtype="bool"),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values("vec_id", ignore_index=True)
        truncated = len(g) > max_cluster
        if truncated:
            g = g.iloc[:max_cluster]
        ids = g["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.triu(mat @ mat.T, k=1)  # sims[i, j] defined for i < j only
        hit = sims >= thr
        dup_cols = np.nonzero(hit.any(axis=0))[0]
        if not len(dup_cols):
            return empty
        keep_row = hit[:, dup_cols].argmax(axis=0)  # first (lowest-id) match
        return pd.DataFrame(
            {
                "dup_id": ids[dup_cols].astype("int64"),
                "kept_id": ids[keep_row].astype("int64"),
                "cosine": np.round(sims[keep_row, dup_cols], 6),
                "truncated": np.full(len(dup_cols), truncated),
            }
        )

    return assigned.groupby("cluster").map_groups(cluster_dups, batch_format="pandas")


# ---------------------------------------------------------------------------
# Connected components (dedup clustering)
# ---------------------------------------------------------------------------


def _large_star_part(g: pd.DataFrame) -> pd.DataFrame:
    """One salted partition of the large-star step.  Input rows (u, v) are
    the full directed neighborhoods of this partition's u's (the salt is a
    function of u alone, so every row of a given u is here).  For each u,
    m = min(N(u) ∪ {u}); emit canonical edges (m, v) for neighbors v > u."""
    m = np.minimum(
        g.groupby("u", sort=False)["v"].transform("min").to_numpy(),
        g["u"].to_numpy(),
    )
    keep = g["v"].to_numpy() > g["u"].to_numpy()
    return pd.DataFrame(
        {"lo": m[keep], "hi": g["v"].to_numpy()[keep]}
    ).drop_duplicates()


def _small_star_part(g: pd.DataFrame) -> pd.DataFrame:
    """One salted partition of the small-star step.  Input rows are edges
    oriented (u = hi, v = lo, v < u); for each u, m = min(N(u)); emit
    (m, v) for v ≠ m plus the center edge (m, u)."""
    m = g.groupby("u", sort=False)["v"].transform("min").to_numpy()
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    keep = v != m
    first = ~pd.Series(u).duplicated().to_numpy()  # one center edge per u
    return pd.DataFrame(
        {
            "lo": np.concatenate([m[keep], m[first]]),
            "hi": np.concatenate([v[keep], u[first]]),
        }
    ).drop_duplicates()


def _edge_checksum(edges_ds) -> tuple:
    """(count, xor64, sum64) of the deduped canonical edge set — three
    tree-aggregated scalars; the driver folds one tiny partial row per
    block, never the edges themselves."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = t.column("hi").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = lo * np.uint64(0x9E3779B97F4A7C15) + hi * np.uint64(0xC2B2AE3D27D4EB4F)
        return pa.table(
            {
                "cnt": pa.array([t.num_rows], type=pa.int64()),
                "xor": pa.array([int(np.bitwise_xor.reduce(h)) if len(h) else 0], type=pa.uint64()),
                "sum": pa.array([int(np.sum(h, dtype=np.uint64))], type=pa.uint64()),
            }
        )

    cnt = xor = tot = 0
    # materialize first: to_arrow_refs on a lazy dataset runs a hidden
    # schema-probe limit(1) execution (see joins._collect_arrow)
    for ref in (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        for row in t.to_pylist():
            cnt += row["cnt"]
            xor ^= row["xor"]
            tot = (tot + row["sum"]) & 0xFFFFFFFFFFFFFFFF
    return cnt, xor, tot


# Same spirit as joins.BROADCAST_MAX_SOURCE_ROWS: 5M edges × 16 B ≈ 80 MB
# — driver-safe.  The exact edge count is already known for free (the
# canonized set's first checksum), so the gate never guesses.
DRIVER_CC_MAX_EDGES = 5_000_000


def _driver_components(lo: np.ndarray, hi: np.ndarray):
    """Exact min-label components for a driver-resident edge list:
    vectorized hash-to-min (``np.minimum.at`` both directions) + pointer
    jumping until fixpoint — O(m) per round, O(log n) rounds, no Python
    per-edge loop.  Returns (node_ids, component_ids) aligned arrays."""
    ids = np.unique(np.concatenate([lo, hi]))
    a = np.searchsorted(ids, lo)
    b = np.searchsorted(ids, hi)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        before = lab.copy()
        m = np.minimum(lab[a], lab[b])
        np.minimum.at(lab, a, m)
        np.minimum.at(lab, b, m)
        while True:  # pointer jumping: label ← label of label
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, before):
            break
    # labels are indices into the SORTED ids, so min index == min node id
    return ids, ids[lab]


def connected_components(
    edges_ds,
    *,
    a_col: str = "a",
    b_col: str = "b",
    nodes_ds=None,
    node_col: str = "node",
    num_partitions: int = 64,
    max_iters: int = 50,
    max_driver_edges: int = None,
):
    """Connected components over an undirected edge Dataset → a
    (node, component) label Dataset, component = min node id reachable.

    Size-gated like the join planner: the canonize pass's checksum yields
    the EXACT deduped edge count for free, so below ``max_driver_edges``
    (default 5M ≈ 80 MB) the labels come from one vectorized driver-side
    hash-to-min + pointer-jumping pass — the distributed rounds' fixed
    per-stage costs dwarf a tiny candidate-pair graph (measured 15 s for a
    184-edge graph).  Above the gate it runs the alternating large-star /
    small-star algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): each half-step is ONE salted groupby
    over the edge list — no per-round join against a label table, no
    driver-side graph — converging in O(log² n) rounds.

    Distributed-path scale shape: each round's shuffles carry two int64s
    per edge, groups are salted on ``node & (P-1)`` with the exact
    per-node mins vectorized inside a partition (a hub node never creates
    an oversized Ray group), and each round's (bounded) edge Dataset is
    materialized so the O(log n) lineage never re-executes.  Convergence
    is a fixpoint of (count, xor64, sum64) over the deduped edge set —
    three scalars per round cross to the driver.  At the fixpoint every
    component is a star centred on its min node, so labels fall out of
    the edge list directly: hi → lo, plus a self-label per node.

    ``nodes_ds[node_col]`` (optional) adds isolated nodes, which label
    themselves.  Self-loops and null endpoints in the input are dropped.
    Tests pin BOTH plans by forcing the gate (``max_driver_edges=0``).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    if max_driver_edges is None:
        max_driver_edges = DRIVER_CC_MAX_EDGES

    def canonize(t: pa.Table) -> pa.Table:
        a = t.column(a_col)
        b = t.column(b_col)
        ok = pc.and_(
            pc.and_(pc.is_valid(a), pc.is_valid(b)), pc.not_equal(a, b)
        )
        a = pc.cast(pc.filter(a, ok), pa.int64())
        b = pc.cast(pc.filter(b, ok), pa.int64())
        return pa.table(
            {"lo": pc.min_element_wise(a, b), "hi": pc.max_element_wise(a, b)}
        )

    def explode_salt(t: pa.Table) -> pa.Table:
        # both directions for large-star: every node sees its full nbhd
        u = pa.concat_arrays(
            [t.column("lo").combine_chunks(), t.column("hi").combine_chunks()]
        )
        v = pa.concat_arrays(
            [t.column("hi").combine_chunks(), t.column("lo").combine_chunks()]
        )
        part = pc.cast(pc.bit_wise_and(u, num_partitions - 1), pa.int32())
        return pa.table({"u": u, "v": v, "part": part})

    def orient_salt(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.bit_wise_and(t.column("hi"), num_partitions - 1), pa.int32())
        return pa.table({"u": t.column("hi"), "v": t.column("lo"), "part": part})

    edges = edges_ds.map_batches(canonize, batch_format="pyarrow").materialize()
    chk = _edge_checksum(edges)
    if 0 < chk[0] <= max_driver_edges:
        # small graph: one driver pass, identical labels by construction
        blocks = [
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            for t in ray.get(edges.to_arrow_refs())
        ]
        # drop schema-less zero-column empties (same caveat as
        # joins._collect_arrow); chk[0] > 0 guarantees data remains
        tbl = pa.concat_tables([t for t in blocks if t.num_columns > 0])
        ids, comp = _driver_components(
            tbl.column("lo").to_numpy(zero_copy_only=False),
            tbl.column("hi").to_numpy(zero_copy_only=False),
        )
        labels = rd.from_arrow(
            pa.table(
                {
                    node_col: pa.array(ids, type=pa.int64()),
                    "component": pa.array(comp, type=pa.int64()),
                }
            )
        )
        if nodes_ds is not None:
            labels = labels.union(
                nodes_ds.map_batches(
                    lambda t: pa.table(
                        {
                            node_col: pc.cast(t.column(node_col), pa.int64()),
                            "component": pc.cast(t.column(node_col), pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            return labels.groupby(node_col).aggregate(
                Min("component", alias_name="component")
            )
        return labels
    if chk[0] > 0:
        for _ in range(max_iters):
            edges = (
                edges.map_batches(explode_salt, batch_format="pyarrow")
                .groupby("part")
                .map_groups(
                    lambda g: _large_star_part(g.drop(columns=["part"])),
                    batch_format="pandas",
                )
                .map_batches(orient_salt, batch_format="pyarrow")
                .groupby("part")
                .map_groups(
                    lambda g: _small_star_part(g.drop(columns=["part"])),
                    batch_format="pandas",
                )
                .materialize()
            )
            new_chk = _edge_checksum(edges)
            if new_chk == chk:
                break
            chk = new_chk

    def edge_labels(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t.column("hi"), "component": t.column("lo")})

    labels = edges.map_batches(edge_labels, batch_format="pyarrow")
    # roots appear only as `lo` at the fixpoint; self-label them so the
    # min-agg covers roots too
    labels = labels.union(
        edges.map_batches(
            lambda t: pa.table({node_col: t.column("lo"), "component": t.column("lo")}),
            batch_format="pyarrow",
        )
    )
    if nodes_ds is not None:
        selfs = nodes_ds.map_batches(
            lambda t: pa.table(
                {
                    node_col: pc.cast(t.column(node_col), pa.int64()),
                    "component": pc.cast(t.column(node_col), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        labels = labels.union(selfs)
    return labels.groupby(node_col).aggregate(Min("component", alias_name="component"))
