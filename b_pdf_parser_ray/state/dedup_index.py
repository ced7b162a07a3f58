"""Sharded first-seen dedup index — the one operator shape Ray Data's
Dataset API genuinely cannot express: a SHARED MUTABLE membership set that
every batch consults and updates while the stream is still flowing
(ray_guide.md / build brief: "drop to raw actors only where the Dataset
API can't express the semantics, e.g. a shared mutable index").

Exact dedup via ``groupby(hash).first`` (functions/dedup.py) needs the
whole corpus shuffled before the first kept row exists; this index marks
rows first-seen/duplicate ONLINE, in one streaming pass, so downstream
stages (extraction, scoring) can skip duplicates without waiting for a
barrier.  The price is arrival-order dependence: WHICH copy of a
duplicate group survives varies run to run — but the NUMBER kept (one
per distinct hash) and the hash set itself are deterministic, which is
what the tests and the catalog query pin.

Sharding: hash-space partitioned across N actors, each holding a plain
Python dict — membership state for 10¹² hashes splits across the cluster
(~8 GB per 10⁹ 64-bit hashes per shard at N=128; size N to the corpus).
Each ``map_batches`` task groups its batch's hashes by shard and issues
ONE ``claim`` round-trip per shard per batch (vectorized on both sides),
not one per row.

Fault model — why CLAIM (hash → owning doc_id), not check-and-add
membership: Ray retries a failed map task, and a retried batch would
re-consult the index AFTER its first attempt already inserted its
hashes.  A membership set would then answer "seen" for every row and the
retried batch would mark ALL its rows duplicates — a duplicate group
could lose every representative.  With first-writer-wins claims the
retry re-claims and gets the SAME owner back (its own doc ids), so
``is_first`` is stable under task retries and under whole-dataset
re-execution.  Remaining single point of truth: a shard ACTOR dying
loses its claims (Ray restarts the actor empty); production would run
shards with ``max_restarts`` + a claim journal, which is orthogonal
plumbing to the pattern shown here.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa


def _content_hashes(texts: pa.ChunkedArray) -> np.ndarray:
    """64-bit blake2b content hashes.

    Python-level loop over documents (not rows-per-token); the per-doc
    digest is C-speed and cheap relative to any real downstream stage.
    64 bits keeps collisions at ~2⁻⁶⁴ per pair — distinct-hash counts are
    exact distinct-content counts for any realistic corpus."""
    import hashlib

    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts.to_pylist()):
        b = t.encode() if t is not None else b""
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
        )
    return out


def make_shards(n_shards: int):
    """Create the actor pool.  Callers own the handles' lifetime — keep
    them referenced for the duration of the pipeline."""
    import ray

    @ray.remote(num_cpus=0.25)
    class DedupShard:
        def __init__(self):
            self._owner = {}

        def claim(self, hashes: List[int], owners: List[int]) -> List[int]:
            """First-writer-wins claim: for each hash, store ``owner`` if
            unclaimed and return the OWNING id either way.  Actor method
            calls serialize per actor (race-free within a shard), and a
            retried task re-claiming its own hashes gets its own ids back
            — the idempotency that makes ``is_first`` retry-safe."""
            table = self._owner
            return [table.setdefault(h, o) for h, o in zip(hashes, owners)]

        def size(self) -> int:
            return len(self._owner)

    return [DedupShard.remote() for _ in range(n_shards)]


class StreamingDedupMarker:
    """``map_batches`` callable: appends ``content_hash`` (uint64 as
    int64) and ``is_first`` (bool) columns by consulting the shard pool.

    ``is_first`` means this row's ``id_col`` value OWNS its content hash
    (first-writer-wins claim — see the module fault-model note).  One
    actor round-trip per (shard, batch); the shard calls for one batch
    are issued concurrently and gathered with a single ``ray.get``.

    Within one batch, duplicate contents claim with the batch's FIRST
    row's id for determinism inside the batch."""

    def __init__(self, shards, text_col: str = "text", id_col: str = "doc_id"):
        self._shards = shards
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        hashes = _content_hashes(batch.column(self._text_col))
        ids = batch.column(self._id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_shards = len(self._shards)
        shard_of = (hashes % np.uint64(n_shards)).astype(np.int64)
        # in-batch dedup first: one claim per distinct hash, owned by the
        # batch's first row holding it
        uniq_h, first_pos = np.unique(hashes, return_index=True)
        owner_of = dict(zip(uniq_h.tolist(), ids[first_pos].tolist()))
        refs, idxs = [], []
        for s in range(n_shards):
            idx = np.nonzero(shard_of[first_pos] == s)[0]
            if len(idx) == 0:
                continue
            hs = uniq_h[idx]
            refs.append(
                self._shards[s].claim.remote(
                    [int(h) for h in hs], [owner_of[int(h)] for h in hs]
                )
            )
            idxs.append(hs)
        owner_global = {}
        for hs, owners in zip(idxs, ray.get(refs)):
            owner_global.update(zip(hs.tolist(), owners))
        first = np.fromiter(
            (owner_global[int(h)] == i for h, i in zip(hashes, ids)),
            dtype=bool, count=len(hashes),
        )
        return batch.append_column(
            "content_hash", pa.array(hashes.view(np.int64))
        ).append_column("is_first", pa.array(first))


def streaming_dedup_counts(
    ds, n_shards: int = 8, text_col: str = "text", id_col: str = "doc_id"
):
    """One streaming pass over ``ds``: returns ``(n_docs, n_unique)``
    plus the shard handles' final sizes as a cross-check.  ``n_unique``
    is deterministic (|distinct hashes|) even though which duplicate
    survives is arrival-order dependent."""
    import ray

    shards = make_shards(n_shards)
    marker = StreamingDedupMarker(shards, text_col=text_col, id_col=id_col)
    marked = ds.map_batches(marker, batch_format="pyarrow")

    def counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "n": [batch.num_rows],
                "first": [int(pc.sum(batch.column("is_first")).as_py() or 0)],
            }
        )

    parts = marked.map_batches(counts, batch_format="pyarrow").to_pandas()
    n_docs, n_first = int(parts["n"].sum()), int(parts["first"].sum())
    shard_total = sum(ray.get([s.size.remote() for s in shards]))
    return {"n_docs": n_docs, "n_unique": n_first, "index_size": shard_total}
