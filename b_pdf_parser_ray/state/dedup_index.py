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
Python set — membership state for 10¹² hashes splits across the cluster
(~8 GB per 10⁹ 64-bit hashes per shard at N=128; size N to the corpus).
Each ``map_batches`` task groups its batch's hashes by shard and issues
ONE ``check_and_add`` round-trip per shard per batch (vectorized on both
sides), not one per row.
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
            self._seen = set()

        def check_and_add(self, hashes: List[int]) -> List[bool]:
            """For each hash, True iff FIRST seen (and atomically add).
            Actor method calls serialize per actor, so first-seen is
            race-free within a shard."""
            seen = self._seen
            out = []
            for h in hashes:
                if h in seen:
                    out.append(False)
                else:
                    seen.add(h)
                    out.append(True)
            return out

        def size(self) -> int:
            return len(self._seen)

    return [DedupShard.remote() for _ in range(n_shards)]


class StreamingDedupMarker:
    """``map_batches`` callable: appends ``content_hash`` (uint64 as
    int64) and ``is_first`` (bool) columns by consulting the shard pool.

    One actor round-trip per (shard, batch); the shard calls for one
    batch are issued concurrently and gathered with a single
    ``ray.get``."""

    def __init__(self, shards, text_col: str = "text"):
        self._shards = shards
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        hashes = _content_hashes(batch.column(self._text_col))
        n_shards = len(self._shards)
        shard_of = (hashes % np.uint64(n_shards)).astype(np.int64)
        first = np.zeros(len(hashes), dtype=bool)
        refs, idxs = [], []
        for s in range(n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx) == 0:
                continue
            refs.append(
                self._shards[s].check_and_add.remote(
                    [int(h) for h in hashes[idx]]
                )
            )
            idxs.append(idx)
        for idx, flags in zip(idxs, ray.get(refs)):
            first[idx] = flags
        return batch.append_column(
            "content_hash", pa.array(hashes.view(np.int64))
        ).append_column("is_first", pa.array(first))


def streaming_dedup_counts(ds, n_shards: int = 8, text_col: str = "text"):
    """One streaming pass over ``ds``: returns ``(n_docs, n_unique)``
    plus the shard handles' final sizes as a cross-check.  ``n_unique``
    is deterministic (|distinct hashes|) even though which duplicate
    survives is arrival-order dependent."""
    import ray

    shards = make_shards(n_shards)
    marker = StreamingDedupMarker(shards, text_col=text_col)
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
