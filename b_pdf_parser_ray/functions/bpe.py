"""Distributed BPE tokenizer training (classic Sennrich-style merge learning).

The standard algorithm learns a merge table by repeatedly (1) counting
adjacent symbol pairs weighted by word frequency and (2) merging the most
frequent pair everywhere.  Restructured for Ray Data the scale-correct way:

- **The corpus is read ONCE.**  A single exchange reduces the document
  stream to the distinct-word frequency table (in-batch Arrow C pre-count,
  one partial row per (word, batch) crosses the shuffle — the
  ``doc_top_terms`` pattern).  Every merge iteration then runs over that
  word table, which is sublinear in the corpus (Heaps' law), never over
  the documents again.
- **Pair-count exchanges are vocabulary-bounded, not corpus-bounded.**
  After k merges the symbol vocabulary is ≤ |alphabet|·2 + k, so each
  block's pre-reduced (left, right, n) partial has at most vocab² rows
  regardless of input size; the driver folds those partials and takes the
  argmax (same bounded-fold contract as the KMV sketch).
- **Merge application touches only affected words.**  Adjacent-pair
  positions are located vectorized (shifted equality masks on the flat
  symbol buffer); untouched words are re-emitted as zero-copy slices of
  the old buffer and only the (few) hit words are rebuilt in Python.
- **Size gate** (the ``functions/joins.py`` philosophy): below
  ``BPE_LOCAL_CAP_ROWS`` distinct words the iteration loop runs on the
  driver over the collected word table (exact same algorithm, no per-merge
  Ray round-trips); above it, each iteration is a map pass + bounded fold
  + map pass over the materialized word Dataset.  Tests pin the two paths
  equal by forcing the cap to 0.

Not part of the reference engine (its scope ends at per-document
extraction, `/root/reference/pdfparser`); tokenizer training belongs to
the training-data operator suite the build brief mandates.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Distinct-word row count under which the merge loop runs on the driver.
# 2M words × ~40 B/word ≈ 80 MB — comfortably driver-sized; monkeypatched
# to 0 in tests to force and pin the distributed path.
BPE_LOCAL_CAP_ROWS = 2_000_000

END = "</w>"

MERGES_SCHEMA = ["step", "left", "right", "merged", "pair_count"]


# ---------------------------------------------------------------------------
# Shared kernels (both paths)
# ---------------------------------------------------------------------------


def _symbolize(word: str) -> List[str]:
    """Initial symbol sequence: characters, end-of-word marker fused onto
    the last character (Sennrich et al. 2016 convention)."""
    if not word:
        return []
    return list(word[:-1]) + [word[-1] + END]


def _merge_word(s: List[str], left: str, right: str, merged: str) -> List[str]:
    """Greedy left-to-right merge of adjacent (left, right) occurrences."""
    out: List[str] = []
    i, n = 0, len(s)
    while i < n:
        if i < n - 1 and s[i] == left and s[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _word_partial(batch: pa.Table) -> pa.Table:
    """In-batch word pre-count: one (word, n) partial row per distinct word
    per batch crosses the exchange."""
    words = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
    words = words.filter(pc.not_equal(words, ""))
    t = pa.Table.from_arrays([words], names=["word"])
    out = t.group_by(["word"], use_threads=False).aggregate([([], "count_all")])
    return out.rename_columns(["word", "n"])


def _symbolize_batch(batch: pa.Table) -> pa.Table:
    """word → list<string> symbol column.  Per-word Python is a one-off
    over the vocabulary-bounded word table, never over the corpus."""
    words = batch.column("word").to_pylist()
    syms = pa.array([_symbolize(w) for w in words], type=pa.list_(pa.string()))
    return pa.Table.from_arrays(
        [batch.column("word"), syms, batch.column("n")], names=["word", "syms", "n"]
    )


def _flat_syms(batch: pa.Table):
    """(values, offsets, weights) views of the syms list column; raw offsets
    pair with .values so sliced arrays index correctly."""
    col = batch.column("syms")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values
    offsets = col.offsets.to_numpy().astype(np.int64)
    weights = np.asarray(batch.column("n").to_numpy(zero_copy_only=False), dtype=np.int64)
    return col, values, offsets, weights


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts, pre-reduced inside the batch.

    Pair extraction is fully vectorized: a global arange re-based per word
    gathers (s[i], s[i+1]) for every in-word adjacency; weights repeat the
    word frequency over its pair run; Arrow C group-by folds to ≤ vocab²
    partial rows."""
    _, values, offsets, weights = _flat_syms(batch)
    lens = np.diff(offsets)
    npairs = np.maximum(lens - 1, 0)
    total = int(npairs.sum())
    if total == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["left", "right", "n"],
        )
    starts = offsets[:-1]
    cum = np.concatenate(([0], np.cumsum(npairs)[:-1]))
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(cum, npairs)
        + np.repeat(starts, npairs)
    )
    left = pc.take(values, pa.array(idx, type=pa.int64()))
    right = pc.take(values, pa.array(idx + 1, type=pa.int64()))
    w = np.repeat(weights, npairs)
    t = pa.Table.from_arrays(
        [left, right, pa.array(w, type=pa.int64())], names=["left", "right", "n"]
    )
    out = t.group_by(["left", "right"], use_threads=False).aggregate([("n", "sum")])
    return out.rename_columns(["left", "right", "n"])


def _apply_merge_batch(batch: pa.Table, left: str, right: str, merged: str) -> pa.Table:
    """Replace adjacent (left, right) with merged across the batch.

    Hit positions are found vectorized (shifted equality on the flat symbol
    buffer); only words containing a hit are rebuilt in Python, every other
    word is re-emitted as a zero-copy slice of the old value buffer."""
    col, values, offsets, _ = _flat_syms(batch)
    if len(values) == 0:
        return batch
    lmask = pc.equal(values, left).to_numpy(zero_copy_only=False)
    rmask = pc.equal(values, right).to_numpy(zero_copy_only=False)
    if len(values) < 2:
        return batch
    pairpos = np.nonzero(lmask[:-1] & rmask[1:])[0]
    if pairpos.size == 0:
        return batch
    # keep only pairs fully inside one word: both pos and pos+1 < word end
    widx = np.searchsorted(offsets, pairpos, side="right") - 1
    in_word = pairpos + 1 < offsets[widx + 1]
    hit_words = np.unique(widx[in_word])
    if hit_words.size == 0:
        return batch

    n_words = len(offsets) - 1
    hit = np.zeros(n_words, dtype=bool)
    hit[hit_words] = True

    # assemble the new flat buffer: zero-copy slice runs for clean words,
    # Python-merged lists for hit words
    pieces: List[pa.Array] = []
    new_lens = np.diff(offsets).copy()
    run_start = 0  # start of the current clean run, in word index space
    for w in hit_words:
        if w > run_start:
            pieces.append(values.slice(offsets[run_start], offsets[w] - offsets[run_start]))
        s = values.slice(offsets[w], offsets[w + 1] - offsets[w]).to_pylist()
        m = _merge_word(s, left, right, merged)
        new_lens[w] = len(m)
        pieces.append(pa.array(m, type=pa.string()))
        run_start = w + 1
    if run_start < n_words:
        pieces.append(
            values.slice(offsets[run_start], offsets[n_words] - offsets[run_start])
        )
    new_values = pa.concat_arrays(
        [p if isinstance(p, pa.Array) else p.combine_chunks() for p in pieces]
    )
    new_offsets = np.concatenate(([0], np.cumsum(new_lens)))
    new_syms = pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32()), new_values
    )
    return pa.Table.from_arrays(
        [batch.column("word"), new_syms, batch.column("n")], names=["word", "syms", "n"]
    )


def _best_pair(counts: pd.DataFrame) -> Tuple[str, str, int]:
    """Deterministic argmax: count desc, then (left, right) lexicographic —
    identical tie-break to the local path's min() over (-n, (l, r))."""
    top = counts.sort_values(
        ["n", "left", "right"], ascending=[False, True, True], ignore_index=True
    ).iloc[0]
    return str(top["left"]), str(top["right"]), int(top["n"])


# ---------------------------------------------------------------------------
# Local (driver) path — exact same algorithm over the collected word table
# ---------------------------------------------------------------------------


def _train_local(
    words: List[str], counts: List[int], num_merges: int
) -> List[Tuple[int, str, str, str, int]]:
    seqs = [_symbolize(w) for w in words]
    merges: List[Tuple[int, str, str, str, int]] = []
    for step in range(num_merges):
        pair_n: Dict[Tuple[str, str], int] = {}
        for s, n in zip(seqs, counts):
            for a, b in zip(s, s[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + n
        if not pair_n:
            break
        (l, r), n = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = l + r
        merges.append((step, l, r, merged, n))
        seqs = [
            _merge_word(s, l, r, merged)
            if any(a == l and b == r for a, b in zip(s, s[1:]))
            else s
            for s in seqs
        ]
    return merges


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def bpe_train(docs, num_merges: int = 10) -> pd.DataFrame:
    """Learn the first ``num_merges`` BPE merges over ``docs`` (a Dataset
    with a ``text`` column).  Returns the merge table (step, left, right,
    merged, pair_count) — M rows, deterministic."""
    from ray.data.aggregate import Sum

    wc = (
        docs.map_batches(_word_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    n_words = wc.count()
    if n_words == 0:
        return pd.DataFrame(columns=MERGES_SCHEMA).astype(
            {"step": "int64", "pair_count": "int64"},
        )

    if n_words <= BPE_LOCAL_CAP_ROWS:
        words: List[str] = []
        counts: List[int] = []
        for b in wc.iter_batches(batch_format="pyarrow"):
            words.extend(b.column("word").to_pylist())
            counts.extend(b.column("n").to_pylist())
        merges = _train_local(words, counts, num_merges)
    else:  # distributed iteration over the materialized word table
        ds = wc.map_batches(_symbolize_batch, batch_format="pyarrow").materialize()
        merges = []
        for step in range(num_merges):
            partials = ds.map_batches(_pair_partial, batch_format="pyarrow").to_pandas()
            if partials.empty:
                break
            agg = partials.groupby(["left", "right"], as_index=False)["n"].sum()
            l, r, n = _best_pair(agg)
            merged = l + r
            merges.append((step, l, r, merged, n))
            if step < num_merges - 1:
                ds = ds.map_batches(
                    _apply_merge_batch,
                    fn_kwargs={"left": l, "right": r, "merged": merged},
                    batch_format="pyarrow",
                ).materialize()

    out = pd.DataFrame(merges, columns=MERGES_SCHEMA)
    return out.astype({"step": "int64", "pair_count": "int64"})


# ---------------------------------------------------------------------------
# Apply: tokenize the corpus with a learned merge table
# ---------------------------------------------------------------------------


def _encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Standard BPE encode: repeatedly merge the present pair with the
    lowest merge rank (training order) until none applies."""
    s = _symbolize(word)
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(s, s[1:])):
            rk = ranks.get(pair)
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        s = s[:best_i] + [s[best_i] + s[best_i + 1]] + s[best_i + 2 :]
    return s


# per-worker encoder state, keyed by the merge-table fingerprint: task-mode
# map_batches + a module-level cache gives warm-worker memo reuse WITHOUT
# reserving CPUs for an actor pool (a 4-actor pool on a 4-CPU session
# starves its own upstream read — the documented join-aggregator livelock
# shape; the ranks dict is pattern-cheap state, the kernel.py pattern)
_ENCODERS: Dict[tuple, Tuple[Dict[Tuple[str, str], int], Dict[str, int]]] = {}


def _encoder_state(merge_pairs: tuple):
    state = _ENCODERS.get(merge_pairs)
    if state is None:
        ranks = {pair: i for i, pair in enumerate(merge_pairs)}
        state = _ENCODERS[merge_pairs] = (ranks, {})
    return state


def _encode_counts_batch(batch: pa.Table, merge_pairs: tuple) -> pa.Table:
    """Per-document word and BPE-token counts.  Each DISTINCT word is
    encoded once (memo across batches within a worker; Zipf makes the hit
    rate ~99% on natural text) and counts broadcast back by ``index_in``."""
    ranks, memo = _encoder_state(merge_pairs)
    tok_lists = pc.split_pattern(batch.column("text"), " ").combine_chunks()
    words = tok_lists.flatten()
    parent = pc.list_parent_indices(tok_lists).to_numpy().astype(np.int64)
    uniq = pc.unique(words)
    per_uniq = np.empty(len(uniq), dtype=np.int64)
    for i, w in enumerate(uniq.to_pylist()):
        n = memo.get(w)
        if n is None:
            n = memo[w] = len(_encode_word(w, ranks))
        per_uniq[i] = n
    idx = pc.index_in(words, uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    per_word = per_uniq[idx]
    ndocs = batch.num_rows
    n_words = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = np.zeros(ndocs, dtype=np.int64)
    np.add.at(n_tokens, parent, per_word)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(n_words), pa.array(n_tokens)],
        names=["doc_id", "n_words", "n_bpe_tokens"],
    )


def bpe_apply(docs, merges: pd.DataFrame):
    """Tokenize ``docs`` with a learned merge table: per-document word and
    BPE-token counts.  The merge table is tiny (M rows) and ships in the
    task closure; the per-worker distinct-word memo makes the encode cost
    vocabulary-bounded per worker."""
    merge_pairs = tuple(zip(merges["left"], merges["right"]))
    return docs.map_batches(
        _encode_counts_batch,
        fn_kwargs={"merge_pairs": merge_pairs},
        batch_format="pyarrow",
    )
