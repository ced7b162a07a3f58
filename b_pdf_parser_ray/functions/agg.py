"""Partial (combiner-style) grouped aggregation.

A bare ``groupby(key).aggregate(...)`` shuffles every input row.  This
helper pre-aggregates inside ``map_batches`` — one partial row per (key,
batch) — so the all-to-all exchange moves |keys|×|blocks| rows instead of
|rows| (ray_guide.md 'Aggregation at scale').  For low-cardinality keys
(return flags, priorities, languages) that is a 10³-10⁶× shuffle reduction,
which is the difference between a groupby that works at 100 TB and one that
doesn't.

Supported specs: sum / count / min / max, plus mean = sum ÷ count computed
in the tiny final stage.

Two physical plans, chosen by the caller-declared key-cardinality bound:

* default (``max_groups=None`` or > SMALL_GROUPS_CAP): Ray's sort-exchange
  ``groupby().aggregate()`` over the partial rows — scales to any key
  cardinality, but pays the exchange's fixed per-partition floor (~1.5 s
  at test sizes regardless of input).
* **small-keys plan** (``max_groups ≤ SMALL_GROUPS_CAP``): a coalescing
  re-reduce ``map_batches`` (65 536 partial rows/task, output ≤ |keys|
  rows/task) followed by ``repartition(1)`` + one final combine task —
  no sort exchange at all.  Measured 4.5× faster (0.44 s vs 1.97 s,
  sf0.1 lineitem, 3-key group).  Scale bound: the final task receives
  ≤ ceil(|partials|/65 536) × max_groups rows; at the 65 536 cap and a
  10⁶-block corpus that is worker-heap-sized, and for the typical
  dimension keys (flags, priorities, nations, hours) it is trivially
  tiny.  The bound is the CALLER'S promise — pass it only when the key
  domain is provably bounded: enum columns, calendar buckets, or fact
  keys whose domain is a DIMENSION table's key space (custkey, suppkey,
  partkey — pass ``table_rows(sf_dir, dim)``; the footer-proven count
  grows with the corpus and the ``> SMALL_GROUPS_CAP`` fallback restores
  the exchange automatically).  Never for open-ended data-dependent keys
  (orderkey, doc_id, user_id, terms, content hashes), whose cardinality
  has no dimension to bound it.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import pandas as pd

# spec: (source_column, op, output_alias); op ∈ {sum, count, min, max, mean}
Spec = Tuple[Optional[str], str, str]

_PARTIAL_OPS = {"sum": "sum", "count": "size", "min": "min", "max": "max"}

# max key cardinality for the no-exchange plan; callers promise ≤ this
SMALL_GROUPS_CAP = 65_536
_COMBINE_BATCH = 65_536


def grouped_agg(
    ds,
    keys: Sequence[str],
    specs: Sequence[Spec],
    max_groups: Optional[int] = None,
    coalesce: bool = True,
    salt_key: Optional[str] = None,
    salt_partitions: int = 16,
    salt_hash: bool = False,
):
    """Distributed grouped aggregation with map-side partials.

    ``max_groups``: caller-declared upper bound on the number of distinct
    key tuples — when ≤ ``SMALL_GROUPS_CAP`` the exchange is replaced by a
    coalescing re-reduce + single final combine task (see module doc).

    ``salt_key`` (ignored when the small plan applies): an INTEGER member
    of ``keys`` (or a STRING member with ``salt_hash=True``, which routes
    via the memoized ``token_hash64`` — one blake2b per distinct key per
    block, the repo's per-distinct-token digest pattern) to salt the
    exchange on — ``mix64(salt_key) & (P-1)`` (splitmix-style multiply +
    high-bit fold, robust to strided/aligned integer keys) routes
    every partial row of one key tuple to the same coarse partition, so
    per-partition combines are globally final and the key-grain sort
    exchange is replaced by a P-way salted ``groupby().map_groups``
    (the events_cohort_retention / exact_dedup argument, generalized).
    Correct for ANY key cardinality; size ``salt_partitions`` from the
    source's footer row count (``sources.tables.salted_partitions``) when
    one partition's |keys|/P slice could outgrow a worker.

    ``coalesce=False`` (small plan only) drops the 65 536-row re-reduce
    stage: Ray fuses map chains to the LARGEST member batch size, so a
    pipeline whose upstream stages need a small explicit batch to fan out
    (the PDF byte source's 16-files-per-task granularity) would coalesce
    into a handful of giant tasks.  Callers downstream of such stages
    trade the extra reduction (final task sees |blocks| × |keys| rows —
    fine for enum keys) for keeping the upstream fan-out.

    Returns a Dataset with columns ``list(keys) + [alias for each spec]``.
    """
    keys = list(keys)
    if salt_key is not None and salt_key not in keys:
        raise ValueError(f"salt_key {salt_key!r} must be one of keys {keys!r}")

    # expand mean into sum+count partials
    partial_specs: List[Tuple[Optional[str], str, str]] = []
    finals: List[Tuple[str, str]] = []  # (alias, kind) kind: direct|mean
    for col, op, alias in specs:
        if op == "mean":
            partial_specs.append((col, "sum", f"__{alias}_sum"))
            partial_specs.append((col, "count", f"__{alias}_cnt"))
            finals.append((alias, "mean"))
        else:
            partial_specs.append((col, op, alias))
            finals.append((alias, "direct"))

    def partial(batch):
        # Arrow's C group-by — no pandas round-trip in the wide stage
        specs_pa = [
            (([], "count_all") if (op == "count" and col is None) else (col, op))
            for col, op, _ in partial_specs
        ]
        out = batch.group_by(keys, use_threads=False).aggregate(specs_pa)
        # output layout: key columns first, then aggregate columns in spec
        # order — rename positionally (name-keyed renames collide when one
        # source column appears in several specs, e.g. sum + mean).  Guard
        # the layout assumption: older pyarrow emitted aggregates first, and
        # a silent change here would misname columns without any error.
        assert out.column_names[: len(keys)] == keys, (
            f"pyarrow group_by layout changed: {out.column_names!r} "
            f"does not start with keys {keys!r}"
        )
        new_names = keys + [alias for _, _, alias in partial_specs]
        return out.rename_columns(new_names)

    # combine ops on the PARTIAL columns (sum of sums, sum of counts, min
    # of mins, max of maxes) — shared by the small and salted plans
    combine_pa = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def combine_batch(batch):
        out = batch.group_by(keys, use_threads=False).aggregate(
            [(alias, combine_pa[op]) for _, op, alias in partial_specs]
        )
        assert out.column_names[: len(keys)] == keys
        return out.rename_columns(
            keys + [alias for _, _, alias in partial_specs]
        )

    if max_groups is not None and max_groups <= SMALL_GROUPS_CAP:
        merged = ds.map_batches(partial, batch_format="pyarrow")
        if coalesce:
            merged = merged.map_batches(
                combine_batch, batch_format="pyarrow", batch_size=_COMBINE_BATCH
            )
        merged = (
            merged.repartition(1)
            # batch_size=None: the whole single block as ONE batch — a
            # default-sized batch split would emit duplicate key rows
            .map_batches(combine_batch, batch_format="pyarrow", batch_size=None)
        )
    elif salt_key is not None:
        import pyarrow as pa
        import pyarrow.compute as pc

        P = salt_partitions
        if P & (P - 1):
            raise ValueError(f"salt_partitions must be a power of two, got {P}")

        if salt_hash:
            from .textstats import token_hash64

            def add_part(batch):
                part = pa.array(
                    [
                        (token_hash64(v) if v is not None else 0) & (P - 1)
                        for v in batch.column(salt_key).to_pylist()
                    ],
                    pa.int32(),
                )
                return batch.append_column("part", part)
        else:
            from .joins import _splitmix64

            def add_part(batch):
                import numpy as np

                # mix before masking: raw low bits (key & (P-1)) collapse
                # integer keys with stride/alignment patterns (all multiples
                # of 16 → one salt partition).  The splitmix64 finalizer
                # makes the masked bits depend on EVERY key bit, so any key
                # distribution spreads across partitions; the mapping stays
                # deterministic per key, which is all the plan's correctness
                # needs (a key never splits).
                k = pc.fill_null(
                    pc.cast(batch.column(salt_key), pa.int64()), 0
                ).to_numpy(zero_copy_only=False).astype(np.uint64)
                part = pa.array(
                    (_splitmix64(k) & np.uint64(P - 1)).astype(np.int32),
                    type=pa.int32(),
                )
                return batch.append_column("part", part)

        merged = (
            ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            # combine_batch's group_by(keys) ignores the extra part column
            .map_groups(combine_batch, batch_format="pyarrow")
        )
    else:
        from ray.data.aggregate import Max, Min, Sum

        combine = {"sum": Sum, "count": Sum, "min": Min, "max": Max}
        aggs = []
        for col, op, alias in partial_specs:
            aggs.append(combine[op](alias, alias_name=alias))

        merged = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys)
            .aggregate(*aggs)
        )

    has_mean = any(kind == "mean" for _, kind in finals)
    if not has_mean:
        return merged

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        for alias, kind in finals:
            if kind == "mean":
                batch[alias] = batch[f"__{alias}_sum"] / batch[f"__{alias}_cnt"]
        drop = [c for c in batch.columns if c.startswith("__")]
        return batch.drop(columns=drop)

    return merged.map_batches(finish, batch_format="pandas")


def top_k(ds, k: int, keys):
    """Global ORDER BY ... LIMIT k WITHOUT a sort exchange.

    ``keys``: ``[(col, "descending"|"ascending"), ...]``.  Per-block
    ``select_k_unstable`` partials (≤k rows per block), one coalescing
    fold level (64·k-row batches — the KMV tree-combine trick, no
    exchange), then a single final task sorts ≤⌈blocks/64⌉·k rows and
    emits the exact ordered top k.  Replaces ``Dataset.sort().limit(k)``
    — whose all-to-all sort exchange moves EVERY row — wherever k is
    small; final-task bound stays worker-sized even at 10⁶ blocks for the
    catalog's k ≤ 1000.  Null sort-key handling matches the SQL default
    (NULLS LAST) via Arrow's at_end placement; ties must be broken by the
    trailing keys (same contract as the sort it replaces)."""
    import pyarrow.compute as pc

    def block_topk(batch):
        if batch.num_rows > k:
            batch = batch.take(pc.select_k_unstable(batch, k, keys))
        return batch

    def final(batch):
        return batch.take(pc.sort_indices(batch, sort_keys=keys)[:k])

    return (
        ds.map_batches(block_topk, batch_format="pyarrow")
        .map_batches(block_topk, batch_format="pyarrow", batch_size=64 * k)
        .repartition(1)
        # batch_size=None: the whole block as ONE batch — a split batch
        # would emit more than k rows
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# Domain-bounded vector aggregation (exchange-free, statistics-proven)
# ---------------------------------------------------------------------------


def column_min_max(path, column: str):
    """(min, max) of a parquet column from footer statistics alone — no
    data read, no Ray.  Returns ``None`` when the column is missing or any
    row group lacks min/max statistics (the caller falls back to an
    exchange plan, never a wrong answer)."""
    import pyarrow.parquet as pq

    files = (
        [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        if os.path.isdir(path)
        else [path]
    )
    lo = hi = None
    for f in files:
        md = pq.read_metadata(f)
        # resolve against the PARQUET LEAF schema, not the Arrow schema:
        # row-group column statistics are indexed by leaf position, which
        # matches Arrow field position only for flat schemas.  A flat
        # column's leaf path equals its name; a nested field's leaves have
        # dotted paths, so it never matches here and the caller falls back
        # to the exchange plan instead of silently reading another
        # column's statistics.
        leaf_paths = [md.schema.column(i).path for i in range(md.num_columns)]
        try:
            idx = leaf_paths.index(column)
        except ValueError:
            return None
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def summed_vector(ds, partial_fn, width: int, source_rows: Optional[int] = None):
    """Element-wise sum of per-block int64 vectors with ZERO exchange.

    ``partial_fn(batch: pa.Table) -> np.ndarray[int64]`` of length
    ``width``; each block contributes ONE row carrying its vector, the
    rows fold through ``repartition`` + whole-block combines, and the
    driver reads back a single length-``width`` vector (all-zeros for an
    empty dataset).

    This is the exchange-free sibling of ``grouped_agg(max_groups=...)``
    for VALUE-DOMAIN-bounded vector partials (dense histograms over an
    integer domain proven from footer min/max statistics): ``width`` is
    fixed by the domain, not the corpus, so the plan and its memory bound
    are identical at sf0.001 and at 100 TB.  For corpora past ~50 M rows
    (``source_rows`` hint) an intermediate 64-way fold level keeps the
    final task at ≤64 vector rows however many blocks the input has.
    """
    import numpy as np
    import pyarrow as pa

    def partial_row(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.list_(pa.int64()))], names=["__vec"]
            )
        vec = np.asarray(partial_fn(batch), dtype=np.int64)
        assert vec.shape == (width,), f"partial_fn returned shape {vec.shape}"
        return pa.Table.from_arrays([pa.array([vec])], names=["__vec"])

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        col = batch.column("__vec")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        summed = flat.reshape(-1, width).sum(axis=0)
        return pa.Table.from_arrays([pa.array([summed])], names=["__vec"])

    v = ds.map_batches(partial_row, batch_format="pyarrow")
    if source_rows is not None and source_rows > 50_000_000:
        # tree level: bound the final task's inqueue at ≤64 vectors even
        # for million-block corpora (64 × width × 8 B per combine task)
        v = v.repartition(64).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    rows = (
        v.repartition(1)
        # batch_size=None: the whole block as ONE batch — a split batch
        # would emit several partially-summed vectors
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    if not rows:
        return np.zeros(width, dtype=np.int64)
    return np.asarray(rows[0]["__vec"], dtype=np.int64)


# ---------------------------------------------------------------------------
# Range-partitioned aggregation (exchange-free, statistics-proven)
# ---------------------------------------------------------------------------


def key_range_tasks(path, key: str, max_task_rows: int = 8_000_000):
    """Group a parquet table's row groups into KEY-DISJOINT task ranges
    using footer min/max statistics — no data read.

    Sorted by range start, row groups merge into one task while their key
    ranges touch or overlap (``next.min <= running max``) and split at
    strict gaps (``next.min > running max``) — so no key value can appear
    in two different tasks, whatever the order WITHIN a row group.  That
    is the whole correctness argument for ``range_partitioned_agg``: each
    task's per-key aggregate is globally final.

    Returns a list of tasks, each ``[(file, [row_group, ...]), ...]``, or
    ``None`` when the plan is unprovable/degenerate: a key column without
    statistics, or overlap chains forcing a single task past
    ``max_task_rows`` (the unsorted-table case — the caller falls back to
    the exchange plan).
    """
    import pyarrow.parquet as pq

    files = (
        [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        if os.path.isdir(path)
        else [path]
    )
    units = []  # (min, max, file, rg_index, rows)
    for f in files:
        md = pq.read_metadata(f)
        schema = md.schema.to_arrow_schema()
        try:
            key_idx = schema.names.index(key)
        except ValueError:
            return None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(key_idx).statistics
            if st is None or not st.has_min_max:
                return None
            units.append((st.min, st.max, f, i, rg.num_rows))
    if not units:
        return None
    units.sort(key=lambda u: (u[0], u[1]))
    tasks, cur, cur_max, cur_rows = [], [], None, 0
    for u in units:
        if cur and u[0] > cur_max:
            tasks.append(cur)
            cur, cur_max, cur_rows = [], None, 0
        cur.append(u)
        cur_max = u[1] if cur_max is None else max(cur_max, u[1])
        cur_rows += u[4]
        if cur_rows > max_task_rows:
            return None
    tasks.append(cur)
    return [
        [
            (f, [u[3] for u in task if u[2] == f])
            for f in dict.fromkeys(u[2] for u in task)
        ]
        for task in tasks
    ]


def range_partitioned_apply(
    path,
    key: str,
    fn,
    columns: Optional[Sequence[str]] = None,
    max_task_rows: int = 8_000_000,
):
    """Run ``fn`` (Table → Table) once per statistics-proven key-disjoint
    task range of a parquet table — the exchange-free substrate for ANY
    per-key computation, not just spec aggregates.

    Because ``key_range_tasks`` guarantees no value of ``key`` spans two
    tasks, ``fn`` sees EVERY row of each of its keys in one call: per-key
    aggregates, sibling tests (EXISTS over same-key rows), sessionization
    by the range key — all correct with zero shuffle.  ``fn`` runs inside
    the read task and its OUTPUT is what crosses the wire, so it must
    reduce (per-key results, partials), never echo the input.

    Partitioning assumption (documented per the build brief): correctness
    relies only on footer min/max disjointness, checked here — an unsorted
    table collapses into one oversized task and returns ``None`` (callers
    fall back to their exchange plan), never a wrong answer.

    Returns a Dataset or ``None`` when the plan is unprovable.
    """
    import json

    import pyarrow as pa
    import ray.data

    tasks = key_range_tasks(path, key, max_task_rows)
    if tasks is None:
        return None
    cols = list(columns) if columns is not None else None
    items = [json.dumps(task) for task in tasks]

    def run_task(batch) -> "pa.Table":
        import pyarrow.parquet as pq

        outs = []
        for enc in batch.column("item").to_pylist():
            parts = [
                pq.ParquetFile(f).read_row_groups(rgs, columns=cols)
                for f, rgs in json.loads(enc)
            ]
            t = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
            outs.append(fn(t))
        return pa.concat_tables(outs)

    return ray.data.from_items(items).map_batches(run_task, batch_format="pyarrow")


def range_partitioned_agg(
    path,
    keys: Sequence[str],
    specs: Sequence[Spec],
    columns: Optional[Sequence[str]] = None,
    pre=None,
    max_task_rows: int = 8_000_000,
):
    """Exchange-free grouped aggregation over key-range-partitioned parquet.

    When the table's parquet footer statistics prove that no value of
    ``keys[0]`` spans two task ranges (``key_range_tasks``), every group
    lives entirely inside one task, so the groupby needs NO shuffle: each
    task reads its row groups (column-pruned), applies ``pre`` (optional
    filter/derive callable, Table → Table), and emits its groups' FINAL
    aggregates.  This is the lakehouse layout dividend — TPC-H-style fact
    tables arrive ordered by their key, and 100-TB corpora are routinely
    range-partitioned by id — measured 4.4 s → 0.1 s on the sf0.1
    lineitem orderkey-grain sum vs the sort exchange.  Extra grouping
    keys beyond ``keys[0]`` are allowed: disjointness of the leading key
    implies disjointness of the tuple.

    Returns a Dataset (same output schema as ``grouped_agg``) or ``None``
    when the statistics can't prove the plan (caller falls back).
    """
    import pyarrow as pa

    keys = list(keys)
    partial_specs: List[Tuple[Optional[str], str, str]] = []
    means: List[str] = []
    for col, op, alias in specs:
        if op == "mean":
            partial_specs.append((col, "sum", f"__{alias}_sum"))
            partial_specs.append((col, "count", f"__{alias}_cnt"))
            means.append(alias)
        else:
            partial_specs.append((col, op, alias))

    def agg_fn(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        if pre is not None:
            t = pre(t)
        specs_pa = [
            (([], "count_all") if (op == "count" and col is None) else (col, op))
            for col, op, _ in partial_specs
        ]
        out = t.group_by(keys, use_threads=False).aggregate(specs_pa)
        assert out.column_names[: len(keys)] == keys
        out = out.rename_columns(keys + [a for _, _, a in partial_specs])
        if means:
            arrays, names = out.columns, list(out.column_names)
            for alias in means:
                s = out.column(f"__{alias}_sum")
                c = out.column(f"__{alias}_cnt")
                arrays.append(pc.divide(pc.cast(s, "float64"), pc.cast(c, "float64")))
                names.append(alias)
            out = pa.Table.from_arrays(arrays, names=names)
            out = out.drop_columns([c for c in out.column_names if c.startswith("__")])
        return out

    return range_partitioned_apply(
        path, keys[0], agg_fn, columns=columns, max_task_rows=max_task_rows
    )
