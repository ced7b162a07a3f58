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
  domain is provably bounded (enum columns, calendar buckets), never for
  data-dependent keys (orderkey, partkey, terms).
"""

from __future__ import annotations

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
):
    """Distributed grouped aggregation with map-side partials.

    ``max_groups``: caller-declared upper bound on the number of distinct
    key tuples — when ≤ ``SMALL_GROUPS_CAP`` the exchange is replaced by a
    coalescing re-reduce + single final combine task (see module doc).

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

    if max_groups is not None and max_groups <= SMALL_GROUPS_CAP:
        # no-exchange plan: combine ops on the PARTIAL columns (sum of
        # sums, sum of counts, min of mins, max of maxes)
        combine_pa = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

        def combine_batch(batch):
            out = batch.group_by(keys, use_threads=False).aggregate(
                [(alias, combine_pa[op]) for _, op, alias in partial_specs]
            )
            assert out.column_names[: len(keys)] == keys
            return out.rename_columns(
                keys + [alias for _, _, alias in partial_specs]
            )

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
