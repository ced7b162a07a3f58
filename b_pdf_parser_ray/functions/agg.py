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
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pandas as pd

# spec: (source_column, op, output_alias); op ∈ {sum, count, min, max, mean}
Spec = Tuple[Optional[str], str, str]

_PARTIAL_OPS = {"sum": "sum", "count": "size", "min": "min", "max": "max"}


def grouped_agg(ds, keys: Sequence[str], specs: Sequence[Spec]):
    """Distributed grouped aggregation with map-side partials.

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
