"""Size-gated semi/anti-join planner.

A semi/anti-join has two physical plans with a ~10⁶× crossover:

* **broadcast**: collect the (distinct) key side once, ``ray.put`` it, and
  filter the big side with a vectorized ``pc.is_in`` inside ``map_batches``
  — zero shuffle, but the key side must fit on the driver;
* **hash**: ``Dataset.join(join_type='left_semi'/'left_anti')`` — a
  hash-partitioned exchange on both sides; unbounded scale, but pays fixed
  shuffle/aggregator costs that dwarf small inputs.

The gate is the *source-table row count from parquet footer metadata*
(``sources.tables.table_rows``) — a provable upper bound on the collected
key set that costs no compute and never under-estimates (a filter can only
shrink the side).  Below ``BROADCAST_MAX_SOURCE_ROWS`` the broadcast plan
is safe by construction; above it the planner switches to the hash plan,
so the same query text runs at sf0.001 and at 100 TB.  Tests pin both
plans by forcing the gate (``max_broadcast_rows=0``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# 5M keys × 8 B ≈ 40 MB broadcast side — comfortably driver/worker-safe;
# a 100 TB fact table is orders of magnitude above this and takes the
# hash-partitioned plan.
BROADCAST_MAX_SOURCE_ROWS = 5_000_000


def _collect_arrow(ds) -> pa.Table:
    """Driver-side collection of a (bounded, gate-checked) Dataset as one
    Arrow table — block refs fetched directly, no pandas round-trip."""
    import ray

    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
        for t in ray.get(ds.to_arrow_refs())
    ]
    # zero-COLUMN blocks appear when an upstream aggregate/map stage emits
    # schema-less empties alongside real blocks; they carry no rows and
    # would make concat_tables raise on the schema mismatch
    tables = [t for t in tables if t.num_columns > 0]
    if not tables:
        # zero block refs (fully-filtered side): an empty zero-column table
        # (a map_batches Dataset that never ran has no recoverable schema);
        # callers treat it as the trivial empty side — semi returns nothing,
        # anti/lookup pass through / return empty
        return pa.table({})
    return pa.concat_tables(tables).combine_chunks()


def _collect_keys(keys_ds, key: str) -> pa.Array:
    """Distinct non-null keys of a (bounded) Dataset as one Arrow array:
    per-batch unique partials, driver-side final unique.  Nulls are dropped
    to give SQL join semantics — NULL never equals anything, so it can
    match no left row (``pc.is_in`` would otherwise treat null-in-set as a
    match)."""
    tbl = _collect_arrow(
        keys_ds.map_batches(
            lambda b: pa.Table.from_arrays([pc.unique(b.column(key))], names=[key]),
            batch_format="pyarrow",
        )
    )
    if key not in tbl.column_names:  # empty key side (zero blocks)
        return pa.array([], type=pa.null())
    return pc.drop_null(pc.unique(tbl.column(key).combine_chunks()))


def semi_join(
    left_ds,
    keys_ds,
    left_key: str,
    right_key: str,
    *,
    right_source_rows: int,
    max_broadcast_rows: int = None,
    num_partitions: int = 8,
):
    """Rows of ``left_ds`` whose ``left_key`` appears in ``keys_ds[right_key]``."""
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if right_source_rows <= max_broadcast_rows:
        import ray

        from .broadcast import get_cached

        keys = _collect_keys(keys_ds, right_key)
        if len(keys) == 0:  # empty key side: nothing can match
            return left_ds.limit(0)
        keys_ref = ray.put(keys)

        def filt(batch: pa.Table) -> pa.Table:
            # null left key → no match (SQL EXISTS semantics)
            mask = pc.fill_null(
                pc.is_in(batch.column(left_key), value_set=get_cached(keys_ref)),
                False,
            )
            return batch.filter(mask)

        return left_ds.map_batches(filt, batch_format="pyarrow")
    return left_ds.join(
        keys_ds,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=(right_key,),
    )


def anti_join(
    left_ds,
    keys_ds,
    left_key: str,
    right_key: str,
    *,
    right_source_rows: int,
    max_broadcast_rows: int = None,
    num_partitions: int = 8,
):
    """Rows of ``left_ds`` whose ``left_key`` does NOT appear in
    ``keys_ds[right_key]``."""
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if right_source_rows <= max_broadcast_rows:
        import ray

        from .broadcast import get_cached

        keys = _collect_keys(keys_ds, right_key)
        if len(keys) == 0:  # empty key side: every left row survives
            return left_ds
        keys_ref = ray.put(keys)

        def filt(batch: pa.Table) -> pa.Table:
            # null left key → kept (SQL NOT EXISTS semantics)
            mask = pc.fill_null(
                pc.invert(
                    pc.is_in(batch.column(left_key), value_set=get_cached(keys_ref))
                ),
                True,
            )
            return batch.filter(mask)

        return left_ds.map_batches(filt, batch_format="pyarrow")
    return left_ds.join(
        keys_ds,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=(right_key,),
    )


def lookup_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    value_cols,
    *,
    right_source_rows: int,
    max_broadcast_rows: int = None,
    num_partitions: int = 8,
):
    """Inner equi-join that APPENDS ``value_cols`` from ``right_ds`` (whose
    ``right_key`` is unique — a dimension/entity table) to ``left_ds``.

    Small right side → broadcast the (key, values) arrays once and apply a
    vectorized ``pc.index_in`` + ``take`` per batch (rows with no match are
    dropped, matching inner-join semantics).  Large right side → a
    hash-partitioned ``Dataset.join``.
    """
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if right_source_rows <= max_broadcast_rows:
        import ray

        from .broadcast import get_cached

        tbl = _collect_arrow(right_ds)
        if right_key not in tbl.column_names or tbl.num_rows == 0:
            # empty lookup side: inner join yields no rows (note: the
            # appended value columns are unknowable here, so the result
            # carries the left schema only — it has zero rows either way)
            return left_ds.limit(0)
        # null right keys can never equi-match (SQL semantics); dropping
        # them also stops index_in's null-matches-null behavior
        tbl = tbl.filter(pc.is_valid(tbl.column(right_key)))
        side_ref = ray.put(tbl)

        def join_batch(batch: pa.Table) -> pa.Table:
            side = get_cached(side_ref)
            idx = pc.index_in(batch.column(left_key), value_set=side.column(right_key))
            valid = pc.is_valid(idx)
            batch = batch.filter(valid)
            idx = pc.filter(idx, valid)
            for col in value_cols:
                batch = batch.append_column(col, pc.take(side.column(col), idx))
            return batch

        return left_ds.map_batches(join_batch, batch_format="pyarrow")
    return left_ds.join(
        right_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=(right_key,),
    )
