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

from ..rayfix import apply as _apply_rayfix

# every Dataset.join in this package flows through this module (or through
# queries that import it), so the hash-shuffle schema-broadcast fix is
# installed before any join plan can be built
_apply_rayfix()

# 5M keys × 8 B ≈ 40 MB broadcast side — comfortably driver/worker-safe;
# a 100 TB fact table is orders of magnitude above this and takes the
# hash-partitioned plan.
BROADCAST_MAX_SOURCE_ROWS = 5_000_000

# hash-plan partition sizing: one partition's share of the LARGER join side
# stays worker-heap-sized at any corpus (the salted_partitions clamp pattern,
# applied to Dataset.join's num_partitions).  Floor 8 keeps test-scale inputs
# on the historical partition count the forced-gate oracle tests pin.
JOIN_TARGET_ROWS_PER_PARTITION = 2_000_000
JOIN_MIN_PARTITIONS = 8


def join_partitions(*source_rows, target_rows: int = None, floor: int = None) -> int:
    """Partition count for the hash-partitioned ``Dataset.join`` plan,
    derived from parquet-footer row counts (``sources.tables.table_rows``)
    of however many join sides the caller can bound — ``None`` entries
    (sides with no cheap bound) are ignored.  A fixed count would put
    |larger side|/P rows on one aggregator however large the corpus; this
    clamp keeps that share ≤ ``target_rows`` instead.  Filters can only
    shrink a side, so footer rows never under-estimate."""
    import math

    if target_rows is None:
        target_rows = JOIN_TARGET_ROWS_PER_PARTITION
    if floor is None:
        floor = JOIN_MIN_PARTITIONS
    rows = max((r for r in source_rows if r), default=0)
    return max(floor, math.ceil(rows / target_rows))


def _collect_arrow(ds) -> pa.Table:
    """Driver-side collection of a (bounded, gate-checked) Dataset as one
    Arrow table — block refs fetched directly, no pandas round-trip.

    Materializes first: ``to_arrow_refs`` on a LAZY dataset runs a hidden
    ``schema(fetch_if_missing=True)`` probe that EXECUTES a ``limit(1)``
    prefix of the pipeline before the real run — one extra streaming
    execution (~0.3-0.5 s floor) per broadcast-plan collect, measured via
    a StreamingExecutor counter.  On a materialized dataset the schema is
    already known and the refs are returned without a new execution."""
    import ray

    mat = ds.materialize()
    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
        for t in ray.get(mat.to_arrow_refs())
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


def _force(ds):
    """Resolve a lazy Dataset argument: join sides may be passed as
    zero-arg callables so the plan NOT taken never pays its construction
    (building a semi-join side under the broadcast gate eagerly collects
    its own keys — a whole streaming execution)."""
    return ds() if callable(ds) else ds


def _driver_keys(obj, key: str) -> pa.Array:
    """Distinct non-null keys from a DRIVER-side source (the ``keys_driver``
    thunk's return: an Arrow table holding ``key``, or an array/chunked
    array) — the same unique + drop-null semantics as :func:`_collect_keys`
    so the two key sources are interchangeable."""
    if isinstance(obj, pa.Table):
        obj = obj.column(key)
    if isinstance(obj, pa.ChunkedArray):
        obj = obj.combine_chunks()
    return pc.drop_null(pc.unique(obj))


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


# bloom prefilter sizing: ~10 bits/key ≈ 1% false positives at 7 probes;
# the bitmap is capped so the broadcast side never exceeds 128 MiB however
# large the key side's footer count is (fp rate degrades gracefully past
# the cap instead of memory exploding)
BLOOM_BITS_PER_KEY = 10
BLOOM_MAX_BITS = 1 << 30
BLOOM_PROBES = 7


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    import numpy as np

    with np.errstate(over="ignore"):
        x = x * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _bloom_positions(keys: "np.ndarray", m_bits: int):
    """k double-hashed bit positions per key (Kirsch-Mitzenmacher): one
    64-bit hash split into h1/h2, positions h1 + i·h2 mod m."""
    import numpy as np

    h = _splitmix64(keys.astype(np.uint64))
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → cycles the full ring
    mask = np.uint64(m_bits - 1)  # m is a power of two
    for i in range(BLOOM_PROBES):
        with np.errstate(over="ignore"):
            yield (h1 + np.uint64(i) * h2) & mask


def _bloom_bits(source_rows: int) -> int:
    import math

    want = max(1 << 13, source_rows * BLOOM_BITS_PER_KEY)
    return min(BLOOM_MAX_BITS, 1 << math.ceil(math.log2(want)))


def build_bloom(keys_ds, key: str, *, source_rows: int):
    """Distributed bloom filter of a Dataset's key column.

    Per-block partials each carry one m-bit bitmap (one binary row); a
    tree-combine ``map_batches`` level ORs 32 partials at a time so the
    driver folds only ~blocks/32 rows.  Returns ``(bitmap_uint64, m_bits)``
    — ship with ``ray.put`` and probe with :func:`bloom_probe_mask`."""
    import numpy as np
    import pyarrow as pa

    m_bits = _bloom_bits(source_rows)
    words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy: a nullable int column converts to
        # float+NaN, which silently corrupts the hash of keys > 2^53
        ks = pc.drop_null(batch.column(key)).to_numpy(zero_copy_only=False)
        bitmap = np.zeros(words, dtype=np.uint64)
        for pos in _bloom_positions(ks.astype(np.uint64), m_bits):
            np.bitwise_or.at(
                bitmap, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.Table.from_arrays(
            [pa.array([bitmap.tobytes()], type=pa.binary())], names=["bloom"]
        )

    def combine(batch: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for buf in batch.column("bloom").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.Table.from_arrays(
            [pa.array([acc.tobytes()], type=pa.binary())], names=["bloom"]
        )

    parts = (
        keys_ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=32)
        .to_pandas()
    )
    acc = np.zeros(words, dtype=np.uint64)
    for buf in parts["bloom"]:
        acc |= np.frombuffer(buf, dtype=np.uint64)
    return acc, m_bits


def bloom_probe_mask(keys: "np.ndarray", bitmap: "np.ndarray", m_bits: int):
    """Vectorized membership test: True = possibly present (exact join
    still required), False = definitely absent (safe to drop)."""
    import numpy as np

    hit = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys.astype(np.uint64), m_bits):
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit &= (bitmap[word] & bit) != 0
    return hit


def semi_join(
    left_ds,
    keys_ds,
    left_key: str,
    right_key: str,
    *,
    right_source_rows: int,
    max_broadcast_rows: int = None,
    num_partitions: int = None,
    left_source_rows: int = None,
    bloom_prefilter: bool = False,
    keys_driver=None,
):
    """Rows of ``left_ds`` whose ``left_key`` appears in ``keys_ds[right_key]``.

    ``keys_driver`` (optional): a zero-arg callable returning the key side
    as a driver-side Arrow table/array — used ONLY when the broadcast plan
    is selected, replacing the ``_collect_keys`` Ray execution (a whole
    streaming-executor run, ~0.4 s fixed on this box) with a direct footer-
    pruned parquet read.  Safe by the same gate that makes the broadcast
    plan safe: it is called only when ``right_source_rows`` (a provable
    upper bound) is under the cap, so it never materializes more than the
    Ray collect would have.  Above the cap the hash plan runs and the
    thunk is never invoked; ``keys_ds`` stays the source of truth there,
    and the unique/drop-null semantics below are applied identically to
    both key sources.

    ``num_partitions=None`` (the default) derives the hash plan's partition
    count from the footer row bounds of both sides (:func:`join_partitions`
    over ``left_source_rows`` / ``right_source_rows``) — pass
    ``left_source_rows`` whenever the left lineage starts from a table with
    readable footers so a 100-TB fact side fans out instead of landing on
    8 aggregators.  Explicit counts remain for the forced-gate tests.

    ``bloom_prefilter=True`` adds a bloom stage ahead of the HASH plan:
    the key side is summarized into an m-bit filter (~10 bits/key, built
    distributed, broadcast once), the big side drops definite non-matches
    map-side, and only probable matches pay the partitioned exchange —
    at 1% fp that cuts a low-selectivity semi-join's shuffle volume by
    ~the selectivity factor while staying EXACT (the hash join still
    verifies the survivors).  No-op on the broadcast plan, which already
    filters map-side with the exact key set."""
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if num_partitions is None:
        num_partitions = join_partitions(left_source_rows, right_source_rows)
    if right_source_rows <= max_broadcast_rows:
        import ray

        from .broadcast import get_cached

        keys = (
            _driver_keys(keys_driver(), right_key)
            if keys_driver is not None
            else _collect_keys(_force(keys_ds), right_key)
        )
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
    if bloom_prefilter:
        import numpy as np
        import ray

        from .broadcast import get_cached

        # fail fast on the driver: the bloom hash is integer-key only
        # (string keys would need a byte-level digest path); schema() is
        # metadata-cheap
        key_type = left_ds.schema().base_schema.field(left_key).type
        if not (pa.types.is_integer(key_type)):
            raise ValueError(
                f"bloom_prefilter requires an integer join key; "
                f"{left_key!r} is {key_type}"
            )
        bitmap, m_bits = build_bloom(keys_ds, right_key, source_rows=right_source_rows)
        bloom_ref = ray.put(bitmap)

        def prefilter(batch: pa.Table) -> pa.Table:
            col = batch.column(left_key)
            # fill_null keeps the column integral (a nullable int column
            # would otherwise convert to float+NaN and corrupt the hash of
            # keys > 2^53); filled rows are masked back out below
            ks = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
            hit = bloom_probe_mask(ks, get_cached(bloom_ref), m_bits)
            if col.null_count:  # null keys never semi-match
                hit &= ~pc.is_null(col).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(hit))

        left_ds = left_ds.map_batches(prefilter, batch_format="pyarrow")
    return left_ds.join(
        _force(keys_ds),
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
    num_partitions: int = None,
    left_source_rows: int = None,
    keys_driver=None,
):
    """Rows of ``left_ds`` whose ``left_key`` does NOT appear in
    ``keys_ds[right_key]`` (partition derivation and the ``keys_driver``
    broadcast-plan short-cut as in :func:`semi_join`)."""
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if num_partitions is None:
        num_partitions = join_partitions(left_source_rows, right_source_rows)
    if right_source_rows <= max_broadcast_rows:
        import ray

        from .broadcast import get_cached

        keys = (
            _driver_keys(keys_driver(), right_key)
            if keys_driver is not None
            else _collect_keys(_force(keys_ds), right_key)
        )
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
        _force(keys_ds),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=(right_key,),
    )


def _hot_keys(left_ds, left_key: str, *, frac: float, per_block_top: int = 16):
    """Estimate the left side's hot join keys from bounded per-block partials.

    Each block ships its top ``per_block_top`` (key, count) pairs plus its
    row count — driver traffic is O(blocks × per_block_top) regardless of
    corpus size.  A key is *hot* when its (under-)estimated global share
    exceeds ``frac``.  Detection is a heuristic that only picks the plan —
    both plans are exact, so a missed hot key costs performance, never
    correctness; a genuinely hot key (> frac of all rows) necessarily tops
    most blocks' local counts, so its estimate lands within a small factor
    of truth."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        counts = (
            pa.table({left_key: batch.column(left_key)})
            .group_by(left_key)
            .aggregate([([], "count_all")])
        )
        counts = counts.sort_by([("count_all", "descending")]).slice(0, per_block_top)
        n = counts.num_rows
        key_type = batch.schema.field(left_key).type
        # one null-keyed sentinel row per block carries the block's exact
        # row count, so the driver recovers the exact total without a
        # second pass (top-k truncation loses mass from the count rows);
        # partials are ≤ per_block_top+1 rows — pylist construction is fine
        return pa.Table.from_arrays(
            [
                pa.array(counts.column(left_key).to_pylist() + [None], type=key_type),
                pa.array(
                    counts.column("count_all").cast(pa.int64()).to_pylist() + [0],
                    type=pa.int64(),
                ),
                pa.array([0] * n + [batch.num_rows], type=pa.int64()),
            ],
            names=["key", "cnt", "block_rows"],
        )

    tbl = _collect_arrow(
        left_ds.map_batches(partial, batch_format="pyarrow")
    )
    if "key" not in tbl.column_names or tbl.num_rows == 0:
        return pa.array([], type=pa.null())
    total = max(1, int(pc.sum(tbl.column("block_rows")).as_py() or 0))
    tbl = tbl.filter(pc.is_valid(tbl.column("key")))
    if tbl.num_rows == 0:
        return pa.array([], type=pa.null())
    per_key = tbl.group_by("key").aggregate([("cnt", "sum")])
    mask = pc.greater(
        per_key.column("cnt_sum").cast(pa.float64()),
        pa.scalar(float(frac) * total),
    )
    return pc.drop_null(per_key.filter(mask).column("key").combine_chunks())


def skew_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    value_cols,
    *,
    right_source_rows: int,
    max_broadcast_rows: int = None,
    num_partitions: int = None,
    left_source_rows: int = None,
    hot_key_fraction: float = None,
    hot_keys=None,
    right_driver=None,
):
    """Skew-aware inner equi-join appending ``value_cols`` (``right_key``
    unique on the right, as in :func:`lookup_join`).

    A hash-partitioned join sends every row of a key to one partition, so
    one hot key (a crawl's top domain, a null-ish default id, a viral
    user) serializes onto a single aggregator however many nodes exist.
    Plan:

    * right side under the broadcast cap → plain broadcast
      :func:`lookup_join` (skew is irrelevant when nothing shuffles);
    * otherwise detect hot left keys from bounded per-block count partials
      (:func:`_hot_keys`); the right rows for those keys (≤ |hot keys|
      rows — ``right_key`` is unique) are fetched with a semi filter,
      broadcast once, and hot left rows join map-side with zero shuffle,
      while the remaining keys — now guaranteed ≤ ``hot_key_fraction`` of
      rows each — take the hash-partitioned ``Dataset.join``.  The union
      of both branches is the exact inner-join result.

    ``hot_keys`` (a pyarrow Array) skips the detection pass — callers
    that already aggregated per-key counts (e.g. the right side IS the
    count table) can derive the hot set for free and save one scan of
    the left input.

    COST NOTE: the hybrid plan executes ``left_ds``'s lineage twice (hot
    branch + rest branch; three times if detection runs) — the price paid
    for splitting a lazy Dataset without a materialization barrier.  That
    trade wins when the avoided single-partition hot-key shuffle is the
    bottleneck (its alternative is a straggler holding 100 TB/|types| on
    one aggregator); callers for whom re-reading dominates should pass a
    ``.materialize()``d left (object-store-backed, spillable) instead.
    """
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if num_partitions is None:
        num_partitions = join_partitions(left_source_rows, right_source_rows)
    if hot_key_fraction is None:
        hot_key_fraction = 0.5 / num_partitions
    if right_source_rows <= max_broadcast_rows:
        return lookup_join(
            left_ds, right_ds, left_key, right_key, value_cols,
            right_source_rows=right_source_rows,
            max_broadcast_rows=max_broadcast_rows,
            num_partitions=num_partitions,
            right_driver=right_driver,
        )

    import ray

    from .broadcast import get_cached

    hot = (
        hot_keys
        if hot_keys is not None
        else _hot_keys(left_ds, left_key, frac=hot_key_fraction)
    )
    if len(hot) == 0:
        return left_ds.join(
            right_ds, join_type="inner", num_partitions=num_partitions,
            on=(left_key,), right_on=(right_key,),
        )
    hot_ref = ray.put(hot)

    # right rows for the hot keys: bounded at |hot| rows by key uniqueness
    right_hot_tbl = _collect_arrow(
        right_ds.map_batches(
            lambda b: b.filter(
                pc.fill_null(
                    pc.is_in(b.column(right_key), value_set=get_cached(hot_ref)),
                    False,
                )
            ),
            batch_format="pyarrow",
        )
    )
    side_ref = ray.put(right_hot_tbl)

    def join_hot(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(
            pc.is_in(batch.column(left_key), value_set=get_cached(hot_ref)), False
        )
        batch = batch.filter(mask)
        side = get_cached(side_ref)
        idx = pc.index_in(batch.column(left_key), value_set=side.column(right_key))
        valid = pc.is_valid(idx)
        batch = batch.filter(valid)
        idx = pc.filter(idx, valid)
        for col in value_cols:
            batch = batch.append_column(col, pc.take(side.column(col), idx))
        return batch

    def keep_rest(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.fill_null(
                pc.invert(
                    pc.is_in(batch.column(left_key), value_set=get_cached(hot_ref))
                ),
                False,  # null left key never inner-joins — drop in either branch
            )
        )

    hot_branch = left_ds.map_batches(join_hot, batch_format="pyarrow")
    rest_branch = left_ds.map_batches(keep_rest, batch_format="pyarrow").join(
        right_ds, join_type="inner", num_partitions=num_partitions,
        on=(left_key,), right_on=(right_key,),
    )
    return hot_branch.union(rest_branch)


def lookup_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    value_cols,
    *,
    right_source_rows: int,
    max_broadcast_rows: int = None,
    num_partitions: int = None,
    left_source_rows: int = None,
    right_driver=None,
    batch_size: int = None,
    hash_plan: str = "dataset_join",
):
    """Inner equi-join that APPENDS ``value_cols`` from ``right_ds`` (whose
    ``right_key`` is unique — a dimension/entity table) to ``left_ds``.

    Small right side → broadcast the (key, values) arrays once and apply a
    vectorized ``pc.index_in`` + ``take`` per batch (rows with no match are
    dropped, matching inner-join semantics).  Large right side → a
    hash-partitioned ``Dataset.join``.

    CONTRACT: ``right_ds`` must be projected to exactly
    ``[right_key] + value_cols`` — the hash plan's ``Dataset.join`` keeps
    every right column (it has no projection), so an unprojected right
    side would make the two plans' output schemas diverge.  Every catalog
    call site reads the right side with ``columns=[key, *values]``; the
    same applies to :func:`skew_join`, whose hot branch additionally
    appends ``value_cols`` in argument order and relies on that matching
    the right table's column order for the ``union`` with the hash
    branch."""
    if max_broadcast_rows is None:
        max_broadcast_rows = BROADCAST_MAX_SOURCE_ROWS
    if num_partitions is None:
        num_partitions = join_partitions(left_source_rows, right_source_rows)
    if right_source_rows <= max_broadcast_rows:
        import ray

        from .broadcast import get_cached

        # right_driver: zero-arg thunk returning the (projected) right side
        # as a driver-side Arrow table — replaces the _collect_arrow Ray
        # execution when the broadcast plan is selected; never called above
        # the gate (see semi_join's keys_driver contract)
        tbl = right_driver() if right_driver is not None else _collect_arrow(
            _force(right_ds))
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

        # batch_size passthrough: a caller whose upstream stage carries a
        # deliberate small fan-out (the PDF 16-files-per-task source) must
        # pin the fused chain's batch size here too — Ray fuses map chains
        # to the LARGEST member batch size (see read_pdf_documents)
        kw = {} if batch_size is None else {"batch_size": batch_size}
        return left_ds.map_batches(join_batch, batch_format="pyarrow", **kw)
    if hash_plan == "copartition":
        # acero (Dataset.join's aggregator) rejects nested non-key columns
        # ("Data type list<struct<...>> is not supported in join non-key
        # field") — a left side carrying spans/struct payloads must take
        # the salted co-partition exchange instead
        return copartition_lookup_join(
            left_ds, _force(right_ds), left_key, right_key, value_cols,
            num_partitions=num_partitions,
        )
    return left_ds.join(
        _force(right_ds),
        join_type="inner",
        num_partitions=num_partitions,
        on=(left_key,),
        right_on=(right_key,),
    )


def copartition_lookup_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    value_cols,
    *,
    num_partitions: int,
):
    """The hash-plan variant of :func:`lookup_join` for left sides whose
    payload columns Arrow's acero join cannot carry (nested types: the
    flagship's ``spans`` ``list<struct>`` column).  Semantics identical to
    the broadcast plan: inner join, ``value_cols`` appended, non-matching
    left rows dropped.

    Plan: both sides are tagged map-side with ``part = hash64(key) &
    (P-1)`` (process-independent hash — a key's rows land in ONE partition
    from either side), schemas are aligned with null padding so the union
    is well-formed, and one salted exchange co-locates each partition;
    inside a partition the attach is the same vectorized ``index_in`` +
    ``take`` as the broadcast plan, over the partition's slice of the
    sidecar.  One exchange of left+right total — the honest cost of
    attaching a corpus-sized sidecar to a corpus-sized left at any scale
    (there is no smaller plan: co-location requires the exchange).

    The schema-alignment padding needs both sides' schemas up front;
    ``Dataset.schema()`` may execute one upstream block to infer a mapped
    schema — acceptable on the >cap plan this function serves."""
    import numpy as np
    import pandas as pd

    P = num_partitions
    if P & (P - 1):
        raise ValueError(f"num_partitions must be a power of two, got {P}")

    value_cols = list(value_cols)
    lschema = left_ds.schema().base_schema
    rschema = right_ds.schema().base_schema
    left_cols = [f.name for f in lschema]
    vtypes = {c: rschema.field(c).type for c in value_cols}
    out_cols = left_cols + value_cols
    key_type = lschema.field(left_key).type

    def _part_of(col) -> pa.Array:
        # pandas' siphash (fixed default key) — vectorized and identical
        # across worker processes, unlike builtin hash(); high-cardinality
        # keys would make the token_hash64 memo a leak, not a cache
        vals = col.to_pylist()
        h = pd.util.hash_array(np.asarray(vals, dtype=object))
        return pa.array((h & (P - 1)).astype(np.int32))

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [batch.column(c) for c in left_cols]
        arrays += [pa.nulls(n, vtypes[c]) for c in value_cols]
        arrays.append(_part_of(batch.column(left_key)))
        arrays.append(pa.array(np.zeros(n, dtype=np.int8)))
        return pa.Table.from_arrays(arrays, names=out_cols + ["__part", "__side"])

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [
            batch.column(right_key).cast(key_type)
            if c == left_key
            else pa.nulls(n, lschema.field(c).type)
            for c in left_cols
        ]
        arrays += [batch.column(c) for c in value_cols]
        arrays.append(_part_of(batch.column(right_key)))
        arrays.append(pa.array(np.ones(n, dtype=np.int8)))
        return pa.Table.from_arrays(arrays, names=out_cols + ["__part", "__side"])

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def attach(g: pa.Table) -> pa.Table:
        is_right = pc.equal(g.column("__side"), 1)
        right = g.filter(is_right)
        left = g.filter(pc.invert(is_right))
        idx = pc.index_in(left.column(left_key), value_set=right.column(left_key))
        valid = pc.is_valid(idx)
        left = left.filter(valid)
        idx = pc.filter(idx, valid)
        arrays = [left.column(c) for c in left_cols]
        arrays += [pc.take(right.column(c), idx) for c in value_cols]
        return pa.Table.from_arrays(arrays, names=out_cols)

    return unioned.groupby("__part").map_groups(attach, batch_format="pyarrow")
