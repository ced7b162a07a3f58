"""Targeted runtime fix for Ray Data 2.49 hash-shuffle schema broadcast.

Upstream bug (ray/data/_internal/execution/operators/hash_shuffle.py): the
hash-shuffle operator broadcasts the input schema to every aggregator by
fanning out empty schema-bearing shards with the FIRST block it shuffles
(``send_empty_blocks=True``) — but ``_shuffle_block`` short-circuits on
``block.num_rows == 0`` BEFORE that fan-out, returning no shards at all.
The operator still marks the schema as broadcast, so when the first block
of a join side happens to be empty (common right after a selective filter,
or a grouped aggregate that left empty partitions), any aggregator
partition that receives no data rows ``build()``s a zero-column table and
``pa.Table.join`` dies with ``ArrowInvalid: No match or multiple matches
for key field reference ...``.  Whether a job crashes depends on block
ARRIVAL ORDER — the flakiest possible failure mode for a 100 TB join.

The fix wraps ``_shuffle_block``: an empty block WITH columns now honors
``send_empty_blocks`` by fanning an empty schema-carrying shard to every
aggregator — exactly what the non-empty path already does for partitions
that hash to nothing.  Non-empty blocks delegate to the original
implementation unchanged.

The wrapper is rebound on the hash_shuffle MODULE in the driver process
(the shuffle operator resolves ``_shuffle_block`` from module globals at
submission time), and Ray ships the wrapped remote function to workers by
value — no worker-side setup hook needed.  Blocks with ZERO columns (a
schema-less pandas empty from an upstream groupby) still cannot broadcast
a schema; call sites must normalize those first (see
``queries.dedup_ngram_verify``'s ``pair_proj``).

Applied lazily and idempotently via :func:`apply` (imported by
``functions.joins``, the package's gateway to ``Dataset.join``).
"""

from __future__ import annotations

_APPLIED = False


def apply() -> None:
    """Install the patch (idempotent, safe to call from many modules)."""
    global _APPLIED
    if _APPLIED:
        return

    import ray
    from ray.data._internal.execution.operators import hash_shuffle as hs

    if getattr(hs, "_schema_broadcast_fixed", False):  # another import path won
        _APPLIED = True
        return

    # underlying python function of the @ray.remote-decorated original;
    # captured once so the wrapper can delegate without recursing
    orig_fn = hs._shuffle_block._function

    @ray.remote
    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        from ray.data._internal.execution.operators.hash_shuffle import (
            _create_empty_table,
        )
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        probe = block_transformer(block) if block_transformer is not None else block
        probe = TableBlockAccessor.try_convert_block_type(
            probe, block_type=BlockType.ARROW
        )
        if probe.num_rows == 0 and send_empty_blocks and probe.num_columns > 0:
            # the upstream early-return drops the schema broadcast on the
            # floor; replicate the non-empty path's empty-shard fan-out so
            # every aggregator partition learns this side's schema
            stats = BlockExecStats.builder()
            shard = _create_empty_table(probe.schema)
            waits = []
            for partition_id in range(pool.num_partitions):
                aggregator = pool.get_aggregator_for_partition(partition_id)
                waits.append(
                    aggregator.submit.remote(input_index, partition_id, ray.put(shard))
                )
            ray.get(waits)
            meta = BlockAccessor.for_block(probe).get_metadata(exec_stats=stats.build())
            return (meta, {})
        # non-empty (or schema-less empty): original behavior, on the
        # already-transformed/converted block
        return orig_fn(
            probe,
            input_index,
            key_columns,
            pool,
            None,  # transformer already applied above
            send_empty_blocks,
            override_partition_id,
        )

    hs._shuffle_block = _shuffle_block_schema_safe
    hs._schema_broadcast_fixed = True

    # second layer: rebind the join aggregation class (driver-side plan
    # construction captures it; workers re-import it from THIS module)
    from ray.data._internal.execution.operators import join as join_op

    join_op.JoiningShuffleAggregation = SchemaSafeJoiningShuffleAggregation

    # third layer: the groupby/shuffle Concat aggregation has the same
    # empty-partition blind spot as the join (see SchemaSafeConcat)
    hs.Concat = SchemaSafeConcat
    _APPLIED = True


def _build_safe_join_aggregation():
    """Second layer: survive a partition side whose schema NEVER arrived.

    A side made exclusively of zero-column empties (schema-less pandas
    empties out of a groupby, which even the shuffle fix can't describe)
    leaves the aggregator's partition builder with a 0-column table;
    ``pa.Table.join`` then raises instead of returning the trivially-known
    result.  For the left-driven join types this engine plans (inner,
    left_semi, left_anti) that result IS known: empty left → empty output;
    empty/unknown right → no matches (inner/semi) or left unchanged
    (anti).

    Built at MODULE IMPORT (not inside :func:`apply`): the join operator's
    aggregation-factory lambda captures the class, cloudpickle serializes
    captured classes by reference, and Ray workers resolve that reference
    by importing ``b_pdf_parser_ray.rayfix`` — so the module attribute
    must be the real class in every process.

    Known residual (best-effort, strictly better than crashing): when the
    guard fires because the RIGHT schema never arrived, the empty block
    it returns carries only left columns, while partitions that did
    receive right rows emit left+right columns — a downstream
    schema-sensitive consumer can still see mixed 0-row schemas.  The
    missing columns are unknowable here; eliminating the case entirely
    requires the caller to never feed a join a side whose first block can
    be a ZERO-COLUMN empty (see ``queries.dedup_ngram_verify.pair_proj``
    for the normalization pattern)."""
    import pyarrow as pa

    from ray.data._internal.execution.operators import join as join_op

    # the original, even if apply() already rebound the module attribute
    base = join_op.__dict__.get(
        "_original_joining_shuffle_aggregation", join_op.JoiningShuffleAggregation
    )
    join_op._original_joining_shuffle_aggregation = base

    class SchemaSafeJoiningShuffleAggregation(base):
        def finalize(self, partition_id: int):
            left = self._get_partition_builder(
                input_seq_id=0, partition_id=partition_id
            ).build()
            right = self._get_partition_builder(
                input_seq_id=1, partition_id=partition_id
            ).build()
            jt = getattr(self._join_type, "value", self._join_type)
            if left.num_columns == 0 or right.num_columns == 0:
                if jt in ("inner", "left_semi"):
                    return left.slice(0, 0) if left.num_columns else pa.table({})
                if jt == "left_anti":
                    return left
                # right-driven / outer types can't synthesize the missing
                # side's columns — fall through to the original behavior
            arrow_join_type = join_op._JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP[
                self._join_type
            ]
            return left.join(
                right,
                join_type=arrow_join_type,
                keys=list(self._left_key_col_names),
                right_keys=list(self._right_key_col_names),
                left_suffix=self._left_columns_suffix,
                right_suffix=self._right_columns_suffix,
            )

    # top-level identity so cloudpickle serializes the class by reference
    # (workers then import it from this module instead of by value)
    SchemaSafeJoiningShuffleAggregation.__qualname__ = (
        "SchemaSafeJoiningShuffleAggregation"
    )
    SchemaSafeJoiningShuffleAggregation.__module__ = __name__
    return SchemaSafeJoiningShuffleAggregation


SchemaSafeJoiningShuffleAggregation = _build_safe_join_aggregation()


def _build_safe_concat():
    """Third layer: the groupby/shuffle ``Concat`` aggregation crashes on
    partitions whose schema never arrived.

    Under ``ShuffleStrategy.HASH_SHUFFLE`` a ``groupby().map_groups`` chain
    of TWO exchanges reproducibly dies (pinned in tests/test_round4.py):
    the first exchange leaves most of its default-200 partitions empty when
    the key domain is small (a 16-way salted exchange has 16 non-empty
    partitions), the intermediate map operator forwards those empties as
    ZERO-COLUMN blocks, and when one of them happens to be the FIRST block
    the second shuffle sees, the upstream ``send_empty_blocks`` schema
    broadcast is skipped (the `_shuffle_block` early-return this module
    already patches — but a zero-column block has no schema to fan out
    either).  Aggregator partitions that then receive no data rows
    ``build()`` a zero-column table and ``Concat.finalize``'s
    ``sort_by(key_columns)`` raises ``ArrowInvalid: No match for
    FieldRef.Name(...) in ``— arrival-order-dependent, exactly the failure
    class of the join layer.

    A zero-column build IS the trivially-known result: an empty partition.
    Skip the sort (there is nothing to sort and no columns to sort by) and
    return it; downstream map operators skip empty blocks, so the pipeline
    result is identical to the sort-shuffle plan's.

    Built at module import for the same cloudpickle-by-reference reason as
    the join class: the HashShuffleOperator's aggregation-factory lambda
    captures the ``Concat`` global, workers deserialize that reference by
    importing the class's ``__module__`` — which must therefore be THIS
    importable module, not a driver-only monkeypatch."""
    from ray.data._internal.execution.operators import hash_shuffle as hs

    base = hs.__dict__.get("_original_concat_aggregation", hs.Concat)
    hs._original_concat_aggregation = base

    class SchemaSafeConcat(base):
        def finalize(self, partition_id: int):
            block = self._partition_block_builders[partition_id].build()
            if self._should_sort and block.num_columns > 0:
                block = block.sort_by(
                    [(k, "ascending") for k in self._key_columns]
                )
            return block

    SchemaSafeConcat.__qualname__ = "SchemaSafeConcat"
    SchemaSafeConcat.__module__ = __name__
    return SchemaSafeConcat


SchemaSafeConcat = _build_safe_concat()
