"""Exploded-span path: explode → shuffle → offset-ordered reassembly.

At 10^12-document scale a span-level table (one row per span) is the natural
shape for span-level transforms; getting back to per-document span sequences
is the pipeline's one true all-to-all shuffle, keyed on the document
(SURVEY.md §7 'What needs a shuffle').  Offset is the only order carrier:
reassembly sorts within group, never trusts block order (SURVEY.md §7 hard
part 3).

Shuffle shape: one Ray group per *coarse partition* (``crc32(doc_id) %
num_partitions``, assigned once per document at explode time), not one per
document — per-group machinery over 10^12 groups is the classic
small-groups trap; inside a partition the per-document rebuild is one
sort + boundary scan + ``ListArray.from_arrays``, fully vectorized.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..model import SPAN_TYPE

EXPLODED_NAMES = ["doc_id", "kind", "text", "media_ref", "offset", "part"]
# Size num_partitions so one partition's spans fit a worker's heap (each
# Ray group is rebuilt in one task) and so int32 list offsets hold
# (< 2^31 spans per partition) — scale it with the corpus, the default
# suits bench/test sizes.
DEFAULT_NUM_PARTITIONS = 64


def explode_batch(batch: pa.Table, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> pa.Table:
    """documents(doc_id, spans) → one row per span (+ shuffle partition).

    Vectorized: one flatten + one take per batch; the partition key is one
    crc32 per *document* (not per span), repeated over its spans."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    doc_id_col = batch.column("doc_id").combine_chunks()
    parts_per_doc = np.fromiter(
        (zlib.crc32(str(d).encode()) % num_partitions for d in doc_id_col.to_pylist()),
        dtype=np.int32,
        count=batch.num_rows,
    )
    part = pa.array(parts_per_doc).take(parent)
    return pa.Table.from_arrays(
        [
            doc_id_col.take(parent),
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("offset"),
            part,
        ],
        names=EXPLODED_NAMES,
    )


def explode(ds, num_partitions: int = DEFAULT_NUM_PARTITIONS):
    """Dataset documents → dataset of spans (streaming, no shuffle)."""
    return ds.select_columns(["doc_id", "spans"]).map_batches(
        lambda b: explode_batch(b, num_partitions), batch_format="pyarrow"
    )


def _reassemble_partition(group: pa.Table) -> pa.Table:
    """All documents of one coarse partition → (doc_id, spans) rows.

    One (doc_id, offset) sort, numpy boundary detection, then a single
    zero-copy ``ListArray.from_arrays`` over the sorted span struct."""
    group = group.combine_chunks()
    order = pc.sort_indices(
        group, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")]
    )
    g = group.take(order)
    doc_ids = np.asarray(g.column("doc_id").to_pylist(), dtype=object)
    n = len(doc_ids)
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], type=pa.string()), pa.array([], type=pa.list_(SPAN_TYPE))],
            names=["doc_id", "spans"],
        )
    new_doc = np.r_[True, doc_ids[1:] != doc_ids[:-1]]
    starts = np.nonzero(new_doc)[0]
    offsets = np.r_[starts, n].astype(np.int32)

    def col(name):
        c = g.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    struct = pa.StructArray.from_arrays(
        [col("kind"), col("text"), col("media_ref"), col("offset")],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets), struct)
    return pa.Table.from_arrays(
        [pa.array([str(d) for d in doc_ids[starts]], type=pa.string()), spans],
        names=["doc_id", "spans"],
    )


def reassemble(span_ds):
    """spans dataset → documents(doc_id, spans) in offset order.

    ``groupby('part')`` hash-shuffles spans so each document's spans land
    in one partition regardless of source block; the in-partition sort
    restores per-document offset order.
    """
    return span_ds.groupby("part").map_groups(
        lambda g: _reassemble_partition(g.drop_columns(["part"])),
        batch_format="pyarrow",
    )
