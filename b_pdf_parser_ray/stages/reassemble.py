"""Exploded-span path: explode → shuffle → offset-ordered reassembly.

At 10^12-document scale a span-level table (one row per span) is the natural
shape for span-level transforms; getting back to per-document span sequences
is a ``groupby('doc_id')`` — the pipeline's one true all-to-all shuffle, keyed
on ``doc_id`` (SURVEY.md §7 'What needs a shuffle').  Offset is the only
order carrier: reassembly sorts within group, never trusts block order
(SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..model import SPAN_TYPE

EXPLODED_NAMES = ["doc_id", "kind", "text", "media_ref", "offset"]


def explode_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, spans) → one row per span. Vectorized: one flatten
    + one take per batch, no per-span Python."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    doc_ids = batch.column("doc_id").combine_chunks().take(parent)
    return pa.Table.from_arrays(
        [
            doc_ids,
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("offset"),
        ],
        names=EXPLODED_NAMES,
    )


def explode(ds):
    """Dataset documents → dataset of spans (streaming, no shuffle)."""
    return ds.select_columns(["doc_id", "spans"]).map_batches(
        explode_batch, batch_format="pyarrow"
    )


def _reassemble_group(group: pa.Table) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[("offset", "ascending")])
    g = group.take(order)
    spans = pa.array(
        [
            [
                {
                    "kind": k,
                    "text": t,
                    "media_ref": m,
                    "offset": o,
                }
                for k, t, m, o in zip(
                    g.column("kind").to_pylist(),
                    g.column("text").to_pylist(),
                    g.column("media_ref").to_pylist(),
                    g.column("offset").to_pylist(),
                )
            ]
        ],
        type=pa.list_(SPAN_TYPE),
    )
    return pa.Table.from_arrays(
        [pa.array([g.column("doc_id")[0].as_py()]), spans],
        names=["doc_id", "spans"],
    )


def reassemble(span_ds):
    """spans dataset → documents(doc_id, spans) in offset order.

    ``groupby(doc_id)`` hash-shuffles spans so each document's spans land in
    one group regardless of which blocks they came from.
    """
    return span_ds.groupby("doc_id").map_groups(
        _reassemble_group, batch_format="pyarrow"
    )
