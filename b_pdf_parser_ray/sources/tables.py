"""Column-pruned readers for the benchmark/test star-schema tables.

Always pass ``columns`` so only the needed columns leave storage
(ray_guide.md 'prune at the read') — at 100 TB an unpruned read of a wide
table is the single largest avoidable cost.
"""

from __future__ import annotations

import os
from typing import List, Optional

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(sf_dir: str, name: str, columns: Optional[List[str]] = None):
    import ray.data

    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def read_arrow(sf_dir: str, name: str, columns: Optional[List[str]] = None):
    """Driver-side Arrow read for genuinely small dimension tables only
    (region/nation/supplier scale) — the broadcast side of a map-side join."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
