"""String-similarity join via deletion-neighborhood blocking (SymSpell/
FastSS family: Bocek et al., "Fast Similarity Search in Large Dictionaries",
2007).  Finds all pairs of distinct strings at Levenshtein distance exactly 1
without the O(|vocab|^2) all-pairs scan the naive join (and the DuckDB oracle)
performs.

Completeness argument (why the blocking misses nothing at distance <= 1):
for strings a, b with lev(a, b) = 1,
- substitution at position i: deleting position i from each yields the same
  string, so del1(a) ∩ del1(b) is non-empty;
- insertion/deletion: the shorter string IS an element of del1(longer),
  and every string emits itself as a key.
So every distance-1 pair co-occurs under at least one blocking key, and each
key group is tiny (strings within one deletion of a common root).  Candidate
pairs are verified with an exact O(len) distance-1 check, then de-duplicated
(a pair can surface under more than one shared key).

Scale shape: the input is the DISTINCT-value table (vocabulary-scaled, not
corpus-scaled — the caller produces it with one ``grouped_agg`` pass over the
raw column).  Keys are salted by ``token_hash64`` into ``num_partitions``
coarse groups, pair generation and verification run vectorized-enough inside
each partition (group sizes are bounded by the deletion-neighborhood fan-in,
not by vocabulary size), and only the verified pair rows — output-sized —
ever reach the driver.
"""

from __future__ import annotations

from typing import List

import pandas as pd
import pyarrow as pa


def edit1_verify(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) == 1 in O(len): equal lengths → exactly one
    mismatched position; lengths differing by 1 → the shorter equals the
    longer with one character removed."""
    la, lb = len(a), len(b)
    if la == lb:
        if a == b:
            return False
        mismatches = 0
        for x, y in zip(a, b):
            if x != y:
                mismatches += 1
                if mismatches > 1:
                    return False
        return mismatches == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def deletion_keys(s: str) -> List[str]:
    """The blocking-key set for one string: itself plus every single-character
    deletion, de-duplicated (repeated characters collapse keys)."""
    keys = {s}
    for i in range(len(s)):
        keys.add(s[:i] + s[i + 1 :])
    return list(keys)


def edit1_pairs(
    names_ds,
    name_col: str = "name",
    count_col: str = "n",
    num_partitions: int | None = None,
    source_rows: int | None = None,
):
    """All unordered pairs (a < b) of distinct strings in ``names_ds`` at
    Levenshtein distance exactly 1, with ``n_pairs`` = the product of the two
    strings' occurrence counts.

    ``names_ds``: a Ray Dataset of DISTINCT strings + counts (one row per
    distinct value — the output of a ``grouped_agg`` count over the raw
    column).  Returns a pandas DataFrame ``(name_a, name_b, n_pairs)`` —
    output-bounded (true distance-1 pairs only), safe to hold on the driver.

    One exchange total: explode each distinct string to its deletion keys
    (map-side, |s|+1 rows per distinct value), salt by key hash into
    ``num_partitions`` coarse groups (a key's whole group lands in one
    partition — the exact-dedup argument), generate + verify candidate pairs
    inside each partition, and de-duplicate the (rare) pairs that share two
    blocking keys on the driver.

    Partition sizing (ADVICE r4 — never a fixed 16): pass ``source_rows``
    (a footer-metadata upper bound on the distinct-name vocabulary — e.g.
    the source table's row count) and P derives via ``salted_partitions``
    so one 1/P key slice of the exploded (key, name) table stays
    worker-memory-sized at ANY vocabulary; or pass ``num_partitions``
    explicitly (power of two).  With neither, a floor of 16 applies —
    test-scale only.
    """
    from ..sources.tables import salted_partitions
    from .textstats import token_hash64

    if num_partitions is None:
        # each distinct name explodes to ~|s|+1 deletion keys; target the
        # salted-exchange default group size against that fan-out
        num_partitions = salted_partitions(
            0 if source_rows is None else source_rows * 32, floor=16
        )
    P = num_partitions
    if P & (P - 1):
        raise ValueError(f"num_partitions must be a power of two, got {P}")

    def explode(batch: pa.Table) -> pa.Table:
        keys, names, counts, parts = [], [], [], []
        ncol = batch.column(name_col).to_pylist()
        ccol = batch.column(count_col).to_pylist()
        for name, n in zip(ncol, ccol):
            if name is None:
                continue
            for k in deletion_keys(name):
                keys.append(k)
                names.append(name)
                counts.append(n)
                parts.append(token_hash64(k) & (P - 1))
        return pa.table(
            {
                "key": pa.array(keys, pa.large_string()),
                name_col: pa.array(names, pa.large_string()),
                count_col: pa.array(counts, pa.int64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_n = [], [], []
        # group by blocking key inside the partition; groups are
        # neighborhood-sized (strings within one deletion of a common root)
        for _, grp in g.groupby("key", sort=False):
            if len(grp) < 2:
                continue
            names = grp[name_col].tolist()
            counts = grp[count_col].tolist()
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    a, b = names[i], names[j]
                    na, nb = counts[i], counts[j]
                    if a > b:
                        a, b = b, a
                    if edit1_verify(a, b):
                        out_a.append(a)
                        out_b.append(b)
                        out_n.append(int(na) * int(nb))
        return pd.DataFrame(
            {
                "name_a": pd.Series(out_a, dtype=object),
                "name_b": pd.Series(out_b, dtype=object),
                "n_pairs": pd.Series(out_n, dtype="int64"),
            }
        )

    pairs = (
        names_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: pairs_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    ).to_pandas()  # output-bounded: verified distance-1 pairs only

    if len(pairs) == 0:
        return pd.DataFrame(
            {
                "name_a": pd.Series([], dtype=object),
                "name_b": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype="int64"),
            }
        )
    # a substitution pair occasionally shares two blocking keys (repeated
    # characters); keys hash to different partitions, so dedup here
    return (
        pairs.drop_duplicates(["name_a", "name_b"])
        .sort_values(["name_a", "name_b"], ignore_index=True)
    )
