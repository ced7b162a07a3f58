"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

* ``topk_cosine`` — exact brute force, the correctness baseline: the query
  matrix is broadcast once (``ray.put``), each batch does one float64
  matmul, keeps its local top-k, and only |blocks|×k candidate rows reach
  the final global top-k.  This is the canonical broadcast-small-side
  pattern — no shuffle at any scale.
* ``ivf_topk`` — the scale path: k-means-style coarse quantizer (trained on
  a driver-side sample), vectors partitioned by nearest centroid
  (``groupby(cluster)`` done once, reusable), query probes only the
  ``nprobe`` nearest centroids.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .numeric import sql_round


def embedding_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix via flatten+reshape —
    no per-row Python lists (embeddings are non-null, equal-length)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return flat.reshape(n, -1)


def _batch_scores(batch: pa.Table, q: np.ndarray) -> tuple:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    mat = embedding_matrix(batch.column("embedding"))
    norms = np.linalg.norm(mat, axis=1)
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / np.maximum(norms, 1e-12)
    return ids, scores


def topk_cosine(ds, query_vec, k: int = 20, round_digits: int = 5):
    """Exact cosine top-k: per-batch local top-k → tiny global top-k.

    Returns a Dataset with (vec_id, score) — score rounded for stable
    cross-engine comparison, ties broken by vec_id ascending.
    """
    import ray

    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids, scores = _batch_scores(batch, q)
        if len(ids) > k:
            part = np.argpartition(-scores, k)[:k]
            ids, scores = ids[part], scores[part]
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(sql_round(scores, round_digits))],
            names=["vec_id", "score"],
        )

    return (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["score", "vec_id"], descending=[True, False])
        .limit(k)
    )


class IVFIndex:
    """Coarse-quantizer index: centroids trained once on a sample.

    Build: ``IVFIndex.train(ds, n_clusters)`` (driver-side sample k-means —
    the sample, not the corpus, bounds memory), then ``assign(ds)`` adds a
    ``cluster`` column in one streaming pass.  Search probes only the
    nearest ``nprobe`` centroid partitions — at 10^12 vectors this turns a
    full scan into a ~nprobe/n_clusters fraction scan.
    """

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (C, dim), L2-normalized

    @classmethod
    def train(
        cls,
        ds,
        n_clusters: int = 16,
        sample_fraction: float = 0.25,
        iters: int = 10,
        seed: int = 3,
        max_sample: int = 100_000,
    ) -> "IVFIndex":
        # absolute cap on top of the fraction: a fraction-based sample is
        # unbounded at corpus scale (0.25 of 10^12 rows is not a driver-side
        # sample); limit() keeps the k-means input ≤ max_sample rows
        sample = (
            ds.select_columns(["embedding"])
            .random_sample(sample_fraction, seed=seed)
            .limit(max_sample)
            .take_all()
        )
        mat = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        rng = np.random.RandomState(seed)
        cents = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(mat @ cents.T, axis=1)
            for c in range(len(cents)):
                members = mat[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    cents[c] = v / max(np.linalg.norm(v), 1e-12)
        return cls(cents)

    def assign(self, ds):
        import ray

        cents_ref = ray.put(self.centroids)

        def tag(batch: pa.Table) -> pa.Table:
            cents = ray.get(cents_ref)
            mat = embedding_matrix(batch.column("embedding"))
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cluster = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cluster))

        return ds.map_batches(tag, batch_format="pyarrow")

    def refine(self, ds, iters: int = 1) -> "IVFIndex":
        """Distributed spherical-k-means refinement over the FULL corpus —
        the iterative-algorithm shape the driver-sample ``train`` can't
        give: each Lloyd iteration is one streaming pass where every block
        emits ≤ n_clusters (Σvectors, count) partials via ``add.reduceat``,
        a tree-combine ``map_batches`` level folds ~1024 block partials per
        task, and the driver folds only clusters × (blocks/1024) rows into
        renormalized centroids (empty clusters keep their centroid).

        Spherical k-means is monotone: argmax-cosine assignment and
        normalized-mean update each cannot decrease Σ max-cosine
        (``objective``) — pinned by test."""
        import ray

        from .broadcast import get_cached

        emb = ds.select_columns(["embedding"])
        for _ in range(iters):
            cents_ref = ray.put(self.centroids)

            def partial(batch: pa.Table) -> pa.Table:
                cents = get_cached(cents_ref)
                mat = embedding_matrix(batch.column("embedding"))
                mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                assign = np.argmax(mat @ cents.T, axis=1)
                order = np.argsort(assign, kind="stable")
                sa, sm = assign[order], mat[order]
                uniq, starts = np.unique(sa, return_index=True)
                sums = np.add.reduceat(sm, starts, axis=0)
                counts = np.diff(np.append(starts, len(sa)))
                dim = mat.shape[1]
                return pa.Table.from_arrays(
                    [
                        pa.array(uniq.astype(np.int64)),
                        pa.array(counts.astype(np.int64)),
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(sums.ravel(), type=pa.float64()), dim
                        ),
                    ],
                    names=["cluster", "n", "vec_sum"],
                )

            def combine(batch: pa.Table) -> pa.Table:
                cl = batch.column("cluster").to_numpy(zero_copy_only=False)
                ns = batch.column("n").to_numpy(zero_copy_only=False)
                sums = embedding_matrix(batch.column("vec_sum"))
                order = np.argsort(cl, kind="stable")
                sc = cl[order]
                uniq, starts = np.unique(sc, return_index=True)
                merged = np.add.reduceat(sums[order], starts, axis=0)
                counts = np.add.reduceat(ns[order], starts)
                dim = sums.shape[1]
                return pa.Table.from_arrays(
                    [
                        pa.array(uniq.astype(np.int64)),
                        pa.array(counts.astype(np.int64)),
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(merged.ravel(), type=pa.float64()), dim
                        ),
                    ],
                    names=["cluster", "n", "vec_sum"],
                )

            parts = (
                emb.map_batches(partial, batch_format="pyarrow")
                .map_batches(combine, batch_format="pyarrow", batch_size=1024)
                .to_pandas()
            )
            new_cents = self.centroids.copy()
            for cluster, g in parts.groupby("cluster"):
                vec = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0)
                norm = np.linalg.norm(vec)
                if norm > 1e-12:
                    new_cents[int(cluster)] = vec / norm
            self.centroids = new_cents
        return self

    def objective(self, ds) -> float:
        """Σ max-cosine of every corpus vector to its nearest centroid —
        the spherical-k-means objective, from one scalar partial per
        block."""
        import ray

        from .broadcast import get_cached

        cents_ref = ray.put(self.centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cents = get_cached(cents_ref)
            mat = embedding_matrix(batch.column("embedding"))
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            best = (mat @ cents.T).max(axis=1)
            return pa.Table.from_pydict({"s": pa.array([float(best.sum())])})

        parts = (
            ds.select_columns(["embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
        return float(parts["s"].sum())

    def probe_clusters(self, query_vec, nprobe: int) -> List[int]:
        """The ``nprobe`` centroid ids nearest to the query."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / np.linalg.norm(q)
        return [int(c) for c in np.argsort(-(self.centroids @ qn))[:nprobe]]

    def write_index(self, ds, index_dir: str) -> None:
        """Materialize the cluster assignment ONCE as cluster-partitioned
        parquet (``index_dir/cluster=N/``) — the layout that makes IVF's
        promise real: a search reads only the probed directories, a
        ~nprobe/n_clusters fraction of the corpus, instead of scanning
        everything to filter by cluster membership.  Build cost is one
        streaming pass + one partitioned write; the index is reusable
        across queries."""
        import os
        import shutil

        if os.path.exists(index_dir):
            # write_parquet appends uniquely-named files; a stale index dir
            # would duplicate rows
            shutil.rmtree(index_dir)
        self.assign(ds).write_parquet(index_dir, partition_cols=["cluster"])

    @staticmethod
    def probe_paths(index_dir: str, clusters: List[int]) -> List[str]:
        """Existing partition directories for the probed clusters (a probe
        cluster that captured no vectors has no directory)."""
        import os

        paths = []
        for c in clusters:
            p = os.path.join(index_dir, f"cluster={c}")
            if os.path.isdir(p):
                paths.append(p)
        return paths

    def search_partitioned(
        self, index_dir: str, query_vec, k: int = 20, nprobe: int = 4
    ):
        """Top-k reading ONLY the ``nprobe`` probed cluster partitions of a
        ``write_index`` output — the scan never touches unprobed data."""
        import os

        import ray.data

        dirs = self.probe_paths(index_dir, self.probe_clusters(query_vec, nprobe))
        # read_parquet with a path LIST expects files, not directories —
        # expand each probed partition dir to its fragment files
        paths = [
            os.path.join(d, f)
            for d in dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        if not paths:
            return ray.data.from_arrow(
                pa.Table.from_arrays(
                    [pa.array([], type=pa.int64()), pa.array([], type=pa.float64())],
                    names=["vec_id", "score"],
                )
            )
        cand = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
        return topk_cosine(cand, query_vec, k=k)

    def search(self, assigned_ds, query_vec, k: int = 20, nprobe: int = 4):
        """Filter-based fallback over an in-memory assigned Dataset: correct,
        but it SCANS every vector to test cluster membership — use
        ``write_index`` + ``search_partitioned`` when the corpus lives in
        storage (the 100 TB path)."""
        probe_set = self.probe_clusters(query_vec, nprobe)

        import pyarrow.compute as pc

        candidates = assigned_ds.map_batches(
            lambda b: b.filter(pc.is_in(b.column("cluster"), value_set=pa.array(probe_set))),
            batch_format="pyarrow",
        )
        return topk_cosine(candidates, query_vec, k=k)


def pca_project(ds, n_components: int = 8, round_digits: int = 6):
    """Distributed PCA projection of an embedding column.

    Pass 1 reduces each BLOCK to its moment partials (n, Σx, XᵀX) — 1 + dim
    + dim² numbers per block cross the exchange, never the vectors; the
    dim×dim covariance eigendecomposition runs on the driver (trivial for
    embedding dims); pass 2 is a streaming mean-center + matmul projection
    with the (mean, W) pair broadcast once via ``ray.put``.

    Determinism: partials are folded in first-vec_id order and each
    component's sign is fixed so its largest-|w| element is positive, so
    the same input yields bit-identical output at any parallelism (up to
    the documented 1e-15 partial-fold reassociation, absorbed by
    ``round_digits``).

    Returns a Dataset (vec_id, pca list<double>).
    """
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch.column("embedding")).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "first_id": [int(pc.min(batch.column("vec_id")).as_py())],
                "n": [x.shape[0]],
                "s": [x.sum(axis=0).tolist()],
                "xtx": [(x.T @ x).ravel().tolist()],
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values("first_id", ignore_index=True)
    n = int(parts["n"].sum())
    dim = len(parts["s"].iloc[0])
    s = np.zeros(dim)
    xtx = np.zeros((dim, dim))
    for i in range(len(parts)):
        s += np.asarray(parts["s"].iloc[i])
        xtx += np.asarray(parts["xtx"].iloc[i]).reshape(dim, dim)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][: min(n_components, dim)]
    w = evecs[:, order]
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])])
    w = w * np.where(flip == 0, 1.0, flip)
    wref = ray.put((mean, w))

    def project(batch: pa.Table) -> pa.Table:
        m, wm = ray.get(wref)
        x = embedding_matrix(batch.column("embedding")).astype(np.float64)
        proj = np.round((x - m) @ wm, round_digits)
        return pa.Table.from_arrays(
            [
                batch.column("vec_id"),
                pa.array(proj.tolist(), type=pa.list_(pa.float64())),
            ],
            names=["vec_id", "pca"],
        )

    return ds.map_batches(project, batch_format="pyarrow")
