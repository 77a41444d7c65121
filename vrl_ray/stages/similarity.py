"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact top-k cosine per query — numpy matmul of
  each data batch against a broadcast query matrix (ray.put once,
  read in each task), then a driver-side merge of per-batch top-k
  (k × #blocks rows — tiny). This is the baseline.
- ``IvfIndex`` / ``knn_ivf``: the scale path — k-means-lite coarse
  quantizer (deterministic seeded init, few iterations), data bucketed
  by nearest centroid via a shuffle-free ``map_batches`` tag, queries
  probe only ``nprobe`` buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_vecs(batch: pa.Table, vec_column: str) -> np.ndarray:
    col = batch[vec_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy: flat values + reshape (fixed dim)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    return flat.reshape(len(batch), -1)


def knn_brute_force(ds, queries: np.ndarray, k: int = 10,
                    id_column: str = "vec_id", vec_column: str = "embedding"):
    """Exact cosine top-k for each query row. Returns a pyarrow Table
    (query_idx, vec_id, sim rank-ordered)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(q)

    class TopK:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_vecs(batch, vec_column))
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            sims = self.q @ vecs.T  # (nq, batch)
            nq = sims.shape[0]
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            qi, vi, sv = [], [], []
            for r in range(nq):
                for c in part[r]:
                    qi.append(r); vi.append(int(ids[c])); sv.append(float(sims[r, c]))
            return pa.table({"query_idx": pa.array(qi, pa.int32()),
                             id_column: pa.array(vi, pa.int64()),
                             "sim": pa.array(sv, pa.float64())})

    partials = ds.map_batches(TopK, batch_format="pyarrow", concurrency=(1, 8))
    # per-batch top-k partials are tiny (k rows per query per block)
    merged = partials.to_pandas()
    out = (
        merged.sort_values(["query_idx", "sim"], ascending=[True, False])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


class IvfIndex:
    """Deterministic IVF coarse quantizer (k-means with seeded
    kmeans++-lite init, few Lloyd iterations over a sample)."""

    def __init__(self, vectors: np.ndarray, nlist: int = 16, iters: int = 5,
                 seed: int = 11):
        x = _normalize(np.asarray(vectors, dtype=np.float32))
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(x), size=min(nlist, len(x)), replace=False)
        cent = x[np.sort(idx)].copy()
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cent[c] = v / n
        self.centroids = cent

    def assign(self, vectors: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(vectors) @ self.centroids.T, axis=1)


def knn_ivf(ds, queries: np.ndarray, k: int = 10, *, nlist: int = 16,
            nprobe: int = 4, train_sample: int = 4096,
            id_column: str = "vec_id", vec_column: str = "embedding",
            seed: int = 11):
    """IVF-bucketed approximate top-k: train the quantizer on a
    deterministic sample, tag every row with its bucket in one
    map_batches pass, then brute-force only rows whose bucket is among
    each query's ``nprobe`` nearest centroids."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    train = np.array(sample[vec_column].tolist(), dtype=np.float32)
    index = IvfIndex(train, nlist=nlist, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]  # (nq,nprobe)
    probe_sets = [set(map(int, row)) for row in probe]
    state = ray.put((index.centroids, probe_sets, q))

    class ProbeTopK:
        def __init__(self):
            self.centroids, self.probe_sets, self.q = ray.get(state)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_batch_vecs(batch, vec_column))
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            buckets = np.argmax(vecs @ self.centroids.T, axis=1)
            sims = self.q @ vecs.T
            qi, vi, sv = [], [], []
            for qidx, pset in enumerate(self.probe_sets):
                mask = np.isin(buckets, list(pset))
                cols = np.flatnonzero(mask)
                if not len(cols):
                    continue
                s = sims[qidx, cols]
                kk = min(k, len(cols))
                top = cols[np.argpartition(-s, kk - 1)[:kk]]
                for c in top:
                    qi.append(qidx); vi.append(int(ids[c]))
                    sv.append(float(sims[qidx, c]))
            return pa.table({"query_idx": pa.array(qi, pa.int32()),
                             id_column: pa.array(vi, pa.int64()),
                             "sim": pa.array(sv, pa.float64())})

    partials = ds.map_batches(ProbeTopK, batch_format="pyarrow", concurrency=(1, 8))
    merged = partials.to_pandas()
    out = (
        merged.sort_values(["query_idx", "sim"], ascending=[True, False])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)
