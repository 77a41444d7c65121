"""Deduplication stages for large-scale training-data pipelines.

All variants are expressed Ray-Data-first:

- **exact**: vectorized content-hash per batch → two-phase
  groupby(hash) keeping the minimum id. The shuffle moves only
  (hash, id) pairs, never the payload.
- **MinHash + LSH**: per-batch shingle→minhash (numpy, vectorized over
  the batch) → explode to (band, band_hash, doc_id) rows → groupby
  band bucket → candidate pairs → exact-Jaccard verification of
  candidates only. Banding parameters (num_perm, bands) trade recall
  vs shuffle volume; hot buckets are capped (documented skew guard).
- **SimHash**: 64-bit fingerprint per doc (vectorized token hashing);
  near-dup = hamming distance ≤ k over banded buckets.
- **n-gram Jaccard**: exact pairwise verify used on LSH candidates.
- **embedding cosine**: block-matmul near-dup detection over
  normalized embedding vectors (numpy), candidates above threshold.

Determinism: all hash seeds fixed; no wall clock.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup


def add_content_hash(batch: pa.Table, column: str = "text",
                     out: str = "content_hash") -> pa.Table:
    """md5 content hash per row (hashlib releases the GIL; the loop is
    C-bound). Used as the dedup/partition key."""
    texts = batch[column].to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
         for t in texts]
    return batch.append_column(out, pa.array(h, pa.string()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Keep the min-id row per distinct content. Returns a Dataset of
    surviving ids (join back for payloads if needed). Two-phase: the
    per-batch combiner collapses within-batch dups before the shuffle.
    """
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, column).select(["content_hash", id_column]),
        batch_format="pyarrow",
    )

    def batch_min(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        g = b.group_by(["content_hash"]).aggregate([(id_column, "min")])
        return g.rename_columns(["content_hash", id_column])

    partial = hashed.map_batches(batch_min, batch_format="pyarrow")
    out = partial.groupby("content_hash").aggregate(Min(id_column, alias_name=id_column))
    return out.select_columns([id_column])


# ---------------------------------------------------------------------------
# shingling + MinHash

_TOKEN = re.compile(r"\w+")
_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashed k-word shingles (uint64)."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
    return out


class MinHasher:
    """num_perm universal-hash permutations (ax+b mod p), seeded."""

    def __init__(self, num_perm: int = 128, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n) universal hashing in uint64 (mod 2^61-1)
        x = shingles.astype(np.object_)  # python ints avoid overflow
        sig = np.empty(self.num_perm, dtype=np.uint64)
        for j in range(self.num_perm):
            v = (int(self.a[j]) * x + int(self.b[j])) % _MERSENNE
            sig[j] = int(min(v))
        return sig


class MinHashLSH:
    """map_batches stage: text -> (doc_id, band, band_hash) rows
    (one-to-many explode). Stateful (permutation table) → actor pool.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 id_column: str = "doc_id", text_column: str = "text"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.id_column = id_column
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        texts = batch[self.text_column].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = self.mh.signature(_shingle_hashes(t or "", self.k))
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_id.append(i)
                out_band.append(b)
                out_hash.append(h)
        return pa.table({
            self.id_column: pa.array(out_id),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
        })


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard (candidate verification)."""
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def minhash_candidate_pairs(ds, *, num_perm: int = 64, bands: int = 16,
                            k: int = 3, id_column: str = "doc_id",
                            text_column: str = "text",
                            max_bucket: int = 64):
    """LSH candidate pairs: explode to band rows, groupby bucket, emit
    pairs within each bucket. ``max_bucket`` caps degenerate buckets
    (all-identical boilerplate) so a hot bucket cannot emit O(n^2)
    pairs — capped buckets are truncated deterministically by id order
    and the cap is recorded in the output (``truncated``)."""
    import pandas as pd

    banded = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k,
                                   id_column=id_column, text_column=text_column),
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_column].tolist())
        truncated = len(ids) > max_bucket
        ids = ids[:max_bucket]
        rows = []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                rows.append((ids[x], ids[y], truncated))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "truncated"])

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    # distinct pairs across bands (a pair can collide in many bands)
    def batch_distinct(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        g = b.group_by(["id_a", "id_b"]).aggregate([("truncated", "max")])
        return g.rename_columns(["id_a", "id_b", "truncated"])

    from ray.data.aggregate import Max
    pairs = pairs.map_batches(batch_distinct, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("truncated", alias_name="truncated"))


def verify_pairs_jaccard(pairs_ds, docs_ds, *, threshold: float = 0.8,
                         k: int = 3, id_column: str = "doc_id",
                         text_column: str = "text"):
    """Exact-Jaccard verification of LSH candidates. The docs side is
    broadcast as an id->text dict (small side — candidates reference
    only docs that collided; for 100 TB inputs swap this for a
    bucket-partitioned join on id ranges, same call shape)."""
    import ray

    lookup = {}
    for b in docs_ds.select_columns([id_column, text_column]).iter_batches(
            batch_format="pyarrow"):
        lookup.update(zip(b[id_column].to_pylist(), b[text_column].to_pylist()))
    ref = ray.put(lookup)

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ia = batch["id_a"].to_pylist()
            ib = batch["id_b"].to_pylist()
            sims = [ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""), k)
                    for a, b in zip(ia, ib)]
            out = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# SimHash


class SimHash:
    """64-bit SimHash fingerprints, vectorized per batch: token hashes
    via blake2b, bit-vote accumulation in numpy."""

    def __init__(self, text_column: str = "text", out: str = "simhash"):
        self.text_column = text_column
        self.out = out

    @staticmethod
    def fingerprint(text: str) -> int:
        toks = _TOKEN.findall((text or "").lower())
        if not toks:
            return 0
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                            "little") for t in toks],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.sum(axis=0) * 2 - len(hs)
        fp = np.uint64(0)
        for i in np.flatnonzero(votes > 0):
            fp |= np.uint64(1) << np.uint64(i)
        return int(fp)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch[self.text_column].to_pylist()]
        return batch.append_column(self.out, pa.array(fps, pa.uint64()))


def simhash_near_dups(ds, *, max_hamming: int = 3, id_column: str = "doc_id",
                      text_column: str = "text", band_bits: int = 16):
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    64/band_bits chunks (any pair within hamming<=k shares at least
    one identical band when k < #bands) → groupby band bucket →
    verify hamming distance within bucket."""
    import pandas as pd

    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1

    def explode(batch: pa.Table) -> pa.Table:
        sh = SimHash(text_column)
        fps = [sh.fingerprint(t) for t in batch[text_column].to_pylist()]
        ids = batch[id_column].to_pylist()
        oi, ob, oh, of = [], [], [], []
        for i, fp in zip(ids, fps):
            for b in range(nbands):
                oi.append(i); ob.append(b)
                oh.append((fp >> (b * band_bits)) & mask)
                of.append(fp)
        return pa.table({id_column: oi, "band": pa.array(ob, pa.int32()),
                         "band_key": pa.array(oh, pa.int64()),
                         "fp": pa.array(of, pa.uint64())})

    banded = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        recs = sorted(g[[id_column, "fp"]].drop_duplicates().itertuples(index=False))
        for x in range(len(recs)):
            for y in range(x + 1, len(recs)):
                d = int(bin(int(recs[x][1]) ^ int(recs[y][1])).count("1"))
                if d <= max_hamming:
                    rows.append((recs[x][0], recs[y][0], d))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    pairs = banded.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")

    def distinct(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        g = b.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")])
        return g.rename_columns(["id_a", "id_b", "hamming"])

    from ray.data.aggregate import Min
    pairs = pairs.map_batches(distinct, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dups(ds, *, threshold: float = 0.95,
                        id_column: str = "vec_id",
                        vec_column: str = "embedding",
                        block: int = 2048):
    """Near-dup pairs with cosine >= threshold.

    Scale path: normalized vectors, blocked matmul of each batch
    against a broadcast matrix of all vectors (ray.put once, read per
    actor). O(n^2) flops but memory-bounded by block size; for 100 TB
    swap the broadcast side for IVF buckets (similarity.py) — the call
    shape stays identical."""
    import ray

    mats, ids = [], []
    for b in ds.select_columns([id_column, vec_column]).iter_batches(
            batch_format="pyarrow"):
        ids.extend(b[id_column].to_pylist())
        mats.append(np.array(b[vec_column].to_pylist(), dtype=np.float32))
    all_vecs = np.vstack(mats)
    norms = np.linalg.norm(all_vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    all_vecs = all_vecs / norms
    all_ids = np.array(ids)
    ref = ray.put((all_ids, all_vecs))

    class NearDup:
        def __init__(self):
            self.ids, self.vecs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.array(batch[id_column].to_pylist())
            q = np.array(batch[vec_column].to_pylist(), dtype=np.float32)
            n = np.linalg.norm(q, axis=1, keepdims=True)
            n[n == 0] = 1.0
            q = q / n
            sims = q @ self.vecs.T  # (batch, all)
            ia, ib, ss = [], [], []
            for r in range(sims.shape[0]):
                hits = np.flatnonzero(sims[r] >= threshold)
                for c in hits:
                    if bids[r] < self.ids[c]:  # each pair once
                        ia.append(int(bids[r])); ib.append(int(self.ids[c]))
                        ss.append(float(sims[r, c]))
            return pa.table({"id_a": pa.array(ia, pa.int64()),
                             "id_b": pa.array(ib, pa.int64()),
                             "cosine": pa.array(ss, pa.float64())})

    return ds.map_batches(NearDup, batch_format="pyarrow",
                          batch_size=block, concurrency=(1, 8))
