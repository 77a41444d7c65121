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
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
# odd multipliers for the rolling k-gram combiner (fixed, deterministic)
_SHINGLE_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                          0x165667B19E3779F9, 0x27D4EB2F165667C5,
                          0x85EBCA77C2B2AE63], dtype=np.uint64)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashed k-word shingles (uint64), fully vectorized: crc32 per
    token (C loop) then a numpy rolling multiply-xor combine over the
    k-window — no per-shingle string building or digest calls."""
    import zlib

    toks = _TOKEN.findall(text.lower())
    if not toks:
        return np.array([0], dtype=np.uint64)
    th = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
    k = min(k, len(th))
    n = len(th) - k + 1
    with np.errstate(over="ignore"):
        out = th[0:n] * _SHINGLE_MULT[0]
        for i in range(1, k):
            out = out ^ (th[i:n + i] * _SHINGLE_MULT[i % len(_SHINGLE_MULT)])
    return out


class MinHasher:
    """num_perm multiply-shift hash 'permutations' over uint64 with
    wraparound (a*x+b mod 2^64, avalanche-mixed) — one vectorized
    (num_perm × n) numpy op per document instead of a Python-bigint
    loop. Seeded, deterministic across workers."""

    def __init__(self, num_perm: int = 128, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(0, _U64_MAX, size=num_perm, dtype=np.uint64)
                  | np.uint64(1))  # odd multipliers
        self.b = rng.integers(0, _U64_MAX, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, _U64_MAX, dtype=np.uint64)
        with np.errstate(over="ignore"):
            v = self.a[:, None] * shingles[None, :] + self.b[:, None]
            v ^= v >> np.uint64(33)  # mix high bits into the low word
        return v.min(axis=1)


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
    pairs within each bucket via a bucket-key self-join. ``max_bucket``
    drops degenerate buckets (all-identical boilerplate) before the
    join so a hot bucket cannot emit O(n^2) pairs."""

    banded = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k,
                                   id_column=id_column, text_column=text_column),
        batch_format="pyarrow", concurrency=(1, 8),
    ).materialize()  # consumed 3× below (counts + both join sides)

    # hot-bucket guard BEFORE the join: a degenerate bucket
    # (boilerplate shared by n docs) would emit O(n²) join rows. The
    # per-bucket counts are a tiny two-phase aggregate; the hot-key
    # set is broadcast once and filtered out.
    from .aggregate import count_by, count_by_small

    # driver combine while the banded table is small; distributed
    # two-phase groupby beyond that (bucket keys are ~one per doc, so
    # the partials are NOT bounded-cardinality at 10^9-doc scale)
    if banded.count() <= 5_000_000:
        counts = count_by_small(banded, ["band", "band_hash"])
    else:
        counts = count_by(banded, ["band", "band_hash"]).to_pandas()
    hot = counts[counts["n"] > max_bucket]
    hot_keys = set(zip(hot["band"], hot["band_hash"]))

    if hot_keys:
        import ray

        hot_ref = ray.put(hot_keys)

        def drop_hot(b: pa.Table) -> pa.Table:
            import ray as _r

            keys = _r.get(hot_ref)
            keep = [
                (band, h) not in keys
                for band, h in zip(b["band"].to_pylist(),
                                   b["band_hash"].to_pylist())
            ]
            return b.filter(pa.array(keep))

        banded = banded.map_batches(drop_hot,
                                    batch_format="pyarrow").materialize()
        if banded.count() == 0:
            # everything was boilerplate: no candidates (the hash join
            # cannot take a fully-empty side)
            import ray.data as rd

            return rd.from_arrow(pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())}))

    # candidate pairs = bucket self-join (hash shuffle on the bucket
    # key — the Ray-native form; per-group Python map_groups costs
    # ~1ms × O(buckets) and dominates at small bucket sizes)
    left = banded.rename_columns({id_column: "id_a"})
    right = banded.rename_columns({id_column: "id_b"})
    joined = left.join(right, join_type="inner", num_partitions=16,
                       on=("band", "band_hash"))

    def upper_triangle(b: pa.Table) -> pa.Table:
        m = pc.less(b["id_a"], b["id_b"])
        t = b.filter(m).select(["id_a", "id_b"])
        if len(t) == 0:
            return pa.table({"id_a": pa.array([], b["id_a"].type),
                             "id_b": pa.array([], b["id_b"].type)})
        return t.group_by(["id_a", "id_b"]).aggregate([]) \
                .select(["id_a", "id_b"])

    pairs = joined.map_batches(upper_triangle, batch_format="pyarrow")
    # global distinct (a pair can collide in several bands/blocks) —
    # aggregate-based, no per-group Python
    from ray.data.aggregate import Count

    return pairs.groupby(["id_a", "id_b"]) \
        .aggregate(Count(alias_name="_dup")).drop_columns(["_dup"])


def verify_pairs_jaccard(pairs_ds, docs_ds, *, threshold: float = 0.8,
                         k: int = 3, id_column: str = "doc_id",
                         text_column: str = "text"):
    """Exact-Jaccard verification of LSH candidates. The docs side is
    broadcast as an id->text dict (small side — candidates reference
    only docs that collided; for 100 TB inputs swap this for a
    bucket-partitioned join on id ranges, same call shape)."""
    import ray

    mat = docs_ds.select_columns([id_column, text_column]).materialize()
    lookup = {}
    for b in ray.get(mat.to_arrow_refs()):
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
        import zlib

        toks = _TOKEN.findall((text or "").lower())
        if not toks:
            return 0
        # 64-bit token hashes from crc32 + two-multiplier mixing
        # (vectorized — a digest call per token costs ~50× more)
        t32 = np.array([zlib.crc32(t.encode()) for t in toks],
                       dtype=np.uint64)
        with np.errstate(over="ignore"):
            hs = (t32 * _SHINGLE_MULT[0]) ^ ((t32 + np.uint64(0x9E37)) *
                                             _SHINGLE_MULT[1])
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hs)
        fp = np.sum((votes > 0).astype(np.uint64) <<
                    np.arange(64, dtype=np.uint64))
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

    # bucket self-join on the band key (same idiom as MinHash-LSH),
    # then vectorized hamming verify: XOR + popcount over numpy
    left = banded.rename_columns({id_column: "id_a", "fp": "fp_a"})
    right = banded.rename_columns({id_column: "id_b", "fp": "fp_b"})
    joined = left.join(right, join_type="inner", num_partitions=16,
                       on=("band", "band_key"))

    _POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1)

    def verify(b: pa.Table) -> pa.Table:
        m = pc.less(b["id_a"], b["id_b"])
        t = b.filter(m)
        if len(t) == 0:
            return pa.table({"id_a": pa.array([], b["id_a"].type),
                             "id_b": pa.array([], b["id_b"].type),
                             "hamming": pa.array([], pa.int64())})
        fa = t["fp_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        fb = t["fp_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = (fa ^ fb).view(np.uint8).reshape(-1, 8)
        ham = _POP[x].sum(axis=1).astype(np.int64)
        t = t.append_column("hamming", pa.array(ham))
        t = t.filter(pc.less_equal(t["hamming"], max_hamming))
        return t.select(["id_a", "id_b", "hamming"])

    pairs = joined.map_batches(verify, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


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
