"""Tests for the dedup + similarity stages (SURVEY §2.4 /
training-data-pipeline components): exact dedup, MinHash+LSH,
SimHash, embedding near-dup, brute-force and IVF ANN."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_table():
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest looking for food")
    near = base.replace("green", "dark")          # one-token edit
    other = ("completely different content about databases indexes and "
             "query planners with nothing shared at all here")
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([base, base, near, other, "short text"]),
    })


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


class TestExactDedup:
    def test_keeps_min_id_per_content(self, docs_ds):
        from vrl_ray.stages.dedup import exact_dedup

        kept = sorted(r["doc_id"] for r in exact_dedup(
            docs_ds, column="text", id_column="doc_id").take_all())
        # doc 2 is an exact dup of doc 1 → dropped
        assert kept == [1, 3, 4, 5]


class TestMinHash:
    def test_signature_deterministic_across_instances(self):
        from vrl_ray.stages.dedup import MinHasher, _shingle_hashes

        s = _shingle_hashes("a b c d e f g", 3)
        a = MinHasher(64).signature(s)
        b = MinHasher(64).signature(s)
        assert np.array_equal(a, b)

    def test_similar_docs_share_signature_entries(self):
        from vrl_ray.stages.dedup import MinHasher, _shingle_hashes

        t = _docs_table()
        mh = MinHasher(128)
        sig_base = mh.signature(_shingle_hashes(t["text"][0].as_py(), 3))
        sig_near = mh.signature(_shingle_hashes(t["text"][2].as_py(), 3))
        sig_other = mh.signature(_shingle_hashes(t["text"][3].as_py(), 3))
        sim_near = float((sig_base == sig_near).mean())
        sim_other = float((sig_base == sig_other).mean())
        assert sim_near > 0.5 > sim_other

    def test_lsh_finds_near_dups_and_verifies(self, docs_ds):
        from vrl_ray.stages.dedup import (minhash_candidate_pairs,
                                          verify_pairs_jaccard)

        pairs = minhash_candidate_pairs(docs_ds, num_perm=64, bands=16)
        verified = verify_pairs_jaccard(pairs, docs_ds, threshold=0.5)
        got = {(r["id_a"], r["id_b"]) for r in verified.take_all()}
        assert (1, 2) in got          # exact dup
        assert (1, 3) in got and (2, 3) in got   # near dup
        assert not any(4 in p or 5 in p for p in got)

    def test_hot_bucket_guard_caps_output(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.dedup import minhash_candidate_pairs

        # 40 identical docs → one degenerate bucket; cap at 8 drops it
        t = pa.table({
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": pa.array(["same boilerplate text here"] * 40),
        })
        pairs = minhash_candidate_pairs(rd.from_arrow(t), num_perm=64,
                                        bands=16, max_bucket=8)
        assert pairs.count() == 0


class TestSimHash:
    def test_fingerprint_properties(self):
        from vrl_ray.stages.dedup import SimHash

        t = _docs_table()
        fp1 = SimHash.fingerprint(t["text"][0].as_py())
        fp2 = SimHash.fingerprint(t["text"][2].as_py())
        fp3 = SimHash.fingerprint(t["text"][3].as_py())
        assert fp1 == SimHash.fingerprint(t["text"][0].as_py())
        ham12 = bin(fp1 ^ fp2).count("1")
        ham13 = bin(fp1 ^ fp3).count("1")
        assert ham12 < ham13

    def test_near_dups_pipeline(self, docs_ds):
        from vrl_ray.stages.dedup import simhash_near_dups

        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in simhash_near_dups(docs_ds, max_hamming=3).take_all()}
        assert got[(1, 2)] == 0       # identical docs, hamming 0
        assert all(h <= 3 for h in got.values())


class TestEmbeddingSimilarity:
    @pytest.fixture()
    def vecs_ds(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        base = rng.normal(size=(20, 16)).astype(np.float32)
        base[1] = base[0] + 0.01 * rng.normal(size=16)  # near-dup of 0
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in base],
                                  pa.list_(pa.float32())),
        }))

    def test_near_dups(self, vecs_ds):
        from vrl_ray.stages.dedup import embedding_near_dups

        got = {(r["id_a"], r["id_b"]) for r in
               embedding_near_dups(vecs_ds, threshold=0.95).take_all()}
        assert got == {(0, 1)}

    def test_knn_brute_force_exact(self, vecs_ds):
        import ray

        from vrl_ray.stages.similarity import knn_brute_force

        mat = vecs_ds.materialize()
        tbl = pa.concat_tables(ray.get(mat.to_arrow_refs()))
        vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        q = vecs[:2]
        out = knn_brute_force(mat, q, k=3).to_pandas()
        # numpy ground truth
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = qn @ vn.T
        for qi in range(2):
            want = list(np.argsort(-sims[qi])[:3])
            got = list(out[out["query_idx"] == qi]
                       .sort_values("rank")["vec_id"]) if "rank" in out else \
                list(out[out["query_idx"] == qi]["vec_id"])
            assert set(got) == set(want)


class TestIVF:
    def test_ivf_recall_vs_brute_force(self, ray_session):
        import ray
        import ray.data as rd

        from vrl_ray.stages.similarity import knn_brute_force, knn_ivf

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(400, 24)).astype(np.float32)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })).materialize()
        q = vecs[:3].astype(np.float64)
        exact = knn_brute_force(ds, q, k=10).to_pandas()
        approx = knn_ivf(ds, q, k=10, nlist=8, nprobe=4).to_pandas()
        recalls = []
        for qi in range(3):
            want = set(exact[exact["query_idx"] == qi]["vec_id"])
            got = set(approx[approx["query_idx"] == qi]["vec_id"])
            recalls.append(len(want & got) / len(want))
        # nprobe=half the lists → high recall expected
        assert sum(recalls) / len(recalls) >= 0.6, recalls
