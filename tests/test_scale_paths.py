"""Scale-path tests for the round-2 rewrites: distributed LSH verify,
block-pair exact embedding near-dup, bucketed approximate near-dup,
real IVF pruning, and the bounded-partition window operators.

These guard the 100-TB properties VERDICT r1 flagged: no driver-side
materialization in stages/, FLOPs that scale with nprobe, and
windows with per-PARTITION (not per-key) Python overhead.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _clustered_vecs(n_clusters=8, per_cluster=60, dim=24, seed=5):
    """Clustered embeddings — the regime IVF is built for."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 4
    vecs = np.vstack([
        centers[i] + rng.normal(size=(per_cluster, dim)).astype(np.float32)
        for i in range(n_clusters)
    ])
    return vecs


def _vec_ds(vecs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })).materialize()


class TestNoDriverMaterialization:
    def test_stages_never_pull_datasets_to_driver(self):
        """The repo invariant (CLAUDE.md rule 1 + VERDICT r1 §wrong):
        no stage may pull a whole dataset to the driver. Source scan —
        iter_batches/iter_rows/to_pandas on big data are banned in
        stages/."""
        import vrl_ray.stages as stages

        root = os.path.dirname(stages.__file__)
        for path in glob.glob(os.path.join(root, "*.py")):
            src = open(path).read()
            for banned in ("iter_batches", "iter_rows"):
                assert banned not in src, f"{path} uses {banned}"


class TestDistributedJaccardVerify:
    def test_matches_direct_jaccard(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.dedup import ngram_jaccard, verify_pairs_jaccard

        texts = {
            1: "the quick brown fox jumps over the lazy dog every day",
            2: "the quick brown fox jumps over the lazy dog every night",
            3: "completely unrelated text about arrow kernels and joins",
            4: "the quick brown fox jumps over the lazy dog every day",
        }
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
        }))
        pairs = rd.from_arrow(pa.table({
            "id_a": pa.array([1, 1, 2], pa.int64()),
            "id_b": pa.array([2, 3, 4], pa.int64()),
        }))
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in verify_pairs_jaccard(pairs, docs,
                                             threshold=0.5).take_all()}
        assert set(got) == {(1, 2), (2, 4)}
        assert got[(1, 2)] == pytest.approx(ngram_jaccard(texts[1], texts[2]))

    def test_join_path_matches_broadcast_path(self, ray_session):
        """The large-candidate join path must agree with the
        candidate-bounded broadcast path (force it via
        broadcast_limit=0)."""
        import ray.data as rd

        from vrl_ray.stages.dedup import verify_pairs_jaccard

        texts = {i: f"shared words alpha beta gamma delta {i % 3}"
                 for i in range(1, 9)}
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
        }))
        ia, ib = zip(*[(a, b) for a in texts for b in texts if a < b])
        pairs = rd.from_arrow(pa.table({
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64())}))
        fast = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                for r in verify_pairs_jaccard(
                    pairs, docs, threshold=0.5).take_all()}
        slow = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                for r in verify_pairs_jaccard(
                    pairs, docs, threshold=0.5,
                    broadcast_limit=0).take_all()}
        assert fast == slow and fast

    def test_empty_pairs(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.dedup import verify_pairs_jaccard

        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x"])}))
        pairs = rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
        assert verify_pairs_jaccard(pairs, docs).count() == 0


class TestExactNearDupBlockJoin:
    def test_matches_numpy_all_pairs(self, ray_session):
        """Exact block-pair self-join at a size that forces several
        buckets — identical pairs to a numpy O(n²) reference."""
        from vrl_ray.stages.dedup import embedding_near_dups

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(300, 16)).astype(np.float32)
        # plant near-dups across the id space
        for a, b in [(0, 299), (17, 120), (45, 46)]:
            vecs[b] = vecs[a] + 0.01 * rng.normal(size=16).astype(np.float32)
        ds = _vec_ds(vecs)

        got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
               embedding_near_dups(ds, threshold=0.95,
                                   num_buckets=5).take_all()}

        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vn @ vn.T
        want = {(a, b) for a in range(300) for b in range(a + 1, 300)
                if sims[a, b] >= 0.95}
        assert set(got) == want
        for (a, b), c in got.items():
            assert c == pytest.approx(float(sims[a, b]), abs=1e-5)

    def test_bucket_count_scales_with_n(self, ray_session):
        from vrl_ray.stages.dedup import embedding_near_dups

        vecs = np.eye(8, dtype=np.float32)  # tiny, orthogonal — no pairs
        ds = _vec_ds(vecs)
        assert embedding_near_dups(ds, threshold=0.9).count() == 0


class TestApproxNearDupLSH:
    def test_recalls_planted_near_dups(self, ray_session):
        from vrl_ray.stages.dedup import embedding_near_dups_lsh

        vecs = _clustered_vecs()
        rng = np.random.default_rng(9)
        planted = [(0, 480 - 1), (100, 250), (300, 301)]
        for a, b in planted:
            vecs[b] = vecs[a] + 0.01 * rng.normal(size=vecs.shape[1]) \
                .astype(np.float32)
        ds = _vec_ds(vecs)
        got = {(r["id_a"], r["id_b"]) for r in
               embedding_near_dups_lsh(ds, threshold=0.99, nlist=8,
                                       assign=2).take_all()}
        for a, b in planted:
            assert (min(a, b), max(a, b)) in got
        # and no false positives: every reported pair really is >= 0.99
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for a, b in got:
            assert float(vn[a] @ vn[b]) >= 0.99 - 1e-5


class TestIvfPruning:
    def test_recall_at_10_on_clustered_data(self, ray_session):
        from vrl_ray.stages.similarity import knn_brute_force, knn_ivf

        vecs = _clustered_vecs()
        ds = _vec_ds(vecs)
        q = vecs[:5].astype(np.float64)
        exact = knn_brute_force(ds, q, k=10).to_pandas()
        approx = knn_ivf(ds, q, k=10, nlist=8, nprobe=4).to_pandas()
        recalls = []
        for qi in range(5):
            want = set(exact[exact["query_idx"] == qi]["vec_id"])
            got = set(approx[approx["query_idx"] == qi]["vec_id"])
            recalls.append(len(want & got) / len(want))
        assert sum(recalls) / len(recalls) >= 0.9, recalls

    def test_flops_scale_with_nprobe(self):
        """The pruning evidence VERDICT asked for: rows entering the
        fine matmul (n_scored) must scale with nprobe, not stay at
        n."""
        from vrl_ray.stages.similarity import (IvfIndex, _normalize,
                                               probe_topk_batch)

        vecs = _clustered_vecs()
        index = IvfIndex(vecs, nlist=8, seed=3)
        q = _normalize(vecs[:3].astype(np.float32))
        batch = pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        })

        def scored(nprobe):
            order = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]
            mask = np.zeros((len(q), len(index.centroids)), dtype=bool)
            for i, row in enumerate(order):
                mask[i, row] = True
            _, n_scored = probe_topk_batch(index.centroids, mask, q, batch,
                                           10, "vec_id", "embedding")
            return n_scored

        n = len(vecs)
        s1, s4, s8 = scored(1), scored(4), scored(8)
        assert s8 == n                      # probe everything → full scan
        assert s1 < s4 < s8                 # monotone in nprobe
        assert s1 <= n * 0.55               # 1/8 lists (3 queries) ≪ full


class TestWindowOps:
    @pytest.fixture()
    def events(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(2)
        n = 5000
        users = rng.integers(0, 400, size=n)
        ts = np.datetime64("2024-01-01", "us") + \
            rng.integers(0, 86400_000_000, size=n).astype("timedelta64[us]")
        t = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "value": pa.array(rng.uniform(0, 100, size=n).round(2)),
        })
        return rd.from_arrow(t), t.to_pandas()

    def test_partition_count_scales_with_rows(self):
        """VERDICT r4 item 1: a fixed 64-partition window puts
        dataset/64 rows into ONE map_groups task — the count must grow
        with the input so a 100x input cannot OOM a worker."""
        from vrl_ray.stages.window import window_partitions

        assert window_partitions() == 64                      # legacy default
        assert window_partitions(rows=100_000) == 64          # small floor
        assert window_partitions(rows=2_000_000) == 64
        big = window_partitions(rows=1_000_000_000)
        bigger = window_partitions(rows=10_000_000_000)
        assert big == 500 and bigger == 5000                  # ceil(rows/2M)
        assert bigger > big                                   # monotone
        assert window_partitions(rows=10**12) == 8192         # hi cap
        assert window_partitions(7) == 7                      # override

    def test_running_sum_rows_aware_still_correct(self, events):
        """rows= changes only the partition COUNT, never the result."""
        from vrl_ray.stages.window import running_sum

        ds, df = events
        got = running_sum(ds, key="user_id", order_by=["ts", "event_id"],
                          value="value", keep=["user_id", "event_id"],
                          rows=len(df)).to_pandas() \
            .sort_values(["user_id", "event_id"]).reset_index(drop=True)
        exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
        exp["running_value"] = exp.groupby("user_id")["value"].cumsum() \
            .round(2)
        exp = exp[["user_id", "event_id", "running_value"]] \
            .sort_values(["user_id", "event_id"]).reset_index(drop=True)
        assert np.allclose(got["running_value"], exp["running_value"])

    def test_running_sum_matches_pandas(self, events):
        from vrl_ray.stages.window import running_sum

        ds, df = events
        got = running_sum(ds, key="user_id", order_by=["ts", "event_id"],
                          value="value", keep=["user_id", "event_id"],
                          num_partitions=8).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"])
        df["running_value"] = df.groupby("user_id")["value"].cumsum().round(2)
        want = df[["user_id", "event_id", "running_value"]]
        m = got.merge(want, on=["user_id", "event_id"],
                      suffixes=("_got", "_want"))
        assert len(m) == len(df)
        assert np.allclose(m["running_value_got"], m["running_value_want"])

    def test_top_k_matches_pandas(self, events):
        from vrl_ray.stages.window import top_k_per_key

        ds, df = events
        got = top_k_per_key(ds, key="user_id", order_col="value", k=3,
                            tiebreak="event_id",
                            num_partitions=8).to_pandas()
        df = df.sort_values(["user_id", "value", "event_id"],
                            ascending=[True, False, True])
        want = df.groupby("user_id").head(3)
        assert len(got) == len(want)
        assert (set(map(tuple, got[["user_id", "event_id"]].values)) ==
                set(map(tuple, want[["user_id", "event_id"]].values)))

    def test_session_counts_matches_pandas(self, events):
        from vrl_ray.stages.window import session_counts

        ds, df = events
        got = session_counts(ds, key="user_id", ts="ts", gap_seconds=1800,
                             num_partitions=8).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        df = df.sort_values(["user_id", "ts"])
        gaps = df.groupby("user_id")["ts"].diff().dt.total_seconds()
        df["_new"] = gaps.isna() | (gaps > 1800)
        want = df.groupby("user_id")["_new"].sum().astype("int64") \
            .reset_index().rename(columns={"_new": "n_sessions"})
        assert got["user_id"].tolist() == want["user_id"].tolist()
        assert got["n_sessions"].tolist() == want["n_sessions"].tolist()

    def test_string_keys_supported(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.window import top_k_per_key

        t = pa.table({"k": pa.array(["a", "b", "a", "b", "a"]),
                      "v": pa.array([1.0, 5.0, 3.0, 2.0, 2.0])})
        got = top_k_per_key(rd.from_arrow(t), key="k", order_col="v",
                            k=1, num_partitions=4).to_pandas()
        top = dict(zip(got["k"], got["v"]))
        assert top == {"a": 3.0, "b": 5.0}


class TestCardinalityAwareAggregate:
    def test_switches_to_distributed_combine(self, ray_session):
        """10⁵ distinct keys with a 10³ row budget → the driver must
        NOT pull the partials; combine goes distributed and the pull
        is bounded by the distinct-key result."""
        import ray.data as rd

        from vrl_ray.stages.aggregate import count_by_multi

        n = 100_000
        t = pa.table({
            "conv": pa.array([f"c{i}" for i in range(n)]),
            "tool": pa.array(["bash", "edit", None, "read"] * (n // 4)),
        })
        ds = rd.from_arrow(t)
        stats: dict = {}
        out = count_by_multi(ds, {"conv": ["conv"], "tool": ["tool"]},
                             stats_out=stats, max_driver_rows=1000)
        assert stats["phases"]["combine"] == "distributed"
        assert len(out["conv"]) == n
        assert out["conv"]["n"].sum() == n
        tool = dict(zip(out["tool"]["tool"], out["tool"]["n"]))
        assert tool["bash"] == n // 4
        # null key survives the distributed combine
        assert out["tool"]["n"].sum() == n

    def test_driver_combine_still_default(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.aggregate import count_by_multi

        t = pa.table({"k": pa.array(["a", "b", "a"])})
        stats: dict = {}
        out = count_by_multi(rd.from_arrow(t), {"k": ["k"]},
                             stats_out=stats)
        assert stats["phases"]["combine"] == "driver"
        assert dict(zip(out["k"]["k"], out["k"]["n"])) == {"a": 2, "b": 1}


class TestDedupAtTenX:
    """VERDICT r1 item 1 'Done' criterion: both dedup rewrites run at
    10× the sf0.01 doc count (5 000 docs) within memory bounds, with
    planted duplicates recovered."""

    def test_minhash_and_embedding_dedup_at_5k(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.dedup import (embedding_near_dups,
                                          minhash_candidate_pairs,
                                          verify_pairs_jaccard)

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(500)]
        texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(5000)]
        # plant near-dup text pairs far apart in id space
        planted = [(10, 4990), (123, 3456), (2000, 2001)]
        for a, b in planted:
            words = texts[a].split()
            words[5] = "EDITED"
            texts[b] = " ".join(words)
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(5000), pa.int64()),
            "text": pa.array(texts),
        })).materialize()

        pairs = minhash_candidate_pairs(docs, num_perm=64, bands=16)
        verified = {(r["id_a"], r["id_b"]) for r in
                    verify_pairs_jaccard(pairs, docs,
                                         threshold=0.5).take_all()}
        for a, b in planted:
            assert (a, b) in verified

        vecs = rng.normal(size=(5000, 16)).astype(np.float32)
        for a, b in planted:
            vecs[b] = vecs[a] + 0.01 * rng.normal(size=16) \
                .astype(np.float32)
        eds = _vec_ds(vecs)
        got = {(r["id_a"], r["id_b"]) for r in
               embedding_near_dups(eds, threshold=0.95).take_all()}
        for a, b in planted:
            assert (a, b) in got


class TestIvfStore:
    def test_partitioned_store_prunes_reads_and_recalls(self, ray_session,
                                                        tmp_path):
        """build_ivf_store + knn_ivf_indexed: only probed Hive
        partitions are opened, and recall matches the in-memory IVF
        path on clustered data."""
        import glob
        import os

        from vrl_ray.stages.similarity import (build_ivf_store,
                                               knn_brute_force,
                                               knn_ivf_indexed)

        vecs = _clustered_vecs()
        ds = _vec_ds(vecs)
        store = str(tmp_path / "ivf")
        index = build_ivf_store(ds, store, nlist=8)
        # Hive layout: one directory per bucket
        buckets = sorted(glob.glob(os.path.join(store, "bucket=*")))
        assert len(buckets) >= 4

        q = vecs[:5].astype(np.float64)
        exact = knn_brute_force(ds, q, k=10).to_pandas()
        approx = knn_ivf_indexed(store, q, k=10, nprobe=4).to_pandas()
        recalls = []
        for qi in range(5):
            want = set(exact[exact["query_idx"] == qi]["vec_id"])
            got = set(approx[approx["query_idx"] == qi]["vec_id"])
            recalls.append(len(want & got) / len(want))
        assert sum(recalls) / len(recalls) >= 0.9, recalls

        # pruning evidence at the storage layer: nprobe=1 touches a
        # strict subset of partitions ⇒ fewer result candidates than
        # the full scan would see, and it still returns k rows/query
        tight = knn_ivf_indexed(store, q, k=10, nprobe=1).to_pandas()
        assert len(tight) == 50


class TestAsofJoin:
    def test_matches_pandas_merge_asof(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.window import asof_join

        rng = np.random.default_rng(4)
        nl, nr = 3000, 400
        lt = pa.table({
            "k": pa.array(rng.integers(0, 50, nl), pa.int64()),
            "ts": pa.array(rng.integers(0, 100000, nl), pa.int64()),
            "lid": pa.array(range(nl), pa.int64()),
        })
        rt = pa.table({
            "k": pa.array(rng.integers(0, 50, nr), pa.int64()),
            "ts": pa.array(rng.integers(0, 100000, nr), pa.int64()),
            "rv": pa.array(rng.uniform(size=nr)),
        })
        got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                        key="k", ts="ts", value_cols=["rv"],
                        num_partitions=8).to_pandas() \
            .sort_values("lid").reset_index(drop=True)

        ldf = lt.to_pandas().sort_values("ts", kind="mergesort")
        rdf = rt.to_pandas().sort_values("ts", kind="mergesort")
        want = pd.merge_asof(ldf, rdf, on="ts", by="k",
                             direction="backward") \
            .sort_values("lid").reset_index(drop=True)
        assert len(got) == nl
        import numpy as _np
        a = got["rv_right"].to_numpy()
        b = want["rv"].to_numpy()
        both_nan = _np.isnan(a) & _np.isnan(b)
        assert bool(_np.all(both_nan | _np.isclose(a, b, equal_nan=True)))


class TestRangeJoin:
    def test_matches_bruteforce_intervals(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.window import range_join

        rng = np.random.default_rng(6)
        nl, nr = 4000, 300
        lt = pa.table({
            "k": pa.array(rng.integers(0, 30, nl), pa.int64()),
            "t": pa.array(rng.integers(0, 100000, nl), pa.int64()),
            "lid": pa.array(range(nl), pa.int64()),
        })
        lo = rng.integers(0, 90000, nr)
        # overlapping, variable-width intervals incl. wide ones
        hi = lo + rng.integers(1, 30000, nr)
        rt = pa.table({
            "k": pa.array(rng.integers(0, 30, nr), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "rid": pa.array(range(nr), pa.int64()),
        })
        got = {(r["lid"], r["rid"]) for r in range_join(
            rd.from_arrow(lt), rd.from_arrow(rt), key="k", point="t",
            lo="lo", hi="hi", bucket_width=5000,
            right_cols=["rid"], num_partitions=8).take_all()}

        ld, rd_ = lt.to_pandas(), rt.to_pandas()
        want = set()
        for _, rrow in rd_.iterrows():
            m = ld[(ld["k"] == rrow["k"]) & (ld["t"] >= rrow["lo"]) &
                   (ld["t"] <= rrow["hi"])]
            want.update((int(x), int(rrow["rid"])) for x in m["lid"])
        assert got == want and len(want) > 100

    def test_auto_bucket_width_same_pairs(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.window import range_join

        rng = np.random.default_rng(7)
        nl, nr = 2000, 150
        lt = pa.table({
            "k": pa.array(rng.integers(0, 20, nl), pa.int64()),
            "t": pa.array(rng.integers(0, 50000, nl), pa.int64()),
            "lid": pa.array(range(nl), pa.int64()),
        })
        lo = rng.integers(0, 45000, nr)
        hi = lo + rng.integers(1, 8000, nr)
        rt = pa.table({
            "k": pa.array(rng.integers(0, 20, nr), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "rid": pa.array(range(nr), pa.int64()),
        })
        # bucket_width=None derives the width from interval stats
        got = {(r["lid"], r["rid"]) for r in range_join(
            rd.from_arrow(lt), rd.from_arrow(rt), key="k", point="t",
            lo="lo", hi="hi", right_cols=["rid"],
            num_partitions=4).take_all()}
        ld, rd_ = lt.to_pandas(), rt.to_pandas()
        want = set()
        for _, rrow in rd_.iterrows():
            m = ld[(ld["k"] == rrow["k"]) & (ld["t"] >= rrow["lo"]) &
                   (ld["t"] <= rrow["hi"])]
            want.update((int(x), int(rrow["rid"])) for x in m["lid"])
        assert got == want and len(want) > 50


class TestAsofJoinSkew:
    """hot_key_threshold sub-partitions skewed keys by time range;
    output must be identical to the unsplit path (pandas merge_asof
    is the ground truth)."""

    def _expected(self, lt, rt):
        ldf = lt.to_pandas().sort_values("ts", kind="mergesort")
        rdf = rt.to_pandas().sort_values("ts", kind="mergesort")
        return pd.merge_asof(ldf, rdf, on="ts", by="k",
                             direction="backward") \
            .sort_values("lid").reset_index(drop=True)

    def _check(self, got, want):
        got = got.sort_values("lid").reset_index(drop=True)
        assert len(got) == len(want)
        a = got["rv_right"].to_numpy()
        b = want["rv"].to_numpy()
        both_nan = np.isnan(a) & np.isnan(b)
        assert bool(np.all(both_nan | np.isclose(a, b, equal_nan=True)))

    def test_hot_key_matches_merge_asof(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.window import asof_join

        rng = np.random.default_rng(11)
        # key 0 is pathologically hot: 80% of all rows
        n_hot, n_cold = 8000, 2000
        lk = np.concatenate([np.zeros(n_hot, np.int64),
                             rng.integers(1, 40, n_cold)])
        lt = pa.table({
            "k": pa.array(lk, pa.int64()),
            "ts": pa.array(rng.integers(0, 1_000_000, n_hot + n_cold),
                           pa.int64()),
            "lid": pa.array(range(n_hot + n_cold), pa.int64()),
        })
        rk = np.concatenate([np.zeros(400, np.int64),
                             rng.integers(1, 40, 200)])
        rt = pa.table({
            "k": pa.array(rk, pa.int64()),
            "ts": pa.array(rng.integers(0, 1_000_000, 600), pa.int64()),
            "rv": pa.array(rng.uniform(size=600)),
        })
        got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                        key="k", ts="ts", value_cols=["rv"],
                        num_partitions=8, hot_key_threshold=1000,
                        hot_time_splits=8).to_pandas()
        self._check(got, self._expected(lt, rt))

    def test_carry_in_across_empty_splits(self, ray_session):
        """Rights exist ONLY in the earliest time range; every later
        split must still see them via carry-in (the case a naive
        time-split silently breaks)."""
        import ray.data as rd

        from vrl_ray.stages.window import asof_join

        rng = np.random.default_rng(12)
        n = 5000
        lt = pa.table({
            "k": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(rng.integers(0, 1_000_000, n), pa.int64()),
            "lid": pa.array(range(n), pa.int64()),
        })
        # all rights in [0, 10_000) — splits 1..7 have no local right
        rt = pa.table({
            "k": pa.array(np.zeros(30, np.int64)),
            "ts": pa.array(rng.integers(0, 10_000, 30), pa.int64()),
            "rv": pa.array(rng.uniform(size=30)),
        })
        got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                        key="k", ts="ts", value_cols=["rv"],
                        num_partitions=4, hot_key_threshold=500,
                        hot_time_splits=8).to_pandas()
        self._check(got, self._expected(lt, rt))
        # rows past the right range must be filled (carry-in), not null
        late = got[got["ts"] >= 10_000]
        assert late["rv_right"].notna().all()

    def test_no_hot_keys_falls_back(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.window import asof_join

        rng = np.random.default_rng(13)
        lt = pa.table({
            "k": pa.array(rng.integers(0, 50, 1000), pa.int64()),
            "ts": pa.array(rng.integers(0, 100000, 1000), pa.int64()),
            "lid": pa.array(range(1000), pa.int64()),
        })
        rt = pa.table({
            "k": pa.array(rng.integers(0, 50, 200), pa.int64()),
            "ts": pa.array(rng.integers(0, 100000, 200), pa.int64()),
            "rv": pa.array(rng.uniform(size=200)),
        })
        got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                        key="k", ts="ts", value_cols=["rv"],
                        num_partitions=8,
                        hot_key_threshold=10_000).to_pandas()
        self._check(got, self._expected(lt, rt))


class TestSampling:
    def test_hash_sample_deterministic_and_fractional(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.sample import hash_sample

        t = pa.table({"id": pa.array(range(4000), pa.int64())})
        a = sorted(r["id"] for r in hash_sample(
            rd.from_arrow(t), id_column="id", fraction=0.3).take_all())
        b = sorted(r["id"] for r in hash_sample(
            rd.from_arrow(t), id_column="id", fraction=0.3).take_all())
        assert a == b                      # reproducible
        assert 0.25 < len(a) / 4000 < 0.35  # near the target fraction
        # monotone: a smaller fraction is a SUBSET (same hash order)
        c = set(r["id"] for r in hash_sample(
            rd.from_arrow(t), id_column="id", fraction=0.1).take_all())
        assert c <= set(a)

    def test_sample_k_per_key_exact_k(self, ray_session):
        import ray.data as rd

        from vrl_ray.stages.sample import sample_k_per_key

        t = pa.table({
            "k": pa.array([i % 7 for i in range(700)], pa.int64()),
            "id": pa.array(range(700), pa.int64()),
        })
        out = sample_k_per_key(rd.from_arrow(t), key="k", id_column="id",
                               k=3, num_partitions=8).to_pandas()
        counts = out.groupby("k").size()
        assert (counts == 3).all() and len(counts) == 7


class TestGroupedQuantile:
    """grouped_quantile: exact per-key quantile via sort + run-length
    rank math — replaces the banned groupby().map_groups full-group
    pull (VERDICT r3 item 1)."""

    def _check(self, df, q, ray_session, num_blocks=None, round_to=6):
        import ray

        from vrl_ray.stages.aggregate import grouped_quantile

        ds = ray.data.from_pandas(df)
        if num_blocks:
            ds = ds.repartition(num_blocks)
        got = grouped_quantile(ds, key="k", value="v", q=q,
                               out="qv", round_to=round_to)
        exp = (df.dropna(subset=["v"]).groupby("k", dropna=False)["v"]
               .quantile(q, interpolation="linear")
               .round(round_to).reset_index(name="qv"))
        got = got.sort_values("k").reset_index(drop=True)
        exp = exp.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_matches_pandas_multiblock(self, ray_session):
        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "k": rng.choice(list("abcde"), 5000),
            "v": rng.normal(size=5000).round(3),
        })
        self._check(df, 0.95, ray_session, num_blocks=17)

    def test_skewed_hot_key_splits_across_blocks(self, ray_session):
        # one key holds 95% of rows — the map_groups anti-pattern case
        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "k": ["hot"] * 9500 + list(rng.choice(list("xyz"), 500)),
            "v": rng.uniform(0, 100, 10000),
        })
        self._check(df, 0.5, ray_session, num_blocks=23)

    def test_edge_groups_and_nulls(self, ray_session):
        df = pd.DataFrame({
            "k": ["a", "b", "b", "c", "c", "c", "d"],
            "v": [1.0, 2.0, None, 5.0, 5.0, 5.0, -3.5],
        })
        # singleton group, all-equal group, null value ignored
        self._check(df, 0.95, ray_session)
        self._check(df, 0.0, ray_session)
        self._check(df, 1.0, ray_session)

    def test_integer_values_exact_interpolation(self, ray_session):
        df = pd.DataFrame({"k": ["g"] * 10 + ["h"] * 3,
                           "v": list(range(10)) + [7, 1, 9]})
        self._check(df, 0.95, ray_session, round_to=10)


def test_grouped_quantile_emits_all_null_groups(ray_session):
    """r4 review fix: a key whose values are ALL null still comes out
    (SQL quantile_cont emits the group with a NULL result)."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from vrl_ray.stages.aggregate import grouped_quantile

    t = pa.table({"k": pa.array(["a", "a", "b", "b", "c"]),
                  "v": pa.array([1.0, 3.0, None, None, 2.0])})
    out = grouped_quantile(rd.from_arrow(t), key="k", value="v", q=0.5)
    got = dict(zip(out["k"], out["q_value"]))
    assert got["a"] == 2.0 and got["c"] == 2.0
    assert "b" in got and math.isnan(got["b"])
