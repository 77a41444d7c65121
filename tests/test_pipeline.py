"""Pipeline golden tests: the streaming Ray pipeline must equal the
single-process row oracle (FIXTURES.md F5 equality gates from
BASELINE.json):

1. per-sink routed-row equality (order-insensitive row hashes),
2. per-sink aggregate counts keyed (sink, tool) and (sink, conv_id),
3. per-turn text equality under stable (conv_id, turn_idx) order.
"""

import os

import pyarrow as pa
import pytest

from vrl_ray.sources.transcripts import transcript_table
from vrl_ray.stages.parse import parse_batch
from vrl_ray.stages.enrich import Enrich
from vrl_ray.stages.route import route_batch, SINK_NAMES
from vrl_ray.pipelines.oracle import oracle_transform, oracle_aggregate

N_CONVS = 60
SEED = 7


@pytest.fixture(scope="module")
def small_table():
    return transcript_table(N_CONVS, seed=SEED)


@pytest.fixture(scope="module")
def oracle_rows(small_table):
    return [oracle_transform(r) for r in small_table.to_pylist()]


def _row_key(r):
    return (r["conv_id"], r["turn_idx"])


class TestBatchKernelsVsOracle:
    """Kernel-level parity (no Ray session needed)."""

    def test_full_transform_parity(self, small_table, oracle_rows):
        out = route_batch(Enrich()(parse_batch(small_table))).to_pylist()
        assert len(out) == len(oracle_rows)
        cols = [
            "level", "message", "event_ts", "status", "duration", "path",
            "method", "parse_fmt", "parse_err", "tool_category", "tool_risk",
            "role_class", "is_human", "enrich_err", "sink_id", "sink",
        ]
        for got, want in zip(out, oracle_rows):
            for c in cols:
                g, w = got[c], want[c]
                if isinstance(g, float) and isinstance(w, float):
                    assert abs(g - w) < 1e-12, (c, got, want)
                else:
                    assert g == w, (c, got["text"], g, w)


class TestRayPipelineVsOracle:
    """End-to-end through Ray Data (streaming execution)."""

    @pytest.fixture(scope="class")
    def result(self, ray_session, small_table, tmp_path_factory):
        import ray.data as rd
        from vrl_ray.pipelines.transcript import run_flagship

        out_dir = str(tmp_path_factory.mktemp("flagship"))
        ds = rd.from_arrow(small_table).repartition(8)
        res = run_flagship(ds, out_dir)
        return res, out_dir

    def test_aggregate_counts_equal(self, result, oracle_rows):
        res, _ = result
        by_tool, by_conv = oracle_aggregate(oracle_rows)
        got_tool = {
            (r["sink"], r["tool"]): r["n"]
            for r in res["agg_tool"].to_dict("records")
        }
        assert got_tool == dict(by_tool)
        got_conv = {
            (r["sink"], r["conv_id"]): r["n"]
            for r in res["agg_conv"].to_dict("records")
        }
        assert got_conv == dict(by_conv)

    def test_routed_row_equality(self, result, oracle_rows):
        """Per-sink routed row SETS equal the oracle's."""
        import ray.data as rd
        _, out_dir = result
        got = rd.read_parquet(os.path.join(out_dir, "sinks")).to_pandas()
        # partition column comes back as the directory key
        assert "sink" in got.columns
        want_sets = {}
        for r in oracle_rows:
            want_sets.setdefault(r["sink"], set()).add(_row_key(r))
        got_sets = {}
        for sink, cid, tidx in zip(got["sink"], got["conv_id"], got["turn_idx"]):
            got_sets.setdefault(str(sink), set()).add((cid, tidx))
        assert got_sets == want_sets

    def test_per_turn_text_equality_stable_order(self, result, small_table):
        """Per-turn text equality under stable (conv_id, turn_idx)
        ordering — verification-boundary sort only."""
        import ray.data as rd
        _, out_dir = result
        got = (
            rd.read_parquet(os.path.join(out_dir, "sinks"),
                            columns=["conv_id", "turn_idx", "text"])
            .sort(["conv_id", "turn_idx"])
            .to_pandas()
        )
        want = (
            small_table.select(["conv_id", "turn_idx", "text"])
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert list(got["text"]) == list(want["text"])

    def test_all_rows_routed_exactly_once(self, result, small_table):
        res, _ = result
        assert int(res["agg_tool"]["n"].sum()) == small_table.num_rows


class TestResume:
    def test_checkpoint_skips_done_shards(self, ray_session, tmp_path):
        import ray.data as rd
        from vrl_ray.pipelines.transcript import run_resumable

        in_dir = tmp_path / "input"
        ds = rd.from_arrow(transcript_table(20, seed=3)).repartition(4)
        ds.write_parquet(str(in_dir))

        out_dir = str(tmp_path / "out")
        r1 = run_resumable(str(in_dir), out_dir, num_shards=4)
        assert len(r1["shards_done"]) >= 1 and not r1["shards_skipped"]

        r2 = run_resumable(str(in_dir), out_dir, num_shards=4)
        assert r2["shards_done"] == []
        assert sorted(r2["shards_skipped"]) == sorted(r1["shards_done"])
        # aggregates identical across resume
        a1 = r1["agg_tool"].sort_values(["sink", "tool"]).reset_index(drop=True)
        a2 = r2["agg_tool"].sort_values(["sink", "tool"]).reset_index(drop=True)
        assert a1.equals(a2)


class TestErrorLane:
    """Malformed input must never raise from a stage — it routes to
    the error sink (VRL error-as-value semantics, runtime.rs:120-126)."""

    def test_nulls_and_garbage_route_to_errors(self):
        from datetime import datetime, timezone

        import pyarrow as pa

        from vrl_ray.stages.parse import parse_batch
        from vrl_ray.stages.enrich import Enrich
        from vrl_ray.stages.route import route_batch

        b = pa.table({
            "conv_id": pa.array(["c1", "c2", "c3"]),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": pa.array(["user", None, "tool"]),
            "text": pa.array([None, "", "\x00garbage \xff"]),
            "tool": pa.array([None, "zzz_unknown", "bash"]),
            "ts": pa.array([datetime.now(timezone.utc)] * 3,
                           pa.timestamp("us", tz="UTC")),
        })
        out = route_batch(Enrich()(parse_batch(b)))
        assert out["sink"].to_pylist() == ["errors"] * 3
        assert out["enrich_err"].to_pylist()[1] is not None


class TestFusedStage:
    """The one-operator FlagshipStage must produce byte-identical
    aggregates to the staged parse→enrich→route composition."""

    def test_fused_equals_staged(self, ray_session, tmp_path):
        from vrl_ray.pipelines.transcript import run_flagship, transform
        from vrl_ray.sources.transcripts import transcript_dataset
        from vrl_ray.stages.aggregate import count_by

        res = run_flagship(transcript_dataset(120, seed=9),
                           str(tmp_path / "out"))
        staged = count_by(transform(transcript_dataset(120, seed=9)),
                          ["sink", "tool"]).to_pandas()
        a = res["agg_tool"].sort_values(["sink", "tool"]).reset_index(drop=True)
        b = staged.sort_values(["sink", "tool"]).reset_index(drop=True)[a.columns]
        assert a.astype(str).equals(b.astype(str))
        # side-effect write must run EXACTLY once (a lazy plan that
        # re-executes would duplicate every sink row)
        import os
        import ray.data as rd
        n_files = rd.read_parquet(os.path.join(str(tmp_path / "out"), "sinks")).count()
        assert n_files == int(res["agg_tool"]["n"].sum())


class TestAggParquetOut:
    """agg_out='parquet' (scale-out aggregates, VERDICT r2 item 7):
    the distributed-combine parquet output must equal the pandas
    output — compared via a DISTRIBUTED full-outer join, not by
    pulling frames (the conv aggregate is O(distinct conv_id))."""

    def test_parquet_agg_equals_pandas_via_join(self, ray_session, tmp_path):
        import ray.data as rd
        from vrl_ray.pipelines.transcript import run_flagship
        from vrl_ray.sources.transcripts import transcript_dataset

        r_pd = run_flagship(transcript_dataset(80, seed=11),
                            str(tmp_path / "a"))
        r_pq = run_flagship(transcript_dataset(80, seed=11),
                            str(tmp_path / "b"), agg_out="parquet")

        assert r_pq["metrics"]["rows"] == r_pd["metrics"]["rows"]

        for name, keys in (("agg_conv", ["sink", "conv_id"]),
                           ("agg_tool", ["sink", "tool"])):
            ref = rd.from_pandas(
                r_pd[name].rename(columns={"n": "n_ref"}))
            joined = r_pq[name].join(
                ref, join_type="full_outer", num_partitions=2,
                on=tuple(keys))
            bad = joined.filter(
                lambda r: r["n"] != r["n_ref"]).count()
            assert bad == 0, f"{name}: {bad} mismatched keys"
            assert joined.count() == len(r_pd[name])


class TestEnrichmentTableFile:
    """VRL enrichment-table parity: tables loaded from a file once per
    actor (enrich.py load_enrichment_table)."""

    def test_csv_table_drives_lookup(self, tmp_path):
        import pyarrow as pa

        from vrl_ray.stages.enrich import Enrich

        p = tmp_path / "tools.csv"
        p.write_text("tool,category,risk\nhammer,manual,5\nbash,shell,4\n")
        e = Enrich(tool_table_path=str(p))
        b = pa.table({
            "tool": pa.array(["hammer", "bash", "unknown_x"]),
            "role": pa.array(["tool", "tool", "user"]),
        })
        out = e(b)
        assert out["tool_category"].to_pylist() == ["manual", "shell",
                                                    "unknown"]
        assert out["tool_risk"].to_pylist() == [5, 4, 2]
        assert out["enrich_err"].to_pylist()[2] is not None


class TestSkewFlattening:
    """The two-phase aggregate's map-side combiner flattens hot-key
    skew BEFORE the exchange (SURVEY §4 stragglers row): a 90%-hot
    conv_id contributes one partial row per block, not per row."""

    def test_partial_rows_bounded_by_distinct_keys(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from vrl_ray.stages.aggregate import _partial_counts

        # 10k rows, 90% on one hot key
        keys = ["hot"] * 9000 + [f"cold{i}" for i in range(1000)]
        t = pa.table({"conv_id": pa.array(keys)})
        partial = _partial_counts(["conv_id"])
        ds = rd.from_arrow(t).repartition(8) \
            .map_batches(partial, batch_format="pyarrow")
        rows = ds.take_all()
        # exchange volume: ≤ distinct×blocks partial rows, not 10k
        assert len(rows) <= 1001 + 8
        total = sum(r["n"] for r in rows)
        assert total == 10000
        hot = sum(r["n"] for r in rows if r["conv_id"] == "hot")
        assert hot == 9000


class TestPipelineBuilder:
    """Declarative remap-and-route pipelines (pipelines/builder.py):
    user-supplied VRL program + datadog-query routes + aggregates."""

    def test_end_to_end(self, ray_session, tmp_path):
        import ray.data as rd

        from vrl_ray.pipelines.builder import PipelineSpec, run_pipeline

        ds = rd.from_items([
            {"event_type": "Click", "value": 5.0},
            {"event_type": "Error", "value": 1.0},
            {"event_type": "View", "value": 150.0},
            {"event_type": "Error", "value": 200.0},
        ])
        spec = PipelineSpec(
            program='.kind = downcase(.event_type)',
            routes=[("errors", "@kind:error"), ("big", "@value:>=100")],
            aggregates={"by_sink": ["sink"], "by_kind": ["sink", "kind"]},
        )
        res = run_pipeline(ds, spec, str(tmp_path / "out"))
        by_sink = {r["sink"]: r["n"] for r in
                   res["aggregates"]["by_sink"].to_dict("records")}
        # first-match priority: the 200.0 Error routes to errors, not big
        assert by_sink == {"errors": 2, "big": 1, "default": 1}
        # sinks written and readable, partitioned by sink
        import os

        got = rd.read_parquet(res["sink_dir"]).to_pandas()
        assert len(got) == 4 and "sink" in got.columns

    def test_interpreter_fallback_program(self, ray_session):
        import ray.data as rd

        from vrl_ray.pipelines.builder import PipelineSpec, run_pipeline

        # parse_key_value is outside the vectorizable subset → the
        # stage falls back to the per-row interpreter transparently
        ds = rd.from_items([{"text": "a=1 b=2"}, {"text": "a=3"}])
        spec = PipelineSpec(
            program='.kv = parse_key_value!(.text)\n.a = to_int!(.kv.a)',
            routes=[("high", "@a:>=2")],
            aggregates={"by_sink": ["sink"]},
        )
        res = run_pipeline(ds, spec)
        by_sink = {r["sink"]: r["n"] for r in
                   res["aggregates"]["by_sink"].to_dict("records")}
        assert by_sink == {"high": 1, "default": 1}


class TestOperatorBudget:
    """Plan-shape guard: the flagship must stay ONE fused map operator
    (+ read) — an accidental extra operator boundary re-ships
    full-width batches through the object store (BASELINE.md rule 2)."""

    def test_flagship_operator_count(self, ray_session, tmp_path):
        import ray.data as rd

        from vrl_ray.pipelines.transcript import run_flagship
        from vrl_ray.sources.transcripts import transcript_table

        ds = rd.from_arrow(transcript_table(60, seed=4)).repartition(4)
        res = run_flagship(ds, str(tmp_path / "o"))
        import re

        stats = res["metrics"]["stage_stats"]
        maps = re.findall(r"Operator \d+ (MapBatches[^:]*):", stats)
        # exactly the fused stage + the 3-column partial-counts stage
        assert len(maps) <= 2, f"map operators grew: {maps}"


class TestBuilderResumable:
    def test_resume_skips_done_shards(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from vrl_ray.pipelines.builder import (PipelineSpec,
                                               run_pipeline_resumable)

        ind = tmp_path / "in"
        ind.mkdir()
        for i in range(4):
            pq.write_table(pa.table({
                "event_type": pa.array(["Error", "View"] * 25),
                "value": pa.array([float(j) for j in range(50)]),
            }), str(ind / f"part-{i}.parquet"))

        spec = PipelineSpec(
            program='.kind = downcase(.event_type)',
            routes=[("errors", "@kind:error")],
            aggregates={"by_sink": ["sink"]},
        )
        out = str(tmp_path / "out")
        r1 = run_pipeline_resumable(str(ind), spec, out, num_shards=4)
        assert len(r1["shards_done"]) == 4 and not r1["shards_skipped"]
        by_sink = {r["sink"]: r["n"] for r in
                   r1["aggregates"]["by_sink"].to_dict("records")}
        assert by_sink == {"errors": 100, "default": 100}

        # rerun: all shards skipped, aggregates identical
        r2 = run_pipeline_resumable(str(ind), spec, out, num_shards=4)
        assert r2["shards_done"] == [] and len(r2["shards_skipped"]) == 4
        by_sink2 = {r["sink"]: r["n"] for r in
                    r2["aggregates"]["by_sink"].to_dict("records")}
        assert by_sink2 == by_sink


class TestCrashedShardNoDoubleCount:
    def test_stale_partials_cleared_before_reprocess(self, ray_session,
                                                     tmp_path):
        """ADVICE r1: a shard that died mid-write leaves part files
        with no completion marker; the rerun must clear them, not
        append next to them (which double-counts in the final read)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from vrl_ray.pipelines.builder import (PipelineSpec,
                                               run_pipeline_resumable)

        ind = tmp_path / "in"
        ind.mkdir()
        for i in range(2):
            pq.write_table(pa.table({
                "event_type": pa.array(["Error", "View"] * 25),
                "value": pa.array([float(j) for j in range(50)]),
            }), str(ind / f"part-{i}.parquet"))

        spec = PipelineSpec(program='.kind = downcase(.event_type)',
                            routes=[("errors", "@kind:error")],
                            aggregates={"by_sink": ["sink"]})
        out = str(tmp_path / "out")

        # simulate the crash: stale part files under an UNMARKED shard
        stale = tmp_path / "out" / "sinks" / "shard=00000" / "sink=errors"
        stale.mkdir(parents=True)
        pq.write_table(pa.table({
            "kind": pa.array(["error"] * 37)}),
            str(stale / "part-stalecrash.parquet"))

        r = run_pipeline_resumable(str(ind), spec, out, num_shards=2)
        assert len(r["shards_done"]) == 2
        by_sink = {x["sink"]: x["n"] for x in
                   r["aggregates"]["by_sink"].to_dict("records")}
        # exact counts — the 37 stale rows must NOT appear
        assert by_sink == {"errors": 50, "default": 50}
        assert not any("stalecrash" in f for _, _, fs in
                       os.walk(out) for f in fs)


class TestBuilderDedupAndWindows:
    def test_declarative_dedup_and_windows(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from vrl_ray.pipelines.builder import PipelineSpec, run_pipeline

        n = 300
        rng = np.random.default_rng(8)
        ts = (np.datetime64("2024-01-01", "us")
              + rng.integers(0, 7200_000_000, n).astype("timedelta64[us]"))
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
            "ts": pa.array(ts),
            "event_type": pa.array(
                rng.choice(["Error", "View"], n).tolist()),
            "value": pa.array(rng.uniform(0, 10, n)),
            # 100 duplicate payloads (every third row repeats content)
            "text": pa.array([f"msg-{i % 200}" for i in range(n)]),
        })
        spec = PipelineSpec(
            program=".kind = downcase(.event_type)",
            routes=[("errors", "@kind:error")],
            aggregates={"by_sink": ["sink"]},
            dedup={"column": "text", "id_column": "event_id"},
            windows={"sessions": {"type": "session", "key": "user_id",
                                  "ts": "ts", "gap_seconds": 900}},
        )
        res = run_pipeline(rd.from_arrow(t), spec)
        by_sink = dict(zip(res["aggregates"]["by_sink"]["sink"],
                           res["aggregates"]["by_sink"]["n"]))
        assert sum(by_sink.values()) == 200          # dedup kept min-ids
        sess = res["windows"]["sessions"].to_pandas()   # Dataset out
        assert set(sess.columns) == {"user_id", "n_sessions"}
        assert sess["n_sessions"].sum() >= len(sess)  # ≥1 session each
