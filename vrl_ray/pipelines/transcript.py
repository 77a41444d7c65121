"""Flagship pipeline: parse → enrich → route → aggregate over
transcript Parquet (BASELINE.json north_rule).

Ray-Data-first shape:

    read_parquet (column-pruned)
      → map_batches(parse_batch, pyarrow)        stateless tasks
      → map_batches(Enrich, concurrency=N)       actor pool
      → map_batches(route_batch, pyarrow)        stateless tasks
      → write_parquet(partition_cols=["sink"])   single-pass fan-out
      → count_by(read_back(sink,conv_id,tool))   two-phase aggregate

Everything streams with backpressure; nothing materializes the full
dataset. The aggregate re-reads ONLY 3 columns of the routed output
(cheaper than re-running parse for a second consumption and keeps the
write + aggregate consistent for the equality gate).

Checkpoint/resume (`run_resumable`): input files are grouped into
shards; each shard runs the same streaming pipeline into
``out/shard=<i>/`` with an atomic per-shard manifest + lineage record;
a rerun skips completed shards (SURVEY §4 checkpoint row).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import pyarrow as pa

from ..stages.parse import parse_batch
from ..stages.enrich import Enrich
from ..stages.route import route_batch, SINK_NAMES
from ..stages.aggregate import count_by, multi_partial_fn

#: columns the pipeline needs from the source (prune at the read)
INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

AGG_KEYS = ["sink", "tool"]
CONV_AGG_KEYS = ["sink", "conv_id"]


def transform(ds, *, enrich_concurrency: Optional[int] = None, batch_size: int = 65536):
    """parse → enrich → route (lazy; caller consumes)."""
    from ..stages.enrich import enrich_batch

    ds = ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=batch_size)
    if enrich_concurrency is not None:
        # caller pinned a pool → actor-pool form
        ds = ds.map_batches(
            Enrich,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=enrich_concurrency,
        )
    else:
        # tasks + per-worker dict cache: fuses with parse/route into
        # one task chain, no pool to size or spin up
        ds = ds.map_batches(enrich_batch, batch_format="pyarrow",
                            batch_size=batch_size)
    ds = ds.map_batches(route_batch, batch_format="pyarrow", batch_size=batch_size)
    return ds


def make_sink_writer(sink_dir: str, keep_columns: list[str]):
    """Pass-through sink stage: writes each batch's rows into
    ``sink=<name>/part-*.parquet`` (Hive layout, one file per distinct
    sink per batch) and forwards ONLY the aggregation columns.

    This lets write + aggregate share a single streaming pass — no
    separate write job and no re-read of the sink output. File names
    embed a uuid (content-independent): resumability is handled one
    level up at shard granularity (run_resumable's manifest)."""

    def write_batch(batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.parquet as pq

        sinks = batch["sink"]
        enc = (sinks.combine_chunks() if isinstance(sinks, pa.ChunkedArray)
               else sinks).dictionary_encode()
        import pyarrow.compute as pc
        part = uuid.uuid4().hex[:12]
        for i, name in enumerate(enc.dictionary.to_pylist()):
            sub = batch.filter(pc.equal(enc.indices, i))
            d = os.path.join(sink_dir, f"sink={name}")
            os.makedirs(d, exist_ok=True)
            # stats off (~30% of the write: min/max over every string
            # byte, and nothing downstream filters on them); parquet
            # dictionary pages only for the bounded-cardinality
            # columns — attempting (then abandoning) dictionaries on
            # text/message is wasted passes over the big bytes
            pq.write_table(sub.drop_columns(["sink"]),
                           os.path.join(d, f"part-{part}.parquet"),
                           write_statistics=False,
                           use_dictionary=[c for c in _DICT_COLS
                                           if c in sub.column_names])
        return batch.select(keep_columns)

    return write_batch


#: bounded-cardinality sink columns that benefit from parquet
#: dictionary encoding (the rest — text, message, conv_id — are
#: near-unique and dictionary attempts get abandoned mid-page)
_DICT_COLS = ["role", "tool", "level", "parse_fmt", "parse_err",
              "method", "tool_category", "role_class", "enrich_err"]


class FlagshipStage:
    """The whole per-row program as ONE actor-pool stage:
    parse → enrich → route → (optional) write-through sinks.

    Fusing into a single operator keeps full-width batches inside the
    actor — the staged form ships the wide intermediate (text + parsed
    columns, ~10× the aggregate columns) through the object store at
    every operator boundary, which costs more than the compute itself.
    State (grok regexes, enrichment dicts) is built once per actor in
    ``__init__`` (the reference's compile-time `Arc` state,
    parse_grok.rs:148-169)."""

    def __init__(self, sink_dir: Optional[str] = None,
                 keep_columns: Optional[list[str]] = None,
                 agg_partials: Optional[dict] = None):
        from ..stages.enrich import Enrich as _Enrich

        # one Arrow thread per actor: the pool is sized 1:1 with CPUs,
        # so per-actor kernel thread pools (default = all cores) would
        # oversubscribe the node ~30×
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        self.enrich = _Enrich()
        self.writer = (make_sink_writer(sink_dir, keep_columns or
                                        ["sink", "conv_id", "tool"])
                       if sink_dir else None)
        # fused map-side combiner: emit the (which, k0.., n) partial
        # counts INSTEAD of per-row columns — the operator boundary
        # then carries O(distinct keys) rows per batch, not O(rows)
        self.partial = (multi_partial_fn(agg_partials)[0]
                        if agg_partials else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.parse import parse_batch as _parse
        from ..stages.route import route_batch as _route

        routed = _route(self.enrich(_parse(batch)))
        if self.writer is not None:
            routed = self.writer(routed)
        if self.partial is not None:
            return self.partial(routed)
        return routed


_FLAGSHIP_CACHE: dict = {}


def _flagship_batch(batch: pa.Table, *, sink_dir, keep_columns,
                    agg_partials_key, agg_partials) -> pa.Table:
    """Task-pool form of :class:`FlagshipStage`: the per-actor state
    (enrich dicts, sink writer, partial combiner, Arrow thread pin)
    builds once per WORKER PROCESS and is keyed by the run's config —
    plain tasks then reuse the session's warm workers across
    executions instead of re-spinning a dedicated pool (~1-2 s), and
    share cores with the read/aggregate tasks instead of idling."""
    key = (sink_dir, tuple(keep_columns or ()), agg_partials_key)
    st = _FLAGSHIP_CACHE.get(key)
    if st is None:
        st = _FLAGSHIP_CACHE[key] = FlagshipStage(
            sink_dir=sink_dir, keep_columns=keep_columns,
            agg_partials=agg_partials)
    return st(batch)


def run_flagship(
    input_path,
    out_dir: Optional[str] = None,
    *,
    write_sinks: bool = True,
    enrich_concurrency: Optional[int] = None,
    batch_size: int = 65536,
    agg_out: str = "pandas",
):
    """Run the full pipeline in ONE streaming pass and ONE fused
    operator: read → [parse → enrich → route → write sinks] →
    two-phase aggregate (both key sets). Returns the two aggregate
    frames + metrics. ``input_path`` may be a path (str) or a
    Dataset.

    ``agg_out="pandas"`` (default) returns the aggregates as pandas
    frames — right for bounded keys tested here. ``agg_out="parquet"``
    (scale-out, VERDICT r2 item 7) writes them to
    ``out_dir/agg/{tool,conv}/`` via a distributed combine and returns
    lazy Datasets instead: at 10^12 turns the conv-keyed frame is
    O(distinct conv_id) and must never land on the driver."""
    import ray
    import ray.data as rd

    t0 = time.time()
    if isinstance(input_path, str):
        ds = rd.read_parquet(input_path, columns=INPUT_COLUMNS)
    else:
        ds = input_path

    from ..stages.aggregate import count_by_multi

    metrics: dict = {}
    sink_dir = None
    if write_sinks:
        assert out_dir is not None
        sink_dir = os.path.join(out_dir, "sinks")
        metrics["sink_dir"] = sink_dir
    key_sets = {"tool": AGG_KEYS, "conv": CONV_AGG_KEYS}
    if enrich_concurrency is not None:
        # caller pinned a pool → keep the fixed actor-pool form
        agg_src = ds.map_batches(
            FlagshipStage,
            fn_constructor_kwargs={"sink_dir": sink_dir,
                                   "agg_partials": key_sets},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=enrich_concurrency)
    else:
        # default: plain tasks + per-worker state cache (see
        # _flagship_batch) — no pool spin-up, no idle cores, and the
        # Ray scheduler balances these tasks against the read
        agg_src = ds.map_batches(
            _flagship_batch,
            fn_kwargs={"sink_dir": sink_dir, "keep_columns": None,
                       "agg_partials_key": "tool+conv",
                       "agg_partials": key_sets},
            batch_format="pyarrow", batch_size=batch_size)

    stats: dict = {}
    agg_dir = None
    if agg_out == "parquet":
        assert out_dir is not None, "agg_out='parquet' needs out_dir"
        agg_dir = os.path.join(out_dir, "agg")
    elif agg_out != "pandas":
        raise ValueError("agg_out must be 'pandas' or 'parquet'")
    aggs = count_by_multi(agg_src, key_sets, stats_out=stats,
                          out_dir=agg_dir, pre_partialed=True)
    tool_tbl = aggs["tool"]
    conv_tbl = aggs["conv"]
    metrics["wall_sec"] = time.time() - t0
    if agg_out == "parquet":
        # distributed sum over the (small) tool aggregate — no frame pull
        metrics["rows"] = int(tool_tbl.sum("n") or 0)
        metrics["agg_dir"] = agg_dir
    else:
        metrics["rows"] = int(tool_tbl["n"].sum()) if len(tool_tbl) else 0
    metrics["stage_stats"] = stats.get("stats", "")
    metrics["agg_phases"] = stats.get("phases", {})
    if write_sinks:
        # per-stage metrics next to the output (north_rule: metrics
        # emitted per stage)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "_metrics.json"), "w") as f:
            json.dump({k: v for k, v in metrics.items()}, f, indent=1)
    return {"agg_tool": tool_tbl, "agg_conv": conv_tbl, "metrics": metrics}


# ---------------------------------------------------------------------------
# Checkpoint / resume


def _clear_stale_shard(shard_out: str) -> None:
    """Remove a shard output dir left behind by a crashed run (called
    only for shards whose completion marker is absent, so nothing
    finished is ever deleted). Makes shard reprocessing idempotent —
    without this, rerun part files APPEND next to the stale ones and
    the final read_parquet over the sink tree double-counts rows
    (ADVICE r1)."""
    import shutil

    if os.path.isdir(shard_out):
        shutil.rmtree(shard_out)


def _shards(files: list[str], num_shards: int) -> list[list[str]]:
    out: list[list[str]] = [[] for _ in range(min(num_shards, max(1, len(files))))]
    for i, f in enumerate(sorted(files)):
        out[i % len(out)].append(f)
    return [s for s in out if s]


def run_resumable(
    input_dir: str,
    out_dir: str,
    *,
    num_shards: int = 16,
    batch_size: int = 65536,
):
    """Resumable run: per-shard streaming execution with manifest +
    lineage. Idempotent — a rerun after a crash skips finished shards
    (deterministic shard → file assignment, atomic manifest writes)."""
    import ray.data as rd

    files = [
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    ]
    shards = _shards(files, num_shards)
    manifest_dir = os.path.join(out_dir, "_manifest")
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(lineage_dir, exist_ok=True)

    done, skipped = [], []
    for i, shard_files in enumerate(shards):
        marker = os.path.join(manifest_dir, f"shard-{i:05d}.json")
        if os.path.exists(marker):
            skipped.append(i)
            continue
        t0 = time.time()
        ds = rd.read_parquet(shard_files, columns=INPUT_COLUMNS)
        shard_out = os.path.join(out_dir, "sinks", f"shard={i:05d}")
        # a crash mid-write leaves part files with no marker; clear
        # them before reprocessing or the final read double-counts
        _clear_stale_shard(shard_out)
        # single pass: fused parse→enrich→route→write, then per-sink
        # counts from the SAME stream (no re-read of the output);
        # task form — per-worker state cache, no pool spin-up per shard
        sunk = ds.map_batches(
            _flagship_batch,
            fn_kwargs={"sink_dir": shard_out, "keep_columns": None,
                       "agg_partials_key": None, "agg_partials": None},
            batch_format="pyarrow", batch_size=batch_size)
        counts = (
            count_by(sunk, ["sink"]).to_pandas()
            .set_index("sink")["n"].to_dict()
        )
        lineage = {
            "shard": i,
            "input_files": shard_files,
            "output_dir": shard_out,
            "rows_out_per_sink": {k: int(v) for k, v in counts.items()},
            "wall_sec": time.time() - t0,
            "stages": ["parse", "enrich", "route", "write"],
        }
        with open(os.path.join(lineage_dir, f"shard-{i:05d}.json"), "w") as f:
            json.dump(lineage, f, indent=1)
        # atomic completion marker LAST — crash before this reruns the shard
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"shard": i, "files": shard_files}, f)
        os.replace(tmp, marker)
        done.append(i)

    agg_src = rd.read_parquet(
        os.path.join(out_dir, "sinks"), columns=["sink", "conv_id", "tool"]
    )
    agg_tool = count_by(agg_src, AGG_KEYS).to_pandas()
    agg_conv = count_by(agg_src, CONV_AGG_KEYS).to_pandas()
    return {
        "agg_tool": agg_tool,
        "agg_conv": agg_conv,
        "shards_done": done,
        "shards_skipped": skipped,
    }
