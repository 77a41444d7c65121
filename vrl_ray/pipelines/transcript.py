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
from ..stages.aggregate import count_by

#: columns the pipeline needs from the source (prune at the read)
INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

AGG_KEYS = ["sink", "tool"]
CONV_AGG_KEYS = ["sink", "conv_id"]


def transform(ds, *, enrich_concurrency: Optional[int] = None, batch_size: int = 65536):
    """parse → enrich → route (lazy; caller consumes)."""
    ds = ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=batch_size)
    # Enrich is a callable class → actor pool. concurrency=None lets
    # Ray autoscale the pool; pass an int to pin it.
    ds = ds.map_batches(
        Enrich,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=enrich_concurrency or (1, 16),
    )
    ds = ds.map_batches(route_batch, batch_format="pyarrow", batch_size=batch_size)
    return ds


def run_flagship(
    input_path,
    out_dir: Optional[str] = None,
    *,
    write_sinks: bool = True,
    enrich_concurrency: Optional[int] = None,
    batch_size: int = 65536,
):
    """Run the full pipeline. Returns a dict with the two aggregate
    Datasets (small) and metrics. ``input_path`` may be a path (str)
    or an existing Dataset."""
    import ray.data as rd

    t0 = time.time()
    if isinstance(input_path, str):
        ds = rd.read_parquet(input_path, columns=INPUT_COLUMNS)
    else:
        ds = input_path
    routed = transform(ds, enrich_concurrency=enrich_concurrency, batch_size=batch_size)

    metrics: dict = {}
    if write_sinks:
        assert out_dir is not None
        sink_dir = os.path.join(out_dir, "sinks")
        routed.write_parquet(sink_dir, partition_cols=["sink"])
        agg_src = rd.read_parquet(sink_dir, columns=["sink", "conv_id", "tool"])
        metrics["sink_dir"] = sink_dir
    else:
        agg_src = routed

    agg_tool = count_by(agg_src, AGG_KEYS)
    agg_conv = count_by(agg_src, CONV_AGG_KEYS)
    # both aggregates are small (distinct keys) — safe to materialize
    tool_tbl = agg_tool.to_pandas()
    conv_tbl = agg_conv.to_pandas()
    metrics["wall_sec"] = time.time() - t0
    metrics["rows"] = int(tool_tbl["n"].sum()) if len(tool_tbl) else 0
    return {"agg_tool": tool_tbl, "agg_conv": conv_tbl, "metrics": metrics}


# ---------------------------------------------------------------------------
# Checkpoint / resume


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
        routed = transform(ds, batch_size=batch_size)
        shard_out = os.path.join(out_dir, "sinks", f"shard={i:05d}")
        routed.write_parquet(shard_out, partition_cols=["sink"])
        # per-shard, per-sink row counts for lineage + later audit
        counts = (
            count_by(rd.read_parquet(shard_out, columns=["sink"]), ["sink"])
            .to_pandas()
            .set_index("sink")["n"]
            .to_dict()
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
