"""Pipeline builder: a declarative remap-and-route pipeline from user
specs — the generalized form of the flagship (a user of the reference
brings a VRL program + route conditions; we compile both and wire the
Ray Data pipeline around them).

    spec = PipelineSpec(
        program=\"\"\"
            .kind = downcase(.event_type)
            .big, .err = to_int(.value)
        \"\"\",
        routes=[("errors", "@err:*"),            # datadog query syntax
                ("big", "@big:>=100")],
        default_sink="default",
        aggregates={"by_sink": ["sink"], "by_kind": ["sink", "kind"]},
    )
    result = run_pipeline(ds, spec, out_dir)

Compilation strategy per component (all once per actor):
- program → Arrow column plan when vectorizable (lang/vectorize.py),
  else the per-row interpreter
- each route condition → vectorized boolean mask
  (functions/datadog_query.compile_query_mask), else the row matcher;
  first-match-wins priority, exactly Vector's `route` transform
- sinks → write-through Hive-partitioned parquet in the SAME pass
- aggregates → map-side partials + single combine (count_by_multi)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa


@dataclass
class PipelineSpec:
    program: str                       # VRL transform applied per event
    routes: list                       # [(sink_name, datadog_query)]
    default_sink: str = "default"
    aggregates: dict = field(default_factory=dict)  # name -> key list
    batch_size: int = 65536
    #: optional exact dedup BEFORE the transform:
    #: {"column": <content col>, "id_column": <unique id col>}
    dedup: Optional[dict] = None
    #: input-read pruning (resumable path): None ⇒ derive the needed
    #: columns statically from program+routes+aggregates (whole-event
    #: programs read everything); a list ⇒ read exactly these columns
    #: (use to pass extra columns through to the sinks); False ⇒ read
    #: all columns.
    input_columns: object = None
    #: optional window computations over the ROUTED stream, returned
    #: as extra result frames: name -> one of
    #:   {"type": "session", "key": ..., "ts": ..., "gap_seconds": N}
    #:   {"type": "running_sum", "key": ..., "order_by": [...],
    #:    "value": ..., "keep": [...]}
    #:   {"type": "top_k", "key": ..., "order_col": ..., "k": N}
    windows: dict = field(default_factory=dict)


_SPEC_CACHE: dict = {}


def _spec_batch(batch: pa.Table, *, spec, sink_dir, keep_columns) \
        -> pa.Table:
    """Task-pool form of :class:`_SpecStage`: compiled spec state
    (VRL program, route masks) caches once per WORKER PROCESS keyed
    by the spec's repr — tasks reuse the session's warm workers
    instead of re-spinning a pool per execution (see CLAUDE.md perf
    rule 4)."""
    key = (repr(spec), sink_dir, tuple(keep_columns))
    st = _SPEC_CACHE.get(key)
    if st is None:
        st = _SPEC_CACHE[key] = _SpecStage(
            spec=spec, sink_dir=sink_dir, keep_columns=keep_columns)
    return st(batch)


class _SpecStage:
    """One fused actor: remap → route → (optional) sink write."""

    def __init__(self, spec: PipelineSpec, sink_dir: Optional[str],
                 keep_columns: list):
        from ..functions.datadog_query import (NotVectorizableQuery,
                                               compile_query_mask,
                                               match_datadog_query)
        from ..lang.remap import RemapStage, VectorRemapStage
        from ..lang.vectorize import NotVectorizable
        from ..lang.parser import ParseError

        pa.set_cpu_count(1)
        try:
            self.remap = VectorRemapStage(spec.program)
        except (NotVectorizable, ParseError):
            self.remap = RemapStage(spec.program)
        self.routes = []
        for name, q in spec.routes:
            # keep the query text alongside the compiled mask: term
            # validation happens at first call (needs the schema), so
            # a mask can still demote to the row matcher at runtime
            try:
                self.routes.append((name, compile_query_mask(q), q))
            except Exception:  # pragma: no cover - defensive
                self.routes.append((name, None, q))
        self.match_row = match_datadog_query
        self.spec = spec
        self.sink_dir = sink_dir
        self.keep = keep_columns

    def _route(self, batch: pa.Table) -> pa.Table:
        from ..functions.datadog_query import NotVectorizableQuery

        n = len(batch)
        sink = np.full(n, self.spec.default_sink, dtype=object)
        unassigned = np.ones(n, dtype=bool)
        rows = None
        for name, maskf, row_q in self.routes:
            if maskf is not None:
                try:
                    m = maskf(batch).to_numpy(zero_copy_only=False)
                except NotVectorizableQuery:
                    maskf = None
            if maskf is None:
                if rows is None:
                    rows = batch.to_pylist()
                m = np.array([self.match_row(
                    {k: v for k, v in r.items() if v is not None}, row_q)
                    for r in rows])
            m = m & unassigned
            sink[m] = name
            unassigned &= ~m
        return batch.append_column(
            "sink", pa.array(sink.tolist(), pa.string()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._route(self.remap(batch))
        if self.sink_dir is not None:
            from .transcript import make_sink_writer

            return make_sink_writer(self.sink_dir, self.keep)(out)
        return out


def run_pipeline_resumable(input_dir: str, spec: PipelineSpec,
                           out_dir: str, *, num_shards: int = 16):
    """Shard-checkpointed run of a declarative pipeline over a parquet
    directory: deterministic file→shard assignment, atomic per-shard
    manifest + lineage (same layout as transcript.run_resumable), a
    rerun skips completed shards. Aggregates are computed over ALL
    shards' sink output at the end (consistent after resume)."""
    import json
    import time

    import ray
    import ray.data as rd

    from .transcript import _shards
    from ..stages.aggregate import count_by_multi

    files = [os.path.join(input_dir, f) for f in os.listdir(input_dir)
             if f.endswith(".parquet")]
    shards = _shards(files, num_shards)
    manifest_dir = os.path.join(out_dir, "_manifest")
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(lineage_dir, exist_ok=True)

    agg_cols = sorted({"sink"} | {k for ks in spec.aggregates.values()
                                  for k in ks})
    # Prune the read to the columns the compiled program + routes +
    # aggregates actually touch (VERDICT r2 finding 2) — intersected
    # with the file schema because program OUTPUTS land in the
    # superset. None ⇒ whole-event access somewhere ⇒ read all.
    from ..lang.fields import spec_input_columns

    if spec.input_columns is False:
        read_cols = None
    elif spec.input_columns is not None:
        read_cols = list(spec.input_columns)
    else:
        read_cols = spec_input_columns(spec)
    if read_cols is not None and files:
        import pyarrow.parquet as pq

        on_disk = set(pq.read_schema(files[0]).names)
        read_cols = [c for c in read_cols if c in on_disk] or None

    done, skipped = [], []
    for i, shard_files in enumerate(shards):
        marker = os.path.join(manifest_dir, f"shard-{i:05d}.json")
        if os.path.exists(marker):
            skipped.append(i)
            continue
        t0 = time.time()
        shard_out = os.path.join(out_dir, "sinks", f"shard={i:05d}")
        from .transcript import _clear_stale_shard

        # idempotent reprocessing: drop stale part files from a
        # crashed attempt before writing (marker is absent here)
        _clear_stale_shard(shard_out)
        staged = rd.read_parquet(shard_files, columns=read_cols).map_batches(
            _spec_batch,
            fn_kwargs=dict(spec=spec, sink_dir=shard_out,
                           keep_columns=agg_cols),
            batch_format="pyarrow", batch_size=spec.batch_size)
        from ..stages.aggregate import count_by_small

        counts = count_by_small(staged, ["sink"])
        lineage = {
            "shard": i, "input_files": shard_files,
            "output_dir": shard_out,
            "rows_out_per_sink": {str(r["sink"]): int(r["n"])
                                  for r in counts.to_dict("records")},
            "wall_sec": time.time() - t0,
        }
        with open(os.path.join(lineage_dir, f"shard-{i:05d}.json"), "w") as f:
            json.dump(lineage, f, indent=1)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"shard": i, "files": shard_files}, f)
        os.replace(tmp, marker)
        done.append(i)

    agg_src = rd.read_parquet(os.path.join(out_dir, "sinks"),
                              columns=agg_cols)
    out: dict = {"shards_done": done, "shards_skipped": skipped,
                 "sink_dir": os.path.join(out_dir, "sinks")}
    if spec.aggregates:
        out["aggregates"] = count_by_multi(agg_src, dict(spec.aggregates))
    return out


def _apply_dedup(ds, dd: dict):
    """Exact dedup keeping full rows: surviving min-ids from
    exact_dedup, then a native left_semi join (both sides distributed,
    no driver key set)."""
    from ..stages.dedup import exact_dedup
    from ..stages.join import join_partitions

    column, id_column = dd["column"], dd["id_column"]
    keep = exact_dedup(ds, column=column, id_column=id_column)
    return ds.join(keep, join_type="left_semi",
                   num_partitions=join_partitions(),
                   on=(id_column,))


def _run_window(ds, w: dict):
    """Window results stay DATASETS — `running_sum` is one row per
    input row, so pulling it to pandas materializes the whole stream
    on the driver (the r1 scale-killer class; VERDICT r2 finding 1).
    Callers `.to_pandas()` small results or `write_parquet` big ones."""
    from ..stages import window as W

    kind = w["type"]
    if kind == "session":
        return W.session_counts(ds, key=w["key"], ts=w["ts"],
                                gap_seconds=w["gap_seconds"])
    if kind == "running_sum":
        return W.running_sum(ds, key=w["key"], order_by=w["order_by"],
                             value=w["value"], keep=w.get("keep"))
    if kind == "top_k":
        return W.top_k_per_key(ds, key=w["key"], order_col=w["order_col"],
                               k=w["k"], tiebreak=w.get("tiebreak"))
    raise ValueError(f"unknown window type {kind!r}")


def run_pipeline(ds, spec: PipelineSpec, out_dir: Optional[str] = None):
    """Execute the declarative pipeline in one streaming pass
    (plus one extra pass per requested window computation).
    Returns {"aggregates": {name: DataFrame}, "windows": {...},
    "sink_dir": ...}."""
    import ray

    from ..stages.aggregate import count_by_multi

    if spec.dedup:
        ds = _apply_dedup(ds, spec.dedup)

    agg_cols = sorted({"sink"} | {k for ks in spec.aggregates.values()
                                  for k in ks})
    win_cols = sorted({c for w in spec.windows.values()
                       for c in ([w.get("key"), w.get("ts"),
                                  w.get("value"), w.get("order_col")]
                                 + list(w.get("order_by", []))
                                 + list(w.get("keep", [])))
                       if c})
    keep_cols = sorted(set(agg_cols) | set(win_cols))
    sink_dir = os.path.join(out_dir, "sinks") if out_dir else None
    staged = ds.map_batches(
        _spec_batch,
        fn_kwargs=dict(spec=spec, sink_dir=sink_dir,
                       keep_columns=keep_cols),
        batch_format="pyarrow", batch_size=spec.batch_size)
    if sink_dir is None:
        staged = staged.select_columns(keep_cols)
    if spec.windows:
        # several consumers → materialize the slim routed columns once
        staged = staged.materialize()

    out: dict = {"sink_dir": sink_dir}
    if spec.aggregates:
        out["aggregates"] = count_by_multi(staged, dict(spec.aggregates))
    else:
        out["rows"] = staged.count()
    if spec.windows:
        out["windows"] = {name: _run_window(staged, w)
                          for name, w in spec.windows.items()}
    return out
