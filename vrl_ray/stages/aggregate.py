"""Aggregate stage: skew-aware two-phase grouped counts.

A bare ``ds.groupby(keys).count()`` shuffles EVERY row — with
zipf-skewed conv_ids the hot key's partition straggles. Two-phase
instead (SURVEY §2.3 / §7 Phase 6):

1. map-side partial: inside ``map_batches``, group the batch with
   pyarrow's hash kernel and emit one row per distinct key per batch
   (combiner);
2. final: ``groupby(keys).sum("n")`` over the much smaller partials.

The shuffle then moves O(distinct keys x blocks) rows instead of
O(rows), and a hot conv_id contributes one partial row per block —
skew is flattened before the exchange.
"""

from __future__ import annotations

import pyarrow as pa


def _partial_counts(keys):
    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            empty = {k: pa.array([], batch.schema.field(k).type) for k in keys}
            empty["n"] = pa.array([], pa.int64())
            return pa.table(empty)
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["n"])
    return partial


def count_by(ds, keys: list[str]):
    """Two-phase distributed count; returns a Dataset with columns
    ``keys + ['n']``."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(_partial_counts(keys), batch_format="pyarrow")
    out = partials.groupby(keys).aggregate(Sum("n", alias_name="n"))
    return out


def count_by_small(ds, keys: list[str]):
    """Grouped count for BOUNDED-cardinality keys, returned as a
    pandas frame: map-side partials + a single driver combine (no
    distributed shuffle — the shuffle's fixed cost exceeds the work
    whenever distinct keys ≪ rows). Use count_by() when the key space
    is unbounded."""
    import ray

    mat = ds.map_batches(_partial_counts(keys),
                         batch_format="pyarrow").materialize()
    tables = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
    if not tables:
        import pandas as pd

        return pd.DataFrame(columns=keys + ["n"])
    df = pa.concat_tables(tables).to_pandas()
    return (df.groupby(keys, dropna=False, sort=False)["n"]
            .sum().reset_index())


def count_by_multi(ds, key_sets: dict[str, list[str]], stats_out=None,
                   max_driver_rows: int = 2_000_000, out_dir=None):
    """Several grouped counts in ONE pass over the input (one read, one
    shuffle instead of one per aggregation): each batch emits partials
    for every key set, tagged and reshaped to a common schema
    ``(which, k0, k1, n)``; a single groupby-sum finishes all of them.

    Cardinality-aware combine: while total partial rows stay under
    ``max_driver_rows`` the combine runs on the driver (a distributed
    shuffle's ~3 s fixed cost exceeds the work — BASELINE.md). Beyond
    the budget (unbounded keys, e.g. conv_id at 10¹² turns) the
    combine switches to a distributed groupby over the materialized
    partials, and the driver only ever pulls the final distinct-key
    result. ``stats_out['phases']['combine']`` records which path ran.

    Returns ``{name: pandas.DataFrame(keys + ['n'])}``. All key
    columns must be string-typed.

    ``out_dir`` (scale-out path): when set, the combine is ALWAYS
    distributed and each key set's result is written to
    ``out_dir/<name>/`` as parquet; the return value is
    ``{name: ray.data.Dataset}`` (lazy read-back) and the driver never
    holds a frame — at 10^12 turns the conv-keyed result is O(distinct
    conv_id), which belongs in the cluster, not on the driver
    (VERDICT r2 item 7).
    """
    import pandas as pd
    import pyarrow.compute as pc

    names = list(key_sets)
    width = max(len(v) for v in key_sets.values())

    def partial(batch: pa.Table) -> pa.Table:
        pieces = []
        for which, keys in key_sets.items():
            if len(batch) == 0:
                continue
            g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
            g = g.rename_columns(keys + ["n"])
            cols = {"which": pa.array([which] * len(g), pa.string())}
            for i in range(width):
                if i < len(keys):
                    cols[f"k{i}"] = pc.cast(g[keys[i]], pa.string())
                else:
                    cols[f"k{i}"] = pa.nulls(len(g), pa.string())
            cols["n"] = g["n"]
            pieces.append(pa.table(cols))
        if not pieces:
            return pa.table(
                {"which": pa.array([], pa.string()),
                 **{f"k{i}": pa.array([], pa.string()) for i in range(width)},
                 "n": pa.array([], pa.int64())})
        return pa.concat_tables(pieces)

    group_cols = ["which"] + [f"k{i}" for i in range(width)]
    # Final combine on the driver: the map-side combiner already
    # shrank the data to O(distinct keys × blocks) partial rows, so a
    # distributed sort/shuffle aggregate costs more than shipping the
    # partials once and reducing them with one vectorized groupby.
    # (Holds while distinct keys ≪ rows — the sink/tool/conv_id case.
    # For unbounded-cardinality keys use count_by(), which keeps the
    # combine distributed.)
    import ray

    # materialize FIRST: to_arrow_refs() on a lazy Dataset re-executes
    # the plan (double-running any side-effecting stage upstream, e.g.
    # the sink writer); on a materialized one it just hands over refs
    import time as _time

    t0 = _time.time()
    mat = ds.map_batches(partial, batch_format="pyarrow").materialize()
    t1 = _time.time()
    total_partials = mat.count()  # metadata count on materialized blocks
    if out_dir is not None:
        # scale-out combine: distributed groupby, results land in
        # parquet (one directory per key set), driver pull = ZERO rows
        import os

        from ray.data.aggregate import Sum

        # materialize the merged counts once so the per-key-set split
        # below doesn't re-run the shuffle per key set
        merged_mat = mat.groupby(group_cols).aggregate(
            Sum("n", alias_name="n")).materialize()
        t2 = _time.time()

        def _splitter(which: str, keys: list[str]):
            def split(b: pa.Table) -> pa.Table:
                sub = b.filter(pc.equal(b["which"], which))
                cols = {k: sub[f"k{i}"] for i, k in enumerate(keys)}
                cols["n"] = sub["n"]
                return pa.table(cols)
            return split

        import ray.data as rd

        out_ds: dict = {}
        for which, keys in key_sets.items():
            d = os.path.join(out_dir, which)
            merged_mat.map_batches(
                _splitter(which, keys),
                batch_format="pyarrow").write_parquet(d)
            out_ds[which] = rd.read_parquet(d)
        t3 = _time.time()
        if stats_out is not None:
            stats_out["stats"] = mat.stats()
            stats_out["phases"] = {
                "map_and_partials_sec": round(t1 - t0, 2),
                "driver_pull_sec": 0.0,
                "shuffle_and_write_sec": round(t3 - t2, 2),
                "partial_rows": int(total_partials),
                "driver_pulled_rows": 0,
                "combine": "distributed-parquet",
            }
        return out_ds
    if total_partials <= max_driver_rows:
        combine = "driver"
        tables = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
        partials_df = pa.concat_tables(tables).to_pandas() if tables else \
            pd.DataFrame(columns=group_cols + ["n"])
        t2 = _time.time()
        merged = (partials_df.groupby(group_cols, dropna=False,
                                      sort=False)["n"]
                  .sum().reset_index())
        pulled = len(partials_df)
    else:
        # unbounded key cardinality: distributed combine; the driver
        # pull shrinks from distinct×blocks partials to distinct keys
        combine = "distributed"
        from ray.data.aggregate import Sum

        merged_ds = mat.groupby(group_cols).aggregate(
            Sum("n", alias_name="n"))
        t2 = _time.time()
        merged = merged_ds.to_pandas()
        pulled = len(merged)
    t3 = _time.time()
    if stats_out is not None:
        # whole-pipeline operator stats (upstream stages fuse into
        # this plan) — callers persist these as per-stage metrics
        stats_out["stats"] = mat.stats()
        stats_out["phases"] = {
            "map_and_partials_sec": round(t1 - t0, 2),
            "driver_pull_sec": round(t2 - t1, 2),
            "driver_combine_sec": round(t3 - t2, 2),
            "partial_rows": int(total_partials),
            "driver_pulled_rows": int(pulled),
            "combine": combine,
        }
    out: dict[str, pd.DataFrame] = {}
    for which in names:
        keys = key_sets[which]
        sub = merged[merged["which"] == which]
        frame = pd.DataFrame(
            {k: sub[f"k{i}"].values for i, k in enumerate(keys)})
        frame["n"] = sub["n"].values
        out[which] = frame.reset_index(drop=True)
    return out
