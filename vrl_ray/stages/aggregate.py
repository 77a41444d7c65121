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
    return _combine_partials(tables, keys)


def _combine_partials(tables, keys):
    if not tables:
        import pandas as pd

        return pd.DataFrame(columns=keys + ["n"])
    df = pa.concat_tables(tables).to_pandas()
    return (df.groupby(keys, dropna=False, sort=False)["n"]
            .sum().reset_index())


def count_by_blocks(mat_ds, keys: list[str]):
    """:func:`count_by_small` over an already-MATERIALIZED dataset:
    one remote partial-count task per existing block instead of a
    fresh Ray Data execution (whose launch overhead, ~2 s, dwarfs the
    work for mid-size inputs). Same driver-combine bound — use only
    when distinct keys ≪ rows."""
    import ray

    pfn = _partial_counts(keys)
    part = ray.remote(num_cpus=1)(lambda t: pfn(t))
    refs = mat_ds.to_arrow_refs()        # metadata-only: materialized
    tables = [t for t in ray.get([part.remote(r) for r in refs])
              if len(t)]
    return _combine_partials(tables, keys)


def multi_partial_fn(key_sets: dict[str, list[str]]):
    """Map-side combiner shared by :func:`count_by_multi` and fused
    producer stages (FlagshipStage emits these partials directly so
    no per-row column ever crosses its operator boundary): each batch
    reduces to one row per distinct key per key set, reshaped to the
    common schema ``(which, k0..k{width-1}, n)``."""
    import pyarrow.compute as pc

    width = max(len(v) for v in key_sets.values())

    def partial(batch: pa.Table) -> pa.Table:
        pieces = []
        for which, keys in key_sets.items():
            if len(batch) == 0:
                continue
            g = batch.select(keys).group_by(keys).aggregate(
                [([], "count_all")])
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
                 **{f"k{i}": pa.array([], pa.string())
                    for i in range(width)},
                 "n": pa.array([], pa.int64())})
        return pa.concat_tables(pieces)
    return partial, width


def count_by_multi(ds, key_sets: dict[str, list[str]], stats_out=None,
                   max_driver_rows: int = 2_000_000, out_dir=None,
                   pre_partialed: bool = False):
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
    partial, width = multi_partial_fn(key_sets)

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
    if pre_partialed:
        # producer already emitted the (which, k0.., n) partials
        # inside its own fused stage — nothing per-row ever crossed
        # an operator boundary
        mat = ds.materialize()
    else:
        mat = ds.map_batches(partial, batch_format="pyarrow") \
            .materialize()
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


# ---------------------------------------------------------------------------
# Distributed EXACT grouped quantile (no per-key materialization)
# ---------------------------------------------------------------------------

def _run_lengths(arr: pa.Array):
    """Vectorized run-length encoding of a (sorted) key column: returns
    (run_keys: pa.Array, run_lengths: np.ndarray). Null keys form their
    own run. No Python per row."""
    import numpy as np
    import pyarrow.compute as pc

    n = len(arr)
    if n == 0:
        return arr.slice(0, 0), np.array([], np.int64)
    d = pc.dictionary_encode(arr)
    codes = d.indices.fill_null(-1).to_numpy(zero_copy_only=False)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return arr.take(pa.array(starts)), lens


def grouped_quantile(ds, *, key: str, value: str, q: float,
                     out: str = "q_value", round_to: int | None = 4):
    """Exact per-key quantile with linear interpolation (matches SQL
    ``quantile_cont`` / pandas ``quantile(interpolation='linear')``)
    WITHOUT ever materializing a full group anywhere.

    Scale design (replaces the banned ``groupby(key).map_groups``
    full-group pull — a hot key at 100 TB is a multi-TB group):

    1. distributed range sort by ``(key, value)`` — a hot key's rows
       are SPLIT ACROSS BLOCKS by value range, so no single task holds
       a whole group;
    2. pass A (per sorted block, parallel): run-length metadata
       ``(run_keys, run_lens)`` — O(runs) per block, runs ≤ keys+1;
    3. driver: cumulative rank math over the tiny metadata gives, for
       each key, the exact blocks + local indices of the two order
       statistics ``floor(q*(n-1))`` / ``+1``;
    4. pass B (only the blocks that hold a target row): ``take`` of
       the named indices — ≤ 2 rows per key move to the driver.

    Driver memory is O(#keys + #block-key-runs), i.e. proportional to
    the RESULT, never the data. Null values are ignored (SQL
    semantics); null keys form their own group.
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    def drop_null_values(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b[value]))

    # keys whose values are ALL null must still come out (SQL emits
    # the group with a NULL quantile; r4 review finding) — collect the
    # distinct keys of null-valued rows map-side (tiny: one row per
    # such key per batch) before those rows are dropped
    def null_value_keys(b: pa.Table) -> pa.Table:
        nb = b.filter(pc.is_null(b[value])).select([key])
        if len(nb) == 0:
            return nb
        return nb.group_by([key]).aggregate([])

    null_keys = set()
    for part in (ds.map_batches(null_value_keys, batch_format="pyarrow")
                   .take_all()):
        null_keys.add(part[key])

    mat = (ds.map_batches(drop_null_values, batch_format="pyarrow")
             .sort([key, value])
             .materialize())
    refs = mat.to_arrow_refs()

    @ray.remote
    def pass_a(t: pa.Table):
        rk, rl = _run_lengths(
            t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray)
            else t[key])
        return rk.to_pylist(), rl

    @ray.remote
    def pass_b(t: pa.Table, idxs):
        col = t[value]
        return col.take(pa.array(idxs, pa.int64())).to_pylist()

    metas = ray.get([pass_a.remote(r) for r in refs])

    # Walk blocks in sorted order: global per-key counts + the global
    # rank offset at which each (block, run) begins within its key.
    counts: dict = {}
    runs = []  # (key_val, block_idx, start_in_block, global_key_offset, len)
    for bi, (rkeys, rlens) in enumerate(metas):
        start = 0
        for kv, ln in zip(rkeys, rlens):
            ln = int(ln)
            off = counts.get(kv, 0)
            runs.append((kv, bi, start, off, ln))
            counts[kv] = off + ln
            start += ln

    # Target ranks per key (pandas/numpy 'linear': pos = q*(n-1)).
    targets: dict = {}
    for kv, n in counts.items():
        if n == 0:
            continue
        pos = q * (n - 1)
        lo = int(math.floor(pos))
        hi = min(lo + 1, n - 1)
        targets[kv] = (lo, hi, pos - lo)

    # Map each needed global rank to (block, local index).
    need: dict = {}  # block_idx -> list[(key_val, which, local_idx)]
    for kv, bi, start, off, ln in runs:
        t = targets.get(kv)
        if t is None:
            continue
        lo, hi, _ = t
        for which, rank in (("lo", lo), ("hi", hi)):
            if off <= rank < off + ln:
                need.setdefault(bi, []).append(
                    (kv, which, start + (rank - off)))

    picked: dict = {}  # (key_val, which) -> value
    fetches = []
    for bi, items in need.items():
        idxs = [ix for (_, _, ix) in items]
        fetches.append((items, pass_b.remote(refs[bi], idxs)))
    for items, ref in fetches:
        vals = ray.get(ref)
        for (kv, which, _), v in zip(items, vals):
            picked[(kv, which)] = v

    out_keys, out_vals = [], []
    for kv, (lo, hi, frac) in targets.items():
        v_lo = float(picked[(kv, "lo")])
        v_hi = float(picked[(kv, "hi")])
        res = v_lo + (v_hi - v_lo) * frac
        if round_to is not None:
            res = round(res, round_to)
        out_keys.append(kv)
        out_vals.append(res)
    for kv in null_keys:
        if kv not in counts:      # every value was null → NULL result
            out_keys.append(kv)
            out_vals.append(float("nan"))
    return pd.DataFrame({key: out_keys, out: out_vals})
