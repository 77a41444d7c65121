"""Partition-parallel window operators (running sums, per-key top-k,
sessionization) without per-key Python.

``groupby(key).map_groups`` pays ~1 ms of Python per GROUP — fatal
when keys number in the millions (CLAUDE.md rule 6). The idiom here
instead hash-partitions keys into a BOUNDED number of partitions
(``groupby(_pid)``, default 64 groups regardless of key count),
sorts each partition once with an Arrow kernel, and runs the window
as vectorized numpy segment ops (cumsum/diff/rank with per-key
resets). Python cost is O(num_partitions); everything per-row is a
C kernel.

Partitioning assumption: all rows of one key fit in one partition
task (keys are hashed, so a partition holds ~n_keys/num_partitions
keys; size partitions so the largest fits a worker heap). This is the
same assumption any PARTITION BY window has.

Reference parity: these implement the SQL-window shapes used by the
driver oracle (row_number / running sum / session gaps); the
reference (VRL) has no window operator — this is part of the
beyond-reference training-pipeline surface (SURVEY §2.3).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash_partition_ids(col: pa.ChunkedArray | pa.Array,
                        num_partitions: int) -> pa.Array:
    """Deterministic vectorized key → partition id (works for int and
    string keys; pandas' C hash, no Python loop)."""
    import pandas as pd

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    else:
        h = pd.util.hash_array(np.asarray(arr.to_pandas(), dtype=object))
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def window_partitions(requested: int | None = None, *,
                      rows: int | None = None,
                      rows_per_partition: int = 2_000_000,
                      base: int = 64, hi: int = 8192) -> int:
    """Size a window stage's hash-partition count to the DATA
    (mirror of stages/join.join_partitions, VERDICT r4 item 1): a
    fixed count means dataset/count rows inside ONE map_groups task —
    fine at sf0.1, an OOM at 100x.

    - ``rows``: partitions = ceil(rows / rows_per_partition), floored
      at ``base`` (small inputs keep today's cheap 64-way spread; the
      per-partition fixed cost of a groupby task is tiny, unlike a
      join's aggregator actors) and capped at ``hi`` — at 10^12-row
      scale pass a larger ``rows_per_partition`` sized to worker heap.
    - ``requested``: explicit override, clamped to [1, hi].
    - neither: ``base`` (the historical default)."""
    if requested is not None:
        return max(1, min(int(requested), hi))
    if rows is not None and rows > 0:
        need = -(-int(rows) // rows_per_partition)   # ceil
        return min(hi, max(base, need))
    return base


def partitioned_apply(ds, key: str, fn: Callable[[pa.Table], pa.Table],
                      *, num_partitions: int | None = None,
                      rows: int | None = None):
    """Co-locate all rows of each ``key`` and apply ``fn`` once per
    hash PARTITION (bounded count), never per key. ``fn`` sees an
    Arrow table whose rows cover complete keys. Pass ``rows`` (cheap
    on a pruned parquet read: metadata-only count) so the partition
    count scales with the data instead of a fixed 64."""
    num_partitions = window_partitions(num_partitions, rows=rows)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_pid", _hash_partition_ids(b[key],
                                                           num_partitions))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def apply(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["_pid"]))

    return tagged.groupby("_pid").map_groups(apply, batch_format="pyarrow")


def _segments(keys: np.ndarray):
    """Start indices + lengths of equal-key runs in a sorted array."""
    n = len(keys)
    if n == 0:
        return np.array([], np.int64), np.array([], np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return starts, lens


def running_sum(ds, *, key: str, order_by: list[str], value: str,
                out: str = "running_value", round_to: int | None = 2,
                keep: list[str] | None = None,
                num_partitions: int | None = None,
                rows: int | None = None):
    """SUM(value) OVER (PARTITION BY key ORDER BY order_by ROWS
    UNBOUNDED PRECEDING) — vectorized segmented cumsum per hash
    partition."""

    def fn(t: pa.Table) -> pa.Table:
        sort_keys = [(key, "ascending")] + [(c, "ascending") for c in order_by]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        starts, lens = _segments(k)
        cs = np.cumsum(v)
        base = np.repeat(cs[starts] - v[starts], lens)
        run = cs - base
        if round_to is not None:
            run = np.round(run, round_to)
        cols = keep if keep is not None else [key] + order_by
        out_t = t.select(cols)
        return out_t.append_column(out, pa.array(run, pa.float64()))

    return partitioned_apply(ds, key, fn, num_partitions=num_partitions,
                             rows=rows)


def top_k_per_key(ds, *, key: str, order_col: str, k: int,
                  descending: bool = True, tiebreak: str | None = None,
                  num_partitions: int | None = None,
                  rows: int | None = None):
    """row_number() OVER (PARTITION BY key ORDER BY order_col [DESC]
    [, tiebreak]) <= k — segmented rank, no per-key Python."""

    def fn(t: pa.Table) -> pa.Table:
        sort_keys = [(key, "ascending"),
                     (order_col, "descending" if descending else "ascending")]
        if tiebreak:
            sort_keys.append((tiebreak, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        kk = t[key].to_numpy(zero_copy_only=False)
        starts, lens = _segments(kk)
        rank = np.arange(len(kk)) - np.repeat(starts, lens)
        return t.filter(pa.array(rank < k))

    return partitioned_apply(ds, key, fn, num_partitions=num_partitions,
                             rows=rows)


def asof_join(left, right, *, key: str, ts: str,
              value_cols: list[str], suffix: str = "_right",
              num_partitions: int | None = None,
              rows: int | None = None,
              hot_key_threshold: int | None = None,
              hot_time_splits: int = 16):
    """As-of join: each left row picks up the LATEST right row with
    ``right.ts <= left.ts`` for the same ``key`` (DuckDB/kdb ASOF JOIN
    semantics; lefts before any right get nulls).

    Ray Data has no native as-of join; the composition is
    union-with-side-tag → hash-partition by key (bounded partition
    count) → within-partition sort by (key, ts, side) → vectorized
    forward-fill of right values → emit left rows. One shuffle, no
    per-key Python. Ties (left.ts == right.ts) take the right row, so
    side sorts rights before lefts at equal ts.

    Partitioning assumption: one key's rows fit one partition task —
    the same assumption as any PARTITION BY window. For skewed keys
    that break it, pass ``hot_key_threshold``: keys whose total row
    count exceeds it are sub-partitioned into ``hot_time_splits``
    time ranges, each split joined independently after receiving a
    "carry-in" copy of the latest right row from all earlier splits
    (at most hot_keys × splits replicated rows — the skew analogue of
    the LSH hot-bucket guard). Output is identical to the unsplit
    path; only the partition sizes change."""
    num_partitions = window_partitions(num_partitions, rows=rows)
    lcols = list(left.schema().names)

    # normalize both sides to a common schema:
    # key, ts, _side, left payload (nulls on right rows), right values
    rschema = right.schema()
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lschema = left.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    payload = [c for c in lcols if c not in (key, ts)]

    def norm_left(b: pa.Table) -> pa.Table:
        cols = {key: b[key], ts: b[ts],
                "_side": pa.array(np.ones(len(b), dtype=np.int8))}
        for c in payload:
            cols[c] = b[c]
        for c in value_cols:
            cols[c + suffix] = pa.nulls(len(b), rtypes[c])
        return pa.table(cols)

    def norm_right(b: pa.Table) -> pa.Table:
        cols = {key: b[key], ts: b[ts],
                "_side": pa.array(np.zeros(len(b), dtype=np.int8))}
        for c in payload:
            cols[c] = pa.nulls(len(b), ltypes[c])
        for c in value_cols:
            cols[c + suffix] = b[c]
        return pa.table(cols)

    u = left.map_batches(norm_left, batch_format="pyarrow").union(
        right.map_batches(norm_right, batch_format="pyarrow"))

    def fill(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(key, "ascending"), (ts, "ascending"),
                          ("_side", "ascending")]))
        k = t[key].to_numpy(zero_copy_only=False)
        side = t["_side"].to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            return t.drop_columns(["_side"]).filter(pa.array([], pa.bool_()))
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        # last right-row index at or before each position (per key)
        is_right = side == 0
        idx = np.arange(n)
        src = np.where(is_right, idx, -1)
        src[new_key & ~is_right] = -1
        # segmented forward max: np.maximum.accumulate with resets
        seg_id = np.cumsum(new_key) - 1
        # reset trick: offset each segment so accumulate can't leak
        big = (seg_id.astype(np.int64) + 1) * (n + 1)
        filled = np.maximum.accumulate(np.where(src >= 0, big + src, 0))
        take_src = filled - big
        valid = (filled >= big) & (take_src >= 0)
        out = t
        for c in value_cols:
            col = t[c + suffix].combine_chunks() \
                if isinstance(t[c + suffix], pa.ChunkedArray) \
                else t[c + suffix]
            taken = col.take(pa.array(np.where(valid, take_src, 0)))
            out = out.set_column(
                out.column_names.index(c + suffix), c + suffix,
                pc.if_else(pa.array(valid), taken,
                           pa.nulls(n, col.type)))
        keep = out.filter(pa.array(side == 1))
        return keep.drop_columns(["_side"])

    if hot_key_threshold is None:
        return partitioned_apply(u, key, fill,
                                 num_partitions=num_partitions)
    return _asof_skew_apply(u, key=key, ts=ts, fill=fill,
                            num_partitions=num_partitions,
                            threshold=int(hot_key_threshold),
                            splits=max(2, int(hot_time_splits)))


def _np_obj(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.to_pandas(), dtype=object)


def _asof_skew_apply(u, *, key: str, ts: str, fill, num_partitions: int,
                     threshold: int, splits: int):
    """Skew-aware partition assignment for :func:`asof_join`.

    Detects keys whose union row count exceeds ``threshold`` (pulling
    ONLY the hot keys to the driver — the counts stay distributed),
    sub-partitions each into ``splits`` time ranges, and replicates
    the latest right row of every earlier range into each later one
    ("carry-in") so each range joins independently. At most
    ``len(hot) × splits`` rows are replicated."""
    import ray as _ray
    import ray.data as rd

    mat = u.materialize()

    counts = mat.groupby(key).count()
    hot_rows = counts.map_batches(
        lambda b: b.filter(pc.greater(b["count()"], threshold)),
        batch_format="pyarrow").take_all()
    if not hot_rows:
        return partitioned_apply(mat, key, fill,
                                 num_partitions=num_partitions)
    hot_keys = sorted(r[key] for r in hot_rows)
    if len(hot_keys) * splits > 1_000_000:
        raise ValueError(
            f"asof_join: {len(hot_keys)} keys exceed hot_key_threshold="
            f"{threshold}; the threshold is meant for a FEW skewed keys "
            f"(carry-in replication would be {len(hot_keys) * splits} "
            f"rows). Raise the threshold.")
    hot_index = {k: i for i, k in enumerate(hot_keys)}
    hot_set = pa.array(hot_keys)

    # global ts range of hot rows (map-side partial, <=1 row per block)
    def _mm(b: pa.Table) -> pa.Table:
        m = b.filter(pc.is_in(b[key], value_set=hot_set))
        if len(m) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        tv = _as_int64(m[ts])
        return pa.table({"lo": pa.array([int(tv.min())]),
                         "hi": pa.array([int(tv.max())])})

    mm = mat.map_batches(_mm, batch_format="pyarrow").take_all()
    t_lo = min(r["lo"] for r in mm)
    t_hi = max(r["hi"] for r in mm)
    width = max((t_hi - t_lo) // splits + 1, 1)

    def _split_of(tv: np.ndarray) -> np.ndarray:
        return np.clip((tv - t_lo) // width, 0, splits - 1).astype(np.int64)

    # latest right row per (hot key, split): per-block partial rows
    # (union schema + _hsplit), then a tiny driver combine.
    def _latest_right(b: pa.Table) -> pa.Table:
        import pandas as pd

        mask = pc.and_(pc.is_in(b[key], value_set=hot_set),
                       pc.equal(b["_side"], 0))
        m = b.filter(mask)
        if len(m) == 0:
            return m.append_column("_hsplit", pa.array([], pa.int64()))
        tv = _as_int64(m[ts])
        sp = _split_of(tv)
        df = pd.DataFrame({"k": _np_obj(m[key]), "s": sp, "t": tv,
                           "i": np.arange(len(m))})
        pick = (df.sort_values("t", kind="stable")
                .groupby(["k", "s"], sort=False).tail(1)["i"]
                .to_numpy())
        pick.sort()
        return m.take(pa.array(pick)).append_column(
            "_hsplit", pa.array(sp[pick], pa.int64()))

    pmat = mat.map_batches(_latest_right,
                           batch_format="pyarrow").materialize()
    ptabs = [t for t in _ray.get(pmat.to_arrow_refs()) if t.num_rows]

    def _pid_hot(kv, sv: int) -> int:
        return num_partitions + hot_index[kv] * splits + sv

    carry_tbl = None
    if ptabs:
        ptab = pa.concat_tables(ptabs)
        ptv = _as_int64(ptab[ts])
        psp = ptab["_hsplit"].to_numpy(zero_copy_only=False)
        pkv = _np_obj(ptab[key])
        order = np.lexsort((ptv, psp))
        take_idx: list[int] = []
        tgt_pid: list[int] = []
        for k in hot_keys:
            rows = [i for i in order if pkv[i] == k]
            run = None
            pos = 0
            for s in range(splits):
                # latest right in split s (rows are (split, ts)-sorted)
                latest_in_s = None
                while pos < len(rows) and psp[rows[pos]] == s:
                    latest_in_s = rows[pos]
                    pos += 1
                if run is not None and s > 0:
                    take_idx.append(run)
                    tgt_pid.append(_pid_hot(k, s))
                if latest_in_s is not None:
                    run = latest_in_s
        if take_idx:
            carry_tbl = (ptab.take(pa.array(take_idx, pa.int64()))
                         .drop_columns(["_hsplit"])
                         .append_column("_pid",
                                        pa.array(tgt_pid, pa.int64())))

    def _tag(b: pa.Table) -> pa.Table:
        import pandas as pd

        pid = _hash_partition_ids(b[key], num_partitions) \
            .to_numpy(zero_copy_only=False).copy()
        hot_mask = pc.is_in(b[key], value_set=hot_set) \
            .to_numpy(zero_copy_only=False)
        if hot_mask.any():
            tv = _as_int64(b[ts])[hot_mask]
            sp = _split_of(tv)
            hidx = pd.Series(_np_obj(b[key])[hot_mask]) \
                .map(hot_index).to_numpy(dtype=np.int64)
            pid[hot_mask] = num_partitions + hidx * splits + sp
        return b.append_column("_pid", pa.array(pid, pa.int64()))

    tagged = mat.map_batches(_tag, batch_format="pyarrow")
    if carry_tbl is not None:
        cols = list(carry_tbl.column_names)
        tagged = tagged.map_batches(
            lambda b, _c=cols: b.select(_c), batch_format="pyarrow")
        tagged = tagged.union(rd.from_arrow(carry_tbl))

    def _apply(g: pa.Table) -> pa.Table:
        return fill(g.drop_columns(["_pid"]))

    return tagged.groupby("_pid").map_groups(_apply,
                                             batch_format="pyarrow")


def _as_int64(col) -> "np.ndarray":
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def range_join(left, right, *, key: str, point: str, lo: str, hi: str,
               bucket_width: int | None = None, right_cols: list[str],
               num_partitions: int | None = None,
               max_interval_buckets: int = 1024,
               giant_intervals: str = "error"):
    """Interval (band) join: emit (left, right) pairs where
    ``lo <= left.point <= hi`` for the same ``key`` — the non-equi
    join shape Ray Data lacks.

    Bucketization turns it into ONE equi hash join: every right
    interval explodes to the ``bucket_width``-wide buckets it covers,
    every left point maps to its single bucket, the join runs on
    (key, bucket), and an exact filter keeps in-range pairs. Each
    matching pair meets in exactly one bucket (the point's), so no
    dedup pass is needed. ``max_interval_buckets`` guards degenerate
    giant intervals (the LSH hot-bucket idiom: a pathological interval
    would otherwise explode the join). Timestamps are compared at
    microsecond precision (int64).

    ``giant_intervals`` controls intervals wider than
    ``max_interval_buckets`` buckets: ``"error"`` (default) raises with
    the offending count — clipping would SILENTLY drop matches for
    points past the clip (ADVICE r2); ``"clip"`` restores the old
    lossy behavior for callers that accept it.

    ``bucket_width=None`` (default) derives the width from interval
    stats: the mean interval width (≈2× replication of the right
    side, bounded bucket fan-in), raised if needed so the WIDEST
    interval fits ``max_interval_buckets`` buckets. The stats pass
    materializes the right side once (it is re-read by the explode);
    pass an explicit width to skip it."""
    from .join import join_partitions

    if giant_intervals not in ("error", "clip"):
        raise ValueError("giant_intervals must be 'error' or 'clip'")
    num_partitions = join_partitions(num_partitions)
    if bucket_width is None:
        right = right.materialize()

        def _wstats(b: pa.Table) -> pa.Table:
            widths = _as_int64(b[hi]) - _as_int64(b[lo]) + 1
            return pa.table({"n": pa.array([len(b)]),
                             "sw": pa.array([int(widths.sum())]),
                             "mx": pa.array([int(widths.max())])})

        stats = right.map_batches(_wstats, batch_format="pyarrow") \
            .take_all()
        n_iv = sum(r["n"] for r in stats)
        if n_iv == 0:
            bucket_width = 1
        else:
            mean_w = sum(r["sw"] for r in stats) / n_iv
            mx_w = max(r["mx"] for r in stats)
            bucket_width = max(1, int(round(mean_w)),
                               -(-mx_w // max_interval_buckets))
    w = int(bucket_width)

    def explode_right(b: pa.Table) -> pa.Table:
        los = _as_int64(b[lo])
        his = _as_int64(b[hi])
        b0 = los // w
        b1 = his // w
        raw = b1 - b0 + 1
        if giant_intervals == "error":
            n_giant = int((raw > max_interval_buckets).sum())
            if n_giant:
                widest = int(raw.max()) * w
                raise ValueError(
                    f"range_join: {n_giant} interval(s) span more than "
                    f"max_interval_buckets={max_interval_buckets} buckets "
                    f"(widest ≈ {widest} units). Raise bucket_width or "
                    f"max_interval_buckets, or pass "
                    f"giant_intervals='clip' to accept missed matches.")
        spans = np.clip(raw, 0, max_interval_buckets)
        idx = np.repeat(np.arange(len(b)), spans)
        # bucket offsets within each interval
        off = np.arange(len(idx)) - np.repeat(
            np.cumsum(spans) - spans, spans)
        buckets = b0[idx] + off
        cols = {"_bucket": pa.array(buckets, pa.int64()),
                "_lo": pa.array(los[idx]), "_hi": pa.array(his[idx])}
        kcol = (b[key].combine_chunks()
                if isinstance(b[key], pa.ChunkedArray) else b[key])
        cols[key] = kcol.take(pa.array(idx))
        for c in right_cols:
            col = (b[c].combine_chunks()
                   if isinstance(b[c], pa.ChunkedArray) else b[c])
            cols[c] = col.take(pa.array(idx))
        return pa.table(cols)

    def tag_left(b: pa.Table) -> pa.Table:
        pts = _as_int64(b[point])
        return b.append_column("_bucket", pa.array(pts // w, pa.int64())) \
            .append_column("_pt", pa.array(pts))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(explode_right, batch_format="pyarrow")
    j = lt.join(rt, join_type="inner", num_partitions=num_partitions,
                on=(key, "_bucket"))

    def in_range(b: pa.Table) -> pa.Table:
        pts = b["_pt"].to_numpy(zero_copy_only=False)
        los = b["_lo"].to_numpy(zero_copy_only=False)
        his = b["_hi"].to_numpy(zero_copy_only=False)
        keep = (pts >= los) & (pts <= his)
        return b.filter(pa.array(keep)) \
            .drop_columns(["_bucket", "_pt", "_lo", "_hi"])

    return j.map_batches(in_range, batch_format="pyarrow")


def session_counts(ds, *, key: str, ts: str, gap_seconds: float,
                   out: str = "n_sessions",
                   num_partitions: int | None = None,
                   rows: int | None = None):
    """Count session windows (new session when the gap since the
    previous event of the same key exceeds ``gap_seconds``) — one
    row per key. Segmented diff + per-partition Arrow group_by."""

    def fn(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(key, "ascending"), (ts, "ascending")]))
        k = t[key].to_numpy(zero_copy_only=False)
        tv = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        n = len(k)
        if n == 0:
            return pa.table({key: t[key], out: pa.array([], pa.int64())})
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = np.iinfo(np.int64).max
        gap[1:] = tv[1:] - tv[:-1]
        new_sess = new_key | (gap > int(gap_seconds * 1e6))
        flagged = pa.table({key: t[key],
                            "_s": pa.array(new_sess.astype(np.int64))})
        g = flagged.group_by([key]).aggregate([("_s", "sum")])
        return g.rename_columns([key, out])

    return partitioned_apply(ds, key, fn, num_partitions=num_partitions)
