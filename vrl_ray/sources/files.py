"""File sources beyond Parquet: NDJSON, CSV, plain text, syslog.

The reference's host (Vector) feeds VRL from file/socket sources that
decode bytes → events; a malformed line becomes an error event, never
a crash. These sources mirror that contract on Ray Data:

- :func:`read_ndjson` — line-delimited JSON with a PER-LINE error
  lane: bad lines land as ``(_raw, _parse_err)`` rows instead of
  failing the read (``ray.data.read_json`` aborts on the first bad
  byte — unusable for dirty logs).
- :func:`read_csv` — thin wrapper over ``ray.data.read_csv`` (Arrow
  CSV reader: vectorized, multi-threaded).
- :func:`read_text` — one event per line, Vector file-source shape
  (``message`` column).
- :func:`read_syslog` — ``read_text`` + vectorized RFC-3164/5424
  parse into columns via the stdlib ``parse_syslog``, with the same
  error lane.

All return lazy Datasets; nothing materializes on the driver.
"""

from __future__ import annotations

import pyarrow as pa


def read_text(paths) -> "object":
    """One row per line: column ``message`` (Vector file source)."""
    import ray.data as rd

    ds = rd.read_text(paths)
    return ds.map_batches(
        lambda b: b.rename_columns(["message"]),
        batch_format="pyarrow")


def read_csv(paths, **arrow_csv_kwargs):
    """Arrow CSV read (column-pruned / typed at the read when the
    caller passes convert/parse options)."""
    import ray.data as rd

    return rd.read_csv(paths, **arrow_csv_kwargs)


def _parse_json_lines(batch: pa.Table) -> pa.Table:
    """NDJSON parse with a per-line error lane (json.loads is a C
    loop per row; schema = union of keys per batch)."""
    import json

    lines = batch[batch.column_names[0]].to_pylist()
    rows, errs = [], []
    for ln in lines:
        try:
            v = json.loads(ln) if ln and ln.strip() else None
            if not isinstance(v, dict):
                raise ValueError("line is not a JSON object")
            rows.append(v)
            errs.append(None)
        except Exception as e:
            rows.append(None)
            errs.append(str(e))
    # union of keys across good rows (stable order of first appearance)
    keys: list[str] = []
    for r in rows:
        if r:
            for k in r:
                if k not in keys:
                    keys.append(k)
    cols: dict = {}
    for k in keys:
        vals = [r.get(k) if r else None for r in rows]
        # JSON containers stay JSON-encoded strings (stable schema)
        if any(isinstance(v, (dict, list)) for v in vals):
            vals = [json.dumps(v, separators=(",", ":"))
                    if isinstance(v, (dict, list)) else v for v in vals]
        cols[k] = pa.array(vals)
    cols["_raw"] = pa.array(
        [ln if r is None else None for ln, r in zip(lines, rows)],
        pa.string())
    cols["_parse_err"] = pa.array(errs, pa.string())
    return pa.table(cols)


def read_ndjson(paths):
    """Line-delimited JSON with per-line error lane. Schema = union of
    object keys per batch + ``_raw``/``_parse_err`` columns; bad lines
    keep their raw bytes and the error, good lines have them null."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(
        _parse_json_lines, batch_format="pyarrow")


class _SyslogParse:
    """Actor-pool stage: compiled syslog patterns once per actor."""

    FIELDS = ["appname", "facility", "hostname", "message", "msgid",
              "procid", "severity", "timestamp"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.parse import parse_syslog

        msgs = batch[batch.column_names[0]].to_pylist()
        cols: dict = {f: [] for f in self.FIELDS}
        errs = []
        for m in msgs:
            try:
                d = parse_syslog(m or "")
                err = None
            except Exception as e:
                d, err = {}, str(e)
            for f in self.FIELDS:
                v = d.get(f)
                cols[f].append(str(v) if v is not None and
                               not isinstance(v, str) else v)
            errs.append(err)
        out = {f: pa.array(cols[f], pa.string()) for f in self.FIELDS}
        out["_raw"] = pa.array(msgs, pa.string())
        out["_parse_err"] = pa.array(errs, pa.string())
        return pa.table(out)


def read_syslog(paths, *, concurrency=None):
    """Syslog file source: one parsed event per line, error lane for
    unparseable lines."""
    import ray.data as rd

    if concurrency is None:
        from ..stages.pool import fixed_pool

        concurrency = fixed_pool()
    return rd.read_text(paths).map_batches(
        _SyslogParse, batch_format="pyarrow", concurrency=concurrency)
