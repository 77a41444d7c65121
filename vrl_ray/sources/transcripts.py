"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2).

Schema (BASELINE.json input_hint):
    conv_id:string  turn_idx:int32  role:string  text:string
    tool:string     ts:timestamp[us]  (UTC, tz-naive in Arrow/DuckDB)

Properties:
- Fully deterministic: every conversation is generated from
  ``hash(seed, conv_index)`` so output is identical regardless of how
  conversations are partitioned across Ray tasks.
- Zipf-skewed conversation lengths (hot conv_ids) to exercise
  skew-aware aggregation.
- ``text`` follows the F2 grammar: ~40% grok-style log lines, ~30%
  logfmt/key-value, ~20% JSON fragments, ~9% free text, ~1% malformed
  (error-lane rows).
- ~2% of tool turns use an unknown tool (enrich-miss path).

At scale the generator runs as ``ray.data.range(n_convs) →
map_batches(gen)`` so synthesis itself is parallel and streaming; for
tests `transcript_table(...)` builds a small in-process pyarrow Table.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

BASE_EPOCH_US = int(datetime(2025, 6, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

TOOL_VOCAB = [
    "bash", "read", "write", "edit", "search", "grep", "glob",
    "fetch", "browser", "sql", "notebook", "task",
]
UNKNOWN_TOOLS = ["telnet", "gopher", "fax"]

_LEVELS = ["INFO", "DEBUG", "WARN", "ERROR", "TRACE"]
_WORDS = (
    "request completed batch flushed retry scheduled upstream timeout "
    "connection pool worker started stopped cache hit miss shard block "
    "compaction merge queue drained lease renewed snapshot applied"
).split()
_PATHS = ["/api/v1/items", "/health", "/metrics", "/login", "/search results", "/data x"]
_METHODS = ["GET", "POST", "PUT", "DELETE"]
_FREE = [
    "please summarize the previous discussion",
    "here is what I found so far",
    "let me think about this step by step",
    "that looks right to me, proceed",
    "can you check the other file as well",
]

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _conv_rng(seed: int, conv_index: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, conv_index]))


def _conv_len(rng: np.random.Generator, max_len: int) -> int:
    # zipf-skewed conversation sizes: most tiny, a few very hot
    return int(min(rng.zipf(1.3), max_len)) + 1


def _gen_text(rng: np.random.Generator, kind: int) -> str:
    if kind == 0:  # grok-style: <ISO8601> <LEVEL> <message>
        ts = BASE_EPOCH_US + int(rng.integers(0, 10**12))
        dt = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc)
        level = _LEVELS[int(rng.integers(0, len(_LEVELS)))]
        msg = " ".join(
            _WORDS[i] for i in rng.integers(0, len(_WORDS), int(rng.integers(3, 9)))
        )
        return f"{dt.strftime('%Y-%m-%dT%H:%M:%S')}.{ts % 10**6:06d}Z {level} {msg}"
    if kind == 1:  # logfmt / key-value
        dur = round(float(rng.uniform(0.1, 9.9)), 2)
        status = [200, 200, 200, 404, 500, 503][int(rng.integers(0, 6))]
        path = _PATHS[int(rng.integers(0, len(_PATHS)))]
        method = _METHODS[int(rng.integers(0, len(_METHODS)))]
        q = '"' if " " in path else ""
        extra = " cache=hit" if rng.random() < 0.3 else ""
        return f"duration={dur} status={status} path={q}{path}{q} method={method}{extra}"
    if kind == 2:  # JSON fragment
        status = [200, 201, 400, 500][int(rng.integers(0, 4))]
        dur = round(float(rng.uniform(0.1, 9.9)), 3)
        return (
            '{"status": %d, "duration": %s, "path": "%s"}'
            % (status, dur, _PATHS[int(rng.integers(0, len(_PATHS)))].split(" ")[0])
        )
    if kind == 3:  # free text
        return _FREE[int(rng.integers(0, len(_FREE)))]
    # malformed (kind 4): truncated JSON — must land in the error lane
    return '{"status": 200, "duration":'


# text format mix (FIXTURES.md F2)
_KIND_P = np.array([0.40, 0.30, 0.20, 0.09, 0.01])


def generate_conversation(seed: int, conv_index: int, max_len: int = 2000) -> dict:
    """All rows of one conversation as a dict of lists (deterministic
    in (seed, conv_index) alone)."""
    rng = _conv_rng(seed, conv_index)
    n = _conv_len(rng, max_len)
    conv_id = f"conv-{conv_index:08d}"
    kinds = rng.choice(5, size=n, p=_KIND_P)
    roles: list[str] = []
    tools: list[str] = []
    for i in range(n):
        r = rng.random()
        if r < 0.42:
            role = "user" if i % 2 == 0 else "assistant"
        elif r < 0.84:
            role = "assistant" if i % 2 == 0 else "user"
        elif r < 0.92:
            role = "system"
        else:
            role = "tool"
        roles.append(role)
        if role == "tool":
            if rng.random() < 0.02:
                tools.append(UNKNOWN_TOOLS[int(rng.integers(0, len(UNKNOWN_TOOLS)))])
            else:
                tools.append(TOOL_VOCAB[int(rng.integers(0, len(TOOL_VOCAB)))])
        else:
            tools.append("")
    texts = [_gen_text(rng, int(k)) for k in kinds]
    start = BASE_EPOCH_US + int(rng.integers(0, 10**12))
    increments = rng.integers(1_000_000, 120_000_000, size=n)  # 1s..2min
    ts = start + np.cumsum(increments)
    return {
        "conv_id": [conv_id] * n,
        "turn_idx": list(range(n)),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts.tolist(),
    }


def _convs_to_table(seed: int, conv_indices) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for ci in conv_indices:
        c = generate_conversation(seed, int(ci))
        for k in cols:
            cols[k].extend(c[k])
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def transcript_table(n_convs: int, seed: int = 42) -> pa.Table:
    """Small in-process table for unit tests."""
    return _convs_to_table(seed, range(n_convs))


def transcript_dataset(n_convs: int, seed: int = 42, *, override_num_blocks=None):
    """Streaming Ray Dataset of synthetic transcripts — generation
    itself is a parallel map_batches over conversation indices."""
    import ray.data as rd

    ds = rd.range(n_convs, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return _convs_to_table(seed, batch["id"].to_pylist())

    return ds.map_batches(gen, batch_format="pyarrow")


def ensure_transcripts_parquet(
    out_dir: str, n_convs: int, seed: int = 42, *, num_shards: int = 32
) -> str:
    """Materialize the synthetic table once as partitioned Parquet
    (cached — skipped when the directory is already complete). This is
    the bench input so generation cost never pollutes measurements."""
    import ray.data as rd

    marker = os.path.join(out_dir, "_COMPLETE")
    stamp = f"n_convs={n_convs} seed={seed}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return out_dir
        # same dir, different params (e.g. the fixed oracle-input dir
        # across sf changes): wipe and regenerate
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds = transcript_dataset(n_convs, seed, override_num_blocks=num_shards)
    ds.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir
