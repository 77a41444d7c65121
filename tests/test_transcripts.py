"""Synthetic transcript generator: determinism + schema + grammar mix."""

import pyarrow as pa

from vrl_ray.sources.transcripts import (
    transcript_table, generate_conversation, SCHEMA,
)


def test_deterministic():
    a = transcript_table(20, seed=42)
    b = transcript_table(20, seed=42)
    assert a.equals(b)


def test_partitioning_invariant():
    """Conversation content depends only on (seed, conv_index) — not
    on which task generated it."""
    c5 = generate_conversation(42, 5)
    t = transcript_table(10, seed=42)
    sub = t.filter(pa.compute.equal(t["conv_id"], "conv-00000005")).to_pydict()
    assert sub["text"] == c5["text"]
    assert sub["role"] == c5["role"]


def test_schema():
    t = transcript_table(5)
    assert t.schema.equals(SCHEMA)


def test_turn_idx_dense_and_ts_monotone():
    t = transcript_table(10).to_pydict()
    by_conv = {}
    for cid, idx, ts in zip(t["conv_id"], t["turn_idx"], t["ts"]):
        by_conv.setdefault(cid, []).append((idx, ts))
    for rows in by_conv.values():
        idxs = [i for i, _ in rows]
        assert idxs == list(range(len(rows)))
        tss = [s for _, s in rows]
        assert tss == sorted(tss)


def test_grammar_mix():
    t = transcript_table(100, seed=1)
    texts = t["text"].to_pylist()
    n = len(texts)
    json_frac = sum(s.startswith("{") for s in texts) / n
    grok_frac = sum(s[:4].isdigit() and "-" in s[:8] for s in texts) / n
    kv_frac = sum(s.startswith("duration=") for s in texts) / n
    assert 0.1 < json_frac < 0.3
    assert 0.3 < grok_frac < 0.5
    assert 0.2 < kv_frac < 0.4
