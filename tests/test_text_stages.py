"""Unit tests for text-analysis stages (stages/text.py): fingerprint
variants, quality composite, language ID — the non-SQL parts the
driver oracle can't cover."""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


class TestFingerprints:
    TEXTS = ["the quick brown fox jumps over the lazy dog again today",
             "short one", "", "a b c d e f g h i j k l m n o p"]

    def test_rolling_poly_deterministic_and_edit_robust(self):
        from vrl_ray.stages.text import fingerprint_batch

        a = fingerprint_batch(_batch(self.TEXTS))["fingerprint"].to_pylist()
        b = fingerprint_batch(_batch(self.TEXTS))["fingerprint"].to_pylist()
        assert a == b
        # a small edit far from the min window usually keeps the min
        edited = self.TEXTS[3].replace("p", "q")
        c = fingerprint_batch(_batch([self.TEXTS[3], edited]))
        vals = c["fingerprint"].to_pylist()
        assert vals[0] != 0 and vals[1] != 0

    def test_md5_variant_matches_direct_computation(self):
        from vrl_ray.stages.text import fingerprint_md5_batch

        out = fingerprint_md5_batch(_batch(self.TEXTS))["fingerprint_md5"] \
            .to_pylist()
        toks = self.TEXTS[0].lower().split()
        want = min(hashlib.md5(" ".join(toks[i:i + 8]).encode()).hexdigest()
                   for i in range(len(toks) - 7))
        assert out[0] == want
        assert out[1] == hashlib.md5(b"short one").hexdigest()
        assert out[2] is None

    def test_quality_composite_bounds(self):
        from vrl_ray.stages.text import quality_score_batch

        out = quality_score_batch(_batch(self.TEXTS))
        q = out["quality"].to_pylist()
        assert all(0.0 <= v <= 1.0 for v in q)
        # a real sentence beats the empty doc
        assert q[0] > q[2]

    def test_langid_basics(self):
        from vrl_ray.stages.text import LangId

        lid = LangId()
        assert lid.classify("the cat and the dog are playing") == "en"
        assert lid.classify("这是一个中文测试文本这是一个中文测试文本") == "zh"
        assert lid.classify("") == "unknown"
