"""Text-analysis stages for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are stateless-or-actor `map_batches` stages over the `documents`
table shape (doc_id, text, lang, source, n_chars). Heuristics are
deterministic and dependency-free (no model weights in this
container); the stage plumbing (schema, batching, actor lifecycle) is
the real, scale-tested part — swap the heuristic body for fasttext /
a tokenizer model in `__init__` on a real cluster.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD = re.compile(r"\w+", re.UNICODE)

# character n-gram profiles for a tiny language-ID heuristic:
# frequent trigrams per language (public-knowledge stopword/trigram sets)
_LANG_PROFILES = {
    "en": {"the", "and", "ing", "ion", "to ", "of ", " th", "er ", " a "},
    "es": {"de ", " de", "la ", "os ", "ión", "ar ", " la", "es ", "ción"},
    "de": {"ei ", "der", "die", "und", "sch", "ich", "en ", " de", "ung"},
    "fr": {"le ", " de", "es ", "ent", "la ", "et ", " le", "ion", "que"},
    "zh": set(),  # CJK detected by codepoint range below
}
_STOPWORDS = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by",
}


class LangId:
    """n-gram-overlap language classifier (actor pool: profile tables
    built once per actor)."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    @staticmethod
    def _cjk_ratio(s: str) -> float:
        if not s:
            return 0.0
        n = sum(1 for c in s if "一" <= c <= "鿿")
        return n / len(s)

    def classify(self, text: str) -> str:
        t = (text or "").lower()
        if self._cjk_ratio(t) > 0.2:
            return "zh"
        grams = {t[i:i + 3] for i in range(max(0, len(t) - 2))}
        best, best_score = "unknown", 0
        for lang, prof in self.profiles.items():
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0 else "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def token_stats_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Vectorized token/char counting: whitespace tokens via Arrow
    split, BPE-ish word-piece estimate via regex count.

    ``n_tokens`` = count of single-space-split pieces (== DuckDB
    ``len(string_split(text, ' '))`` for oracle parity);
    ``n_words`` = regex \\w+ tokens; ``n_chars`` = UTF-8 char count.
    """
    texts = batch[text_column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern(texts, " ")
    n_tokens = pc.list_value_length(split)
    n_chars = pc.utf8_length(texts)
    n_words = pc.count_substring_regex(texts, r"\w+")
    out = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
    out = out.append_column("n_words", pc.cast(n_words, pa.int64()))
    return out


def quality_score_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Quality-scoring heuristics (length / punctuation / stopword
    ratios — the standard pretraining-corpus filters). Emits component
    columns + a composite ``quality`` in [0,1]."""
    texts = batch[text_column].to_pylist()
    stop_ratio = np.zeros(len(texts))
    mean_word_len = np.zeros(len(texts))
    alpha_ratio = np.zeros(len(texts))
    for i, t in enumerate(texts):
        t = t or ""
        words = _WORD.findall(t.lower())
        if words:
            stop_ratio[i] = sum(w in _STOPWORDS for w in words) / len(words)
            mean_word_len[i] = sum(map(len, words)) / len(words)
        if t:
            alpha_ratio[i] = sum(c.isalpha() or c.isspace() for c in t) / len(t)
    n = np.array([len(t or "") for t in texts], dtype=np.float64)
    len_score = np.clip(np.log1p(n) / math.log(4096), 0, 1)
    quality = (
        0.35 * len_score
        + 0.25 * np.clip(stop_ratio * 4, 0, 1)
        + 0.2 * alpha_ratio
        + 0.2 * np.clip(mean_word_len / 8.0, 0, 1)
    )
    out = batch.append_column("stop_ratio", pa.array(stop_ratio))
    out = out.append_column("alpha_ratio", pa.array(alpha_ratio))
    out = out.append_column("mean_word_len", pa.array(mean_word_len))
    return out.append_column("quality", pa.array(quality))


def fingerprint_md5_batch(batch: pa.Table, text_column: str = "text",
                          window: int = 8) -> pa.Table:
    """Winnowing fingerprint variant with an ORACLE-CHECKABLE window
    hash: min over md5(hex) of each ``window``-token run (md5 exists
    in SQL engines, so the driver can verify it end-to-end — the
    rolling-polynomial variant above is the faster production path,
    this one is the verifiable twin). Empty docs → null."""
    fps: list = []
    for t in batch[text_column].to_pylist():
        toks = _WORD.findall((t or "").lower())
        if not toks:
            fps.append(None)
            continue
        if len(toks) <= window:
            fps.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            continue
        fps.append(min(
            hashlib.md5(" ".join(toks[i:i + window]).encode()).hexdigest()
            for i in range(len(toks) - window + 1)))
    return batch.append_column("fingerprint_md5", pa.array(fps, pa.string()))


def fingerprint_batch(batch: pa.Table, text_column: str = "text",
                      window: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint (winnowing-style): min of a
    rolling polynomial hash over token windows — robust to small
    edits; used for fast near-dup prefiltering."""
    import pandas as pd

    B, M = 1000003, (1 << 61) - 1
    texts = batch[text_column].to_pylist()
    token_lists = [_WORD.findall((t or "").lower()) for t in texts]
    # memoize the per-token digest across the batch (vocab ≪ stream);
    # blake2b, NOT builtin hash() — hash() is salted per process and
    # would break cross-worker determinism
    nonempty = [t for t in token_lists if t]
    if nonempty:
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in nonempty])
        codes, uniques = pd.factorize(flat)
        uniq_h = np.array([int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=4).digest(), "little")
            for w in uniques], dtype=np.int64)
        flat_h = uniq_h[codes]
        lens = np.fromiter((len(t) for t in nonempty), dtype=np.int64,
                           count=len(nonempty))
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        h_iter = iter(flat_h[offs[i]:offs[i + 1]].tolist()
                      for i in range(len(nonempty)))
    fps = []
    for toks in token_lists:
        if not toks:
            fps.append(0)
            continue
        hs = next(h_iter)
        if len(hs) < window:
            acc = 0
            for h in hs:
                acc = (acc * B + h) % M
            fps.append(acc)
            continue
        mins = None
        acc = 0
        power = pow(B, window - 1, M)
        for i, h in enumerate(hs):
            if i < window:
                acc = (acc * B + h) % M
                if i == window - 1:
                    mins = acc
            else:
                acc = ((acc - hs[i - window] * power) * B + h) % M
                if acc < mins:
                    mins = acc
        fps.append(mins)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))
