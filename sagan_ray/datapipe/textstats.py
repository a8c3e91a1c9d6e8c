"""Text analysis operators over a documents table.

- token_counts: whitespace tokens + a BPE-ish subword estimate.
- quality: length / punctuation / stopword / repetition signals and a
  composite score.
- langid: character/stopword n-gram heuristic over a small built-in
  profile set (no external models).
- fingerprint: md5 of punctuation/case-normalized text (deterministic,
  SQL-replicable) plus a 64-bit rolling hash.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
}


def token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_tokens, n_subwords): whitespace tokens and a BPE-ish count
    (word + punctuation pieces) — all vectorized via Arrow splits."""

    def f(tbl: pa.Table) -> pa.Table:
        text = tbl.column(text_col)
        toks = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+"))
        # trim→split yields [''] for empty strings; count those as 0
        empty = pc.equal(pc.utf8_trim_whitespace(text), "")
        toks = pc.if_else(empty, pa.scalar(0, pa.int32()),
                          pc.cast(toks, pa.int32()))
        # RE2 \w/\s are the ASCII classes the DuckDB oracle spells out —
        # one vectorized count pass, no per-row findall
        sub = pc.count_substring_regex(text, r"\w+|[^\w\s]")
        return pa.table({id_col: tbl.column(id_col),
                         "n_tokens": pc.cast(toks, pa.int64()),
                         "n_subwords": pc.cast(sub, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def quality(ds, text_col: str = "text", id_col: str = "doc_id",
            lang: str = "en"):
    """Quality signals + composite score in [0,1]."""
    stop = STOPWORDS.get(lang, STOPWORDS["en"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col]
        n_chars = texts.str.len().astype("int64")
        words = texts.str.lower().str.findall(r"\w+")
        n_words = words.map(len).astype("int64")
        avg_word_len = (words.map(lambda ws: float(np.mean([len(w) for w in ws]))
                                  if ws else 0.0))
        n_punct = texts.str.count(r"[^\w\s]").astype("int64")
        punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
        stop_ratio = words.map(
            lambda ws: sum(w in stop for w in ws) / max(1, len(ws)))
        uniq_ratio = words.map(lambda ws: len(set(ws)) / max(1, len(ws)))
        score = (
            0.25 * (n_words.clip(upper=200) / 200)
            + 0.25 * (1 - (punct_ratio.clip(upper=0.5) / 0.5))
            + 0.25 * uniq_ratio
            + 0.25 * (avg_word_len.clip(upper=10) / 10)
        )
        return pd.DataFrame({
            id_col: df[id_col],
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len": avg_word_len.astype("float64"),
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio.astype("float64"),
            "uniq_ratio": uniq_ratio.astype("float64"),
            "quality": score.astype("float64"),
        })

    return ds.map_batches(f, batch_format="pandas")


def langid(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Stopword-profile language guess with confidence (heuristic — the
    LangId actor-pool pattern from ray_guide; profiles compiled once per
    actor in __init__)."""

    class LangId:
        def __init__(self):
            self.word = re.compile(r"\w+", re.UNICODE)
            self.profiles = {k: frozenset(v) for k, v in STOPWORDS.items()}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            words = df[text_col].str.lower().str.findall(self.word)

            def guess(ws):
                if not ws:
                    return "und", 0.0
                best, score = "und", 0.0
                for lang, prof in self.profiles.items():
                    s = sum(w in prof for w in ws) / len(ws)
                    if s > score:
                        best, score = lang, s
                # CJK heuristic: any han/kana chars dominate
                return best, float(score)

            out = words.map(guess)
            return pd.DataFrame({
                id_col: df[id_col],
                "lang_pred": out.map(lambda x: x[0]),
                "lang_conf": out.map(lambda x: x[1]),
            })

    return ds.map_batches(LangId, batch_format="pandas", concurrency=2)


def _norm_text(t: str) -> str:
    return _WS.sub(" ", _PUNCT.sub("", t.lower())).strip()


_POLY_P = np.uint64(1099511628211)
_POLY_SEED = np.uint64(1469598103934665603)
_POW_MAX = 1 << 16          # cache cap: ~512 KB per worker, never more
_POW_CACHE = np.array([1], dtype=np.uint64)


def _poly_powers(k: int) -> np.ndarray:
    """p^0..p^(k-1) mod 2^64 (uint64 wraparound), grown on demand up to
    the fixed cap (a single huge document must not pin a proportional
    power table in every worker)."""
    global _POW_CACHE
    assert k <= _POW_MAX
    if len(_POW_CACHE) < k:
        n0 = len(_POW_CACHE)
        ext = np.empty(k, np.uint64)
        ext[:n0] = _POW_CACHE
        ext[n0:] = _POW_CACHE[-1] * np.cumprod(
            np.full(k - n0, _POLY_P, np.uint64))
        _POW_CACHE = ext
    return _POW_CACHE[:k]


def _poly_hash(data: bytes) -> int:
    """64-bit polynomial hash h = seed·pᵏ + Σ bᵢ·p^(k-1-i) (mod 2^64) —
    a vectorized dot product over the byte array, chunked so the power
    table stays bounded: h ← h·p^m + Σ chunk·p^(m-1-j) per chunk is the
    same fold."""
    arr = np.frombuffer(data, np.uint8).astype(np.uint64)
    k = len(arr)
    if k == 0:
        return int(_POLY_SEED)
    h = _POLY_SEED
    step = _POW_MAX - 1
    with np.errstate(over="ignore"):    # 2^64 wraparound is the modulus
        for i in range(0, k, step):
            chunk = arr[i:i + step]
            m = len(chunk)
            pw = _poly_powers(m + 1)
            h = h * pw[m] + np.dot(chunk, pw[m - 1::-1])
    return int(np.uint64(h))


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, fp_md5, fp_rolling): md5 of normalized text (replicable in SQL
    as md5(lower + strip punct + squash ws)) and a 64-bit polynomial
    hash of the normalized bytes (vectorized numpy dot per doc)."""

    def f(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        fps, rolls = [], []
        for t in texts:
            b = _norm_text(t).encode("utf-8", "surrogatepass")
            fps.append(hashlib.md5(b).hexdigest())
            rolls.append(_poly_hash(b))
        return pa.table({id_col: tbl.column(id_col),
                         "fp_md5": pa.array(fps, pa.string()),
                         "fp_rolling": pa.array(rolls, pa.uint64())})

    return ds.map_batches(f, batch_format="pyarrow")
