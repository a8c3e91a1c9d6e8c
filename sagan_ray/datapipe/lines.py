"""Line-level document cleaning — the C4 paragraph filters (Raffel et
al. 2020 §2.2): keep only lines that look like prose (≥ 3 words,
terminal punctuation, not shouting all-caps), drop the rest, and emit
per-document keep counts plus the cleaned text. Beyond the reference's
scope; verified against a REAL SQL oracle (DuckDB string_split + the
same RE2 predicates per line + ordered string_agg).

Kernel shape: one Arrow split per batch; every per-line predicate runs
vectorized over the FLAT line values (count_substring_regex /
match_substring_regex — RE2 on both sides); kept lines reassemble into
per-row lists via offset arithmetic and ONE ``binary_join`` call.
``binary_join`` has no large-list kernel in pyarrow 16 (CLAUDE.md), so
the operator pins ``batch_size`` and uses 32-bit list offsets.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# the three line predicates — each string is an RE2 shared verbatim
# with the SQL oracle
MIN_WORDS = 3
_WORD_RUN = r"\S+"
_ENDS_PUNCT = r"[.!?\"]$"
_HAS_LETTER = r"[A-Za-z]"


def line_filter(ds, *, text_col: str = "text", id_col: str = "doc_id",
                batch_size: int = 4096):
    """(id, n_lines, n_kept, text_clean) per document: a line survives
    iff it has ≥ 3 whitespace-separated words AND ends in . ! ? or a
    double quote AND is not all-caps shouting (equal to its own
    uppercasing while containing a letter). ``text_clean`` re-joins
    the survivors with newlines in original order."""

    def f(tbl: pa.Table) -> pa.Table:
        text = pc.cast(tbl.column(text_col), pa.string())
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.values
        offs = np.asarray(lines.offsets, dtype=np.int64)
        n_words = pc.count_substring_regex(flat, _WORD_RUN).to_numpy(
            zero_copy_only=False)
        ends = pc.match_substring_regex(flat, _ENDS_PUNCT).to_numpy(
            zero_copy_only=False)
        upper = pc.equal(flat, pc.utf8_upper(flat)).to_numpy(
            zero_copy_only=False)
        letter = pc.match_substring_regex(flat, _HAS_LETTER).to_numpy(
            zero_copy_only=False)
        keep = (n_words >= MIN_WORDS) & ends & ~(upper & letter)

        n_lines = (offs[1:] - offs[:-1]).astype(np.int64)
        kcum = np.concatenate([[0], np.cumsum(keep)]).astype(np.int64)
        n_kept = kcum[offs[1:]] - kcum[offs[:-1]]
        kept_vals = flat.filter(pa.array(keep))
        kept_offs = kcum[offs].astype(np.int32)       # 32-bit offsets
        kept_list = pa.ListArray.from_arrays(
            pa.array(kept_offs, pa.int32()), kept_vals)
        clean = pc.binary_join(kept_list, "\n")
        return pa.table({id_col: tbl.column(id_col),
                         "n_lines": pa.array(n_lines, pa.int64()),
                         "n_kept": pa.array(n_kept, pa.int64()),
                         "text_clean": clean})

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=batch_size)


def synth_multiline_docs(n: int, seed: int = 31) -> pa.Table:
    """Deterministic multiline corpus exercising every predicate arm:
    prose lines (kept), short fragments, unterminated lines, ALL-CAPS
    shouts, punctuation-only lines, and empty lines."""
    rng = np.random.default_rng(seed)
    words = ["data", "scan", "batch", "query", "merge", "stream",
             "filter", "table"]
    docs = []
    for i in range(n):
        lines = []
        for _ in range(int(rng.integers(1, 9))):
            kind = int(rng.integers(0, 6))
            body = " ".join(words[int(rng.integers(0, len(words)))]
                            for _ in range(int(rng.integers(1, 7))))
            if kind == 0:
                lines.append(body + ".")              # prose
            elif kind == 1:
                lines.append(body)                    # unterminated
            elif kind == 2:
                lines.append(body.upper() + "!")      # shouting
            elif kind == 3:
                lines.append("ok.")                   # too short
            elif kind == 4:
                lines.append("...")                   # no letters
            else:
                lines.append("")                      # empty
        docs.append("\n".join(lines))
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(docs, pa.string())})


def rouge_recall(ds, *, ref_col: str, cand_col: str,
                 id_col: str = "doc_id", n_gram: int = 1):
    """ROUGE-N recall per row — Σ_g min(count_cand(g), count_ref(g)) /
    Σ_g count_ref(g) over lowercased whitespace-token ``n_gram``-grams
    (clipped overlap, Lin 2004): the summary/retention eval a pipeline
    runs on its own cleaning and summarization outputs. Emits
    (id, overlap, ref_total, rouge1); rouge1 is one int/int IEEE
    division (0.0 for a gram-less reference), so a SQL oracle replays
    it exactly (n-grams via the dedup shingle CTE style). Per batch:
    ONE split per column, a combined factorize, and bincounts over
    (row, gram) codes — no per-row Python."""
    assert n_gram >= 1

    def f(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows

        def row_word_counts(col):
            la = pc.split_pattern_regex(
                pc.utf8_lower(pc.cast(tbl.column(col), pa.string())),
                r"\s+")
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            flat = la.values
            offs = np.asarray(la.offsets, dtype=np.int64)
            words = flat.to_numpy(zero_copy_only=False)
            rows = np.repeat(np.arange(n), offs[1:] - offs[:-1])
            keep = np.fromiter((len(w) > 0 for w in words), bool,
                               count=len(words))
            rows, words = rows[keep], words[keep]
            if n_gram == 1:
                return rows, words
            # n-grams: join adjacent same-row words with chr(1) (the
            # dedup shingle separator, shared with the SQL)
            m = len(words) - n_gram + 1
            if m <= 0:
                return (np.empty(0, np.int64),
                        np.empty(0, dtype=object))
            same = np.ones(m, dtype=bool)
            for j in range(1, n_gram):
                same &= rows[j:j + m] == rows[:m]
            grams = np.array(
                ["\x01".join(words[i:i + n_gram])
                 for i in np.flatnonzero(same)], dtype=object)
            return rows[:m][same], grams

        r_rows, r_words = row_word_counts(ref_col)
        c_rows, c_words = row_word_counts(cand_col)
        vocab, codes = np.unique(np.concatenate([r_words, c_words]),
                                 return_inverse=True)
        rc = codes[:len(r_words)]
        cc = codes[len(r_words):]
        v = len(vocab)
        # (row, word) count maps via bincount over combined keys
        rk = r_rows * v + rc
        ck = c_rows * v + cc
        ru, rcnt = np.unique(rk, return_counts=True)
        cu, ccnt = np.unique(ck, return_counts=True)
        # align: for each ref key, the cand count (0 if absent)
        pos = np.searchsorted(cu, ru)
        pos[pos >= len(cu)] = 0
        cand_at = np.where(len(cu) and cu[pos] == ru, ccnt[pos], 0) \
            if len(cu) else np.zeros(len(ru), np.int64)
        clipped = np.minimum(rcnt, cand_at)
        overlap = np.bincount(ru // v, weights=clipped,
                              minlength=n).astype(np.int64)
        ref_total = np.bincount(r_rows, minlength=n).astype(np.int64)
        rouge = np.where(ref_total > 0,
                         overlap / np.maximum(ref_total, 1), 0.0)
        return pa.table({id_col: tbl.column(id_col),
                         "overlap": pa.array(overlap, pa.int64()),
                         "ref_total": pa.array(ref_total, pa.int64()),
                         "rouge1": pa.array(rouge, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")


def rouge1_recall(ds, *, ref_col: str, cand_col: str,
                  id_col: str = "doc_id"):
    """Unigram special case of ``rouge_recall``."""
    return rouge_recall(ds, ref_col=ref_col, cand_col=cand_col,
                        id_col=id_col, n_gram=1)


def rouge_l_recall(ds, *, ref_col: str, cand_col: str,
                   id_col: str = "doc_id"):
    """ROUGE-L recall per row — LCS(ref, cand) / |ref| over lowercased
    whitespace tokens (longest common subsequence, Lin 2004): rewards
    in-order coverage where ROUGE-N rewards bag overlap. Emits
    (id, lcs, ref_total, rouge_l); all integers plus one int/int
    division. Per row a rolling two-row DP (len(ref) passes of
    numpy-free cell updates) — fine for the summary-sized texts this
    metric exists for; a corpus-scale variant would want the
    bit-parallel LCS. The golden oracle recomputes with the classic
    full 2-D table (different mechanics, same spec)."""

    def lcs(a: list, b: list) -> int:
        if not a or not b:
            return 0
        prev = [0] * (len(b) + 1)
        for x in a:
            curr = [0] * (len(b) + 1)
            for j, y in enumerate(b, 1):
                curr[j] = prev[j - 1] + 1 if y == x else \
                    max(prev[j], curr[j - 1])
            prev = curr
        return prev[-1]

    def f(tbl: pa.Table) -> pa.Table:
        ref = pc.utf8_lower(pc.cast(tbl.column(ref_col),
                                    pa.string())).to_pylist()
        cand = pc.utf8_lower(pc.cast(tbl.column(cand_col),
                                     pa.string())).to_pylist()
        out_l, out_t = [], []
        for r, c in zip(ref, cand):
            ra = (r or "").split()
            ca = (c or "").split()
            out_l.append(lcs(ra, ca))
            out_t.append(len(ra))
        lv = np.asarray(out_l, np.int64)
        tv = np.asarray(out_t, np.int64)
        rl = np.where(tv > 0, lv / np.maximum(tv, 1), 0.0)
        return pa.table({id_col: tbl.column(id_col),
                         "lcs": pa.array(lv, pa.int64()),
                         "ref_total": pa.array(tv, pa.int64()),
                         "rouge_l": pa.array(rl, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")
