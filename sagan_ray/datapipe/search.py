"""Keyword search over a documents table: distributed BM25 top-k.

The classic sparse-retrieval scorer (Robertson/Spärck Jones BM25, the
Lucene `k1`/`b` form with the always-positive idf) expressed as two
shuffle-free Ray Data passes:

1. **Corpus statistics** — one partial row per 64k-row batch carrying
   (n_docs, n_words, per-term document frequencies); the driver sums
   the tiny partial table and derives `avgdl` and per-term idf. At
   100 TB this pass moves O(batches × n_terms) integers, nothing else.
2. **Score + local top-k** — the idf/avgdl constants ride the closure
   (broadcast once per task, not per batch); each batch scores its
   docs fully vectorized over the flat word array and emits only its
   local top-k rows, so the driver's final merge sees
   O(k × batches) (doc_id, score) pairs — the standard distributed
   top-k with no all-to-all exchange anywhere.

Determinism: scores are plain f64 arithmetic on integer tf/dl with a
fixed term order, but the SQL oracle's per-doc SUM adds term
contributions in scan order — docs with an identical (tf vector, dl)
are bit-equal here yet may differ by a ulp there, and such groups are
large, so the top-k boundary would be decided by DuckDB's arbitrary
intra-group order. Ranking therefore uses the score ROUNDED to 6
decimals with a doc_id tiebreak on BOTH sides: ulp noise collapses into
the same rounded key, and ties order deterministically. (np.round is
half-even, DuckDB round is half-away — they could disagree only if a
log-derived score hit an exact 5e-7 decimal midpoint; accepted.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import _words_flat

K1 = 1.2
B = 0.75


def bm25_topk(ds, terms: list[str], *, k: int = 50,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` documents by BM25 score for the (lowercased) query
    ``terms``. Returns a small pandas DataFrame (doc_id, score),
    ordered by (score desc, doc_id) — at most ``k`` rows, driver-side
    by construction (the distributed part only ever yields
    k rows per batch). Words are the ``[a-z0-9_]+`` runs the whole
    text family uses, so tf/df match the SQL oracles' tokenization."""
    terms = [t.lower() for t in terms]
    nt = len(terms)
    # match terms by the family's 64-bit word hash, not object-array
    # string compares (3 terms × 4 M words × 2 passes of PyUnicode eq
    # dominated the 100k-doc bench line; uint64 vector compares are
    # ~free). Shares the dedup family's documented collision stance.
    term_h = pd.util.hash_array(
        np.array(terms, dtype=object)).astype(np.uint64)

    def stats_partial(tbl: pa.Table) -> pa.Table:
        n_docs, doc_of, _, wh, _ = _words_flat(tbl.column(text_col))
        df = np.zeros(nt, np.int64)
        for i in range(nt):
            hit = doc_of[wh == term_h[i]]
            df[i] = len(np.unique(hit))
        return pa.table({
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_words": pa.array([len(doc_of)], pa.int64()),
            "df": pa.array([df.tolist()], pa.list_(pa.int64()))})

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    if parts.empty:        # empty input → no batches → column-less frame
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    n = int(parts["n_docs"].sum())
    total = int(parts["n_words"].sum())
    df = np.sum(np.vstack(parts["df"].to_numpy()), axis=0) \
        if len(parts) else np.zeros(nt, np.int64)
    if n == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = total / n
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))     # Lucene form, > 0

    def score_local(tbl: pa.Table) -> pa.Table:
        n_docs, doc_of, _, wh, _ = _words_flat(tbl.column(text_col))
        dl = np.bincount(doc_of, minlength=n_docs).astype(np.float64)
        norm = K1 * (1.0 - B + B * dl / avgdl)
        score = np.zeros(n_docs, np.float64)
        for i in range(nt):                              # fixed term order
            tf = np.bincount(doc_of[wh == term_h[i]],
                             minlength=n_docs).astype(np.float64)
            score = score + idf[i] * (tf * (K1 + 1.0)) / (tf + norm)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        score = np.round(score, 6)
        keep = np.nonzero(score > 0)[0]
        if len(keep) > k:
            o = np.lexsort((ids[keep], -score[keep]))[:k]
            keep = keep[o]
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         "score": pa.array(score[keep], pa.float64())})

    local = ds.map_batches(score_local, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    if local.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    out = (local.sort_values(["score", id_col], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return out[[id_col, "score"]]
