"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
MOSS algorithm) + shared-fingerprint pair detection.

Per document: hash every word-``k``-gram of the normalized text
(lowercased, non-word runs collapsed to single spaces — the
``text_fingerprint`` normalization), slide a window of ``w``
consecutive gram hashes, and select each window's minimum (LEFTMOST
position on ties). The distinct selected hashes are the document's
fingerprints — a position-robust ~2/(w+1) subsample of its grams that
two documents sharing a long-enough passage are guaranteed to overlap
on. Pairs sharing ≥ ``min_shared`` fingerprints (after dropping
ubiquitous fingerprints appearing in > ``max_df`` docs — the
stop-gram analog, and the in-bucket pair-explosion cap) are the
plagiarism/copy candidates.

SQL-verifiable hash: gram hash = Horner over the gram string's
character codes, ``h = fold(h·31 + code) mod 2147483629`` — the
DuckDB oracle computes the identical value per gram with
``list_reduce``/``list_transform``/``unicode``; normalized text is
``[a-z0-9_ ]`` only, so byte values equal codepoints.

Vectorized Ray side: the per-batch normalized docs live back-to-back
in one Arrow string buffer; a Hillis-Steele log-pass scan (~27 int64
multiply-add-mod passes) turns it into inclusive prefix hashes, and
every gram hash is then one O(1) range-hash gather
``(pre[b] - pre[a]·31^(b-a)) mod p`` — no per-gram loop, no per-byte
loop. Window minima select via a strided sliding view + argmin.
All mulmods stay < 2^62 because p < 2^31 (exact in int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_P = 2147483629          # largest prime < 2^31: mulmod fits int64
_X = 31


def _prefix_hash(codes: np.ndarray) -> np.ndarray:
    """Inclusive Horner prefix hashes mod _P via a Hillis-Steele scan:
    out[i] = hash of codes[0..i]. After the pass with shift s, h[i]
    covers min(i+1, 2s) trailing codes; for i ≥ s the right operand
    covers exactly s codes, so the pass multiplier is the fixed
    31^s mod p — log2(n) vectorized passes total."""
    h = codes.astype(np.int64) % _P
    n = len(h)
    pw = _X % _P
    s = 1
    while s < n:
        h[s:] = (h[:-s] * pw + h[s:]) % _P
        pw = (pw * pw) % _P
        s <<= 1
    return h


def _pow_table(max_len: int) -> np.ndarray:
    t = np.empty(max_len + 1, np.int64)
    t[0] = 1
    for i in range(1, max_len + 1):
        t[i] = (t[i - 1] * _X) % _P
    return t


def _range_hash(pre: np.ndarray, a: np.ndarray, b: np.ndarray,
                pows: np.ndarray) -> np.ndarray:
    """Hash of codes[a:b) from inclusive prefixes: equals the Horner
    fold over exactly those codes."""
    hb = pre[b - 1]
    ha = np.where(a > 0, pre[np.maximum(a - 1, 0)], 0)
    return (hb - ha * pows[b - a]) % _P


def _doc_fingerprints(tbl: pa.Table, *, k: int, w: int,
                      text_col: str, id_col: str) -> pa.Table:
    """One (h, doc) row per DISTINCT selected fingerprint per doc."""
    out_schema = pa.schema([("h", pa.int64()), ("doc", pa.int64())])
    col = pc.utf8_lower(tbl.column(text_col).cast(pa.large_string()))
    norm = pc.utf8_trim(
        pc.replace_substring_regex(col, "[^a-z0-9_]+", " "), " ")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    # back-to-back doc chars straight from the Arrow buffer (ASCII by
    # construction, so byte == codepoint)
    voffs = np.frombuffer(norm.buffers()[1], np.int64,
                          count=len(norm) + 1)
    flat = np.frombuffer(norm.buffers()[2], np.uint8)[
        voffs[0]:voffs[-1]]
    doc_start = (voffs - voffs[0]).astype(np.int64)
    if not len(flat):
        return out_schema.empty_table()

    words = pc.split_pattern(norm, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = np.asarray(words.offsets, np.int64)
    wlen = pc.utf8_length(words.values).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_words_doc = np.diff(woffs)
    doc_of = np.repeat(np.arange(len(norm)), n_words_doc)
    # empty docs split to one zero-length token: they have no grams
    # anyway because n_words_doc==1 < k, so no special-casing needed
    # beyond wlen==0 never entering a gram (guarded by the k filter).

    # char offset of each word within its doc: segmented cumsum of
    # (wlen + 1), reset at doc starts
    step = wlen + 1
    gcs = np.concatenate([[0], np.cumsum(step)[:-1]])
    first_word = woffs[:-1] - woffs[0]
    within = gcs - gcs[np.minimum(first_word, len(gcs) - 1)][doc_of]

    # gram index space: word positions i with i..i+k-1 in the same doc
    total_w = len(wlen)
    if total_w < k:
        return out_schema.empty_table()
    same = doc_of[: total_w - k + 1] == doc_of[k - 1:]
    gi = np.nonzero(same)[0]
    if not len(gi):
        return out_schema.empty_table()
    a = doc_start[doc_of[gi]] + within[gi]
    b = doc_start[doc_of[gi]] + within[gi + k - 1] + wlen[gi + k - 1]

    pre = _prefix_hash(flat)
    pows = _pow_table(int((b - a).max()))
    gh = _range_hash(pre, a, b, pows)
    gdoc = doc_of[gi]

    # window-min selection (leftmost tie) within each doc
    if len(gh) < w:
        return out_schema.empty_table()
    sw = np.lib.stride_tricks.sliding_window_view(gh, w)
    am = np.argmin(sw, axis=1)
    sstart = np.arange(len(gh) - w + 1)
    valid = gdoc[sstart] == gdoc[sstart + w - 1]
    if not valid.any():
        return out_schema.empty_table()
    sel = sstart[valid] + am[valid]
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    dd = ids[gdoc[sel]]
    uniq = pd.DataFrame({"h": gh[sel], "doc": dd}).drop_duplicates()
    return pa.Table.from_pandas(uniq, schema=out_schema,
                                preserve_index=False
                                ).replace_schema_metadata(None)


def winnow_pairs(ds, *, k: int = 5, w: int = 4, max_df: int = 10,
                 min_shared: int = 2, text_col: str = "text",
                 id_col: str = "doc_id"):
    """(a, b, n_shared) for unordered doc pairs sharing ≥ ``min_shared``
    winnowed fingerprints, fingerprints in > ``max_df`` docs dropped.

    Distributed shape: per-batch fingerprint extraction (all
    vectorized, see module docstring) → fp-keyed exchange where the
    ubiquity filter bounds every candidate bucket at max_df·(max_df-1)/2
    pairs (the skew guard IS part of the operator's semantics here, so
    the SQL oracle mirrors it exactly with HAVING count ≤ max_df) →
    pair-keyed exchange sums and thresholds."""
    from .dedup import _group_pairs_idx
    from .exchange import hash_group_apply

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("n_shared", pa.int64())])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc"], kind="stable")
        h = df["h"].to_numpy(np.int64)
        doc = df["doc"].to_numpy(np.int64)
        new = np.empty(len(h), dtype=bool)
        if len(h):
            new[0] = True
            new[1:] = h[1:] != h[:-1]
        run = np.cumsum(new) - 1
        counts = np.bincount(run)
        ai, bi = _group_pairs_idx(counts, keep=counts <= max_df)
        if not len(ai):
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "n_shared": pd.Series([], dtype="int64")})
        lo = np.minimum(doc[ai], doc[bi])
        hi = np.maximum(doc[ai], doc[bi])
        g = (pd.DataFrame({"a": lo, "b": hi})
             .groupby(["a", "b"], sort=False).size()
             .reset_index(name="n_shared"))
        return g

    parts = hash_group_apply(
        ds.map_batches(
            lambda t: _doc_fingerprints(t, k=k, w=w, text_col=text_col,
                                        id_col=id_col),
            batch_format="pyarrow", batch_size=65536),
        ["h"], bucket, out_schema=pair_schema)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["a", "b"], sort=False)["n_shared"].sum()
             .reset_index())
        return g[g["n_shared"] >= min_shared]

    return hash_group_apply(parts, ["a", "b"], fold,
                            out_schema=pair_schema)
