"""Tests for the persistent inverted index (datapipe.index): postings
build → bucket-pruned BM25 search must be BIT-identical to the rescan
path (search.bm25_topk), plus rebuild idempotence and degenerate
queries. The sf0.01 hash gate (search_bm25_index) covers corpus-scale
parity against the SQL oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(texts, ids=None):
    import ray.data as rd
    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sleeps",
    "the dog barks at the fox and the fox runs",
    "lorem ipsum dolor sit amet",
    "fox fox fox",
    "",
    "quick quick dog",
]


def test_index_search_matches_rescan_bitwise(tmp_path):
    from sagan_ray.datapipe import (bm25_topk, build_inverted_index,
                                    search_index)
    idx = str(tmp_path / "idx")
    n_docs, n_words = build_inverted_index(_ds(CORPUS), idx, n_buckets=4)
    assert n_docs == len(CORPUS)
    assert n_words == sum(len(t.split()) for t in CORPUS)
    for terms in (["fox"], ["quick", "dog"], ["the", "fox", "lorem"]):
        got = search_index(idx, terms, k=5)
        exp = bm25_topk(_ds(CORPUS), terms, k=5)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True),
            check_exact=True)   # bit-identical scores, not just close


def test_index_rebuild_overwrites(tmp_path):
    from sagan_ray.datapipe import build_inverted_index, search_index
    idx = str(tmp_path / "idx")
    build_inverted_index(_ds(["aaa bbb", "bbb ccc"]), idx, n_buckets=4)
    build_inverted_index(_ds(["zzz yyy"]), idx, n_buckets=4)
    assert search_index(idx, ["bbb"], k=5).empty      # old corpus gone
    out = search_index(idx, ["zzz"], k=5)
    assert out["doc_id"].tolist() == [0]


def test_index_missing_terms_and_empty_query(tmp_path):
    from sagan_ray.datapipe import build_inverted_index, search_index
    idx = str(tmp_path / "idx")
    build_inverted_index(_ds(CORPUS), idx, n_buckets=4)
    assert search_index(idx, ["notaword"], k=5).empty
    assert search_index(idx, [], k=5).empty


def test_index_postings_are_partitioned(tmp_path):
    import os
    from sagan_ray.datapipe import build_inverted_index
    from sagan_ray.datapipe.index import _term_hash
    idx = str(tmp_path / "idx")
    nb = 4
    build_inverted_index(_ds(CORPUS), idx, n_buckets=nb)
    import duckdb
    for b in range(nb):
        d = os.path.join(idx, f"bucket={b}")
        if not os.path.isdir(d):
            continue
        terms = [r[0] for r in duckdb.sql(
            f"SELECT DISTINCT term FROM '{d}/*.parquet'").fetchall()]
        h = _term_hash(terms) % np.uint64(nb)
        assert set(h.astype(int)) <= {b}   # every term in its hash bucket


def test_index_incremental_update_equals_full_rebuild(tmp_path):
    from sagan_ray.datapipe import (build_inverted_index, search_index,
                                    update_inverted_index)
    half = len(CORPUS) // 2
    inc = str(tmp_path / "inc")
    build_inverted_index(_ds(CORPUS[:half]), inc, n_buckets=4)
    n_docs, n_words = update_inverted_index(
        _ds(CORPUS[half:], ids=list(range(half, len(CORPUS)))), inc)
    assert n_docs == len(CORPUS)
    full = str(tmp_path / "full")
    build_inverted_index(_ds(CORPUS), full, n_buckets=4)
    for terms in (["fox"], ["quick", "dog"]):
        pd.testing.assert_frame_equal(
            search_index(inc, terms, k=5).reset_index(drop=True),
            search_index(full, terms, k=5).reset_index(drop=True),
            check_exact=True)


def test_search_index_many_matches_single_queries(tmp_path):
    from sagan_ray.datapipe import build_inverted_index, search_index
    from sagan_ray.datapipe.index import search_index_many
    idx = str(tmp_path / "idx")
    build_inverted_index(_ds(CORPUS), idx, n_buckets=4)
    queries = {0: ["fox"], 1: ["quick", "dog"], 2: ["notaword"],
               3: ["the", "fox", "lorem"]}
    many = search_index_many(idx, queries, k=5)
    for qi, terms in queries.items():
        got = (many[many["query_id"] == qi][["doc_id", "score"]]
               .reset_index(drop=True))
        exp = search_index(idx, terms, k=5).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_index_compact_preserves_search_and_collapses_files(tmp_path):
    """After build + update (two files per touched bucket), compaction
    collapses every bucket to one file, leaves meta untouched, and
    search stays BIT-identical; re-compacting is a no-op."""
    import json
    import os

    from sagan_ray.datapipe import (build_inverted_index, search_index,
                                    update_inverted_index)
    from sagan_ray.datapipe.index import compact_inverted_index

    half = len(CORPUS) // 2
    idx = str(tmp_path / "idx")
    build_inverted_index(_ds(CORPUS[:half]), idx, n_buckets=4)
    update_inverted_index(
        _ds(CORPUS[half:], ids=list(range(half, len(CORPUS)))), idx)
    meta_before = json.load(open(os.path.join(idx, "_meta.json")))
    before = {t: search_index(idx, [t], k=5) for t in ("fox", "quick")}

    assert compact_inverted_index(idx) > 0
    for ent in os.listdir(idx):
        if ent.startswith("bucket="):
            files = [f for f in os.listdir(os.path.join(idx, ent))
                     if f.endswith(".parquet")]
            assert len(files) == 1
    assert json.load(open(os.path.join(idx, "_meta.json"))) == meta_before
    for t, exp in before.items():
        pd.testing.assert_frame_equal(
            search_index(idx, [t], k=5).reset_index(drop=True),
            exp.reset_index(drop=True), check_exact=True)
    assert compact_inverted_index(idx) == 0
