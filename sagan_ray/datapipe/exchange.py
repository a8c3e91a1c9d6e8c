"""Reusable bucketed hash exchange — the custom wide-operator primitive.

``hash_group_apply(ds, key_cols, bucket_fn)`` hash-partitions a Dataset's
rows by key into N buckets (all rows of a key land in exactly one bucket)
and runs ``bucket_fn`` once per bucket over the concatenated slice.

Why not ``ds.groupby(...).map_groups``: measured on this workload family,
Ray Data's sort-based groupby costs 10-70 s where the grouped work itself
is <1 s (see CLAUDE.md perf notes); this exchange is two stages of plain
Ray tasks with streaming map-side submission, so it overlaps whatever
produced ``ds``. Used by the correlation stage (specialised version in
pipelines.engine), client_stats, and the dedup operators.

Contract for ``bucket_fn(df: pandas.DataFrame) -> pandas.DataFrame``:
receives every row of its bucket (all rows sharing a key together,
unsorted); must handle the empty frame; does its own within-bucket
grouping (vectorized — sort + boundaries — not pandas groupby.apply).

Scale behavior: map-side split tasks report per-bucket byte sizes (tiny
arrays); before launching a reduce the driver re-splits any bucket whose
total exceeds ``max_bucket_bytes`` by a FINER key hash into k sub-tasks
(the salting path — keys stay whole, so the bucket_fn contract holds).
Reduce-task memory is therefore bounded by max_bucket_bytes regardless of
input size or key skew; only a single key whose rows alone exceed the
bound still lands in one sub-task (inherent to key locality — SURVEY §4
hard part #4).

Driver memory: per-bucket part lists COALESCE once they exceed
``COALESCE_PARTS`` refs (a remote concat collapses them to one), so the
driver holds O(n_buckets × COALESCE_PARTS) object refs rather than
O(blocks × n_buckets) — flat RSS on many-thousand-block inputs
(tools/stress_exchange.py; numbers in BASELINE.md)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_MAX_BUCKET_BYTES = 256 << 20
COALESCE_PARTS = 32


class Coalescer:
    """Two-level ref coalescer: every COALESCE_PARTS fresh refs collapse
    into one chunk (remote concat), every COALESCE_PARTS chunks into one
    super-chunk — so a bucket's driver-held refs stay ≤ ~2·COALESCE_PARTS
    + blocks/COALESCE_PARTS² instead of O(blocks), and no table is ever
    re-concatenated more than twice."""

    def __init__(self, combine_remote):
        self._combine = combine_remote
        self.fresh: list = []
        self.chunks: list = []
        self.supers: list = []

    def add(self, ref) -> None:
        self.fresh.append(ref)
        if len(self.fresh) >= COALESCE_PARTS:
            self.chunks.append(self._combine.remote(*self.fresh))
            self.fresh = []
            if len(self.chunks) >= COALESCE_PARTS:
                self.supers.append(self._combine.remote(*self.chunks))
                self.chunks = []

    def parts(self) -> list:
        return self.supers + self.chunks + self.fresh


def hash_group_apply(ds, key_cols: list[str], bucket_fn,
                     n_buckets: int | None = None,
                     out_schema: pa.Schema | None = None,
                     max_bucket_bytes: int = DEFAULT_MAX_BUCKET_BYTES):
    """Returns a Dataset of bucket_fn outputs. ``out_schema`` (optional)
    casts/normalizes each bucket's output so empties keep their schema."""
    import ray
    import ray.data as rd

    if n_buckets is None:
        n_buckets = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)

    def _partition(tbl: pa.Table, assign: np.ndarray, k: int):
        # one COMPACT table per bucket via per-bucket take — never slice
        # of a sorted take: a sliced Arrow table pickles its FULL backing
        # buffers, shipping ×k redundant bytes per split task (see
        # pipelines/engine.py::_bucket_takes; measured 16× on the
        # correlation exchange map side)
        order = np.argsort(assign, kind="stable")
        bounds = np.searchsorted(assign[order], np.arange(k + 1))
        return [tbl.take(pa.array(order[bounds[i]:bounds[i + 1]]))
                for i in range(k)]

    def _key_hash(tbl: pa.Table) -> np.ndarray:
        kdf = tbl.select(key_cols).to_pandas()
        return pd.util.hash_pandas_object(kdf, index=False).to_numpy()

    @ray.remote
    def split(tbl: pa.Table, nb: int):
        if len(tbl) == 0:
            return (np.zeros(nb, dtype=np.int64),
                    *(tbl.slice(0, 0) for _ in range(nb)))
        b = (_key_hash(tbl) % nb).astype(np.int64)
        slices = _partition(tbl, b, nb)
        sizes = np.array([s.nbytes for s in slices], dtype=np.int64)
        return (sizes, *slices)

    @ray.remote
    def refine(tbl: pa.Table, nb: int, k: int):
        """Finer split of one oversized-bucket part by (h // nb) % k —
        independent of the coarse assignment, keys stay whole."""
        if len(tbl) == 0:
            return tuple(tbl.slice(0, 0) for _ in range(k))
        b = ((_key_hash(tbl) // nb) % k).astype(np.int64)
        return tuple(_partition(tbl, b, k))

    @ray.remote
    def coalesce(*tables):
        """Concat many small per-block bucket slices into one table so the
        driver's ref count per bucket stays bounded (empty slices keep the
        schema alive)."""
        parts = [t for t in tables if len(t)] or [tables[0]]
        return pa.concat_tables(parts)

    @ray.remote
    def reduce_bucket(*tables):
        parts = [t for t in tables if len(t)]
        if not parts:
            if out_schema is not None:
                return out_schema.empty_table()
            return None
        df = pa.concat_tables(parts).to_pandas()
        out = bucket_fn(df)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        if out_schema is not None:
            tbl = tbl.select(out_schema.names).cast(out_schema)
        return tbl

    buckets = [Coalescer(coalesce) for _ in range(n_buckets)]
    size_refs: list = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            outs = split.options(num_returns=n_buckets + 1).remote(ref, n_buckets)
            size_refs.append(outs[0])
            for i in range(n_buckets):
                buckets[i].add(outs[i + 1])

    bucket_bytes = np.zeros(n_buckets, dtype=np.int64)
    for s in ray.get(size_refs):
        bucket_bytes += s

    refs = []
    for i in range(n_buckets):
        k = int(min(64, -(-int(bucket_bytes[i]) // max(1, max_bucket_bytes))))
        if k >= 2:
            subs: list[list] = [[] for _ in range(k)]
            for part in buckets[i].parts():
                sub_outs = refine.options(num_returns=k).remote(
                    part, n_buckets, k)
                for j in range(k):
                    subs[j].append(sub_outs[j])
            refs.extend(reduce_bucket.remote(*subs[j]) for j in range(k))
        else:
            refs.append(reduce_bucket.remote(*buckets[i].parts()))
    if out_schema is None:
        vals = ray.get(refs)
        refs = [r for r, v in zip(refs, vals) if v is not None]
        if not refs:
            return rd.from_items([])
    return rd.from_arrow_refs(refs)
