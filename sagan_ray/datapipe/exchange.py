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

Scale notes: n_buckets bounds reduce-task memory (raise for bigger
inputs); map-side slices move through the object store once; skewed keys
concentrate in one bucket — salt upstream if a single key's rows exceed a
worker (SURVEY.md §4 hard part #4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_group_apply(ds, key_cols: list[str], bucket_fn,
                     n_buckets: int | None = None,
                     out_schema: pa.Schema | None = None):
    """Returns a Dataset of bucket_fn outputs. ``out_schema`` (optional)
    casts/normalizes each bucket's output so empties keep their schema."""
    import ray
    import ray.data as rd

    if n_buckets is None:
        n_buckets = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)

    @ray.remote
    def split(tbl: pa.Table, nb: int):
        if len(tbl) == 0:
            return tuple(tbl.slice(0, 0) for _ in range(nb))
        kdf = tbl.select(key_cols).to_pandas()
        h = pd.util.hash_pandas_object(kdf, index=False).to_numpy()
        b = (h % nb).astype(np.int64)
        order = np.argsort(b, kind="stable")
        tbl = tbl.take(pa.array(order))
        bounds = np.searchsorted(b[order], np.arange(nb + 1))
        return tuple(tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
                     for i in range(nb))

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

    buckets: list[list] = [[] for _ in range(n_buckets)]
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            outs = split.options(num_returns=n_buckets).remote(ref, n_buckets)
            if n_buckets == 1:
                outs = [outs]
            for i in range(n_buckets):
                buckets[i].append(outs[i])
    refs = [reduce_bucket.remote(*buckets[i]) for i in range(n_buckets)]
    if out_schema is None:
        import ray as _ray
        vals = _ray.get(refs)
        refs = [r for r, v in zip(refs, vals) if v is not None]
        if not refs:
            return rd.from_items([])
    return rd.from_arrow_refs(refs)
