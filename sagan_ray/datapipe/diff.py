"""Snapshot diff — the corpus-versioning primitive an incremental
training-data pipeline runs between crawls: which documents were added,
removed, or changed since the last snapshot (the keep/reprocess
work-list). Beyond the reference's scope; same incremental stance as
``dedup.exact_dedup_incremental``.

Content equality is HASH-based map-side (``hash_array_pure`` over the
content column), the ``dedup_exact`` stance: text never crosses the
exchange — only (key, side, hash64) rows do — so the diff of two 50-TB
snapshots moves ~24 bytes per row. The SQL oracle compares text
directly; a 64-bit collision would split them, which at gate scale is
~n²/2⁶⁴ and at 100 TB is the same documented trade every hash-keyed
dedup in this repo makes.

Keys are assumed unique per snapshot (a snapshot IS a keyed table); a
duplicated key raises in the reduce bucket rather than guessing.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash_array_pure


def snapshot_diff(old_ds, new_ds, *, key_col: str = "doc_id",
                  content_col: str = "text"):
    """(key, status) for every key whose row differs between snapshots:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    content hash differs). Unchanged rows drop map-side-cheaply in the
    reduce. Side-tagged union through one key-hashed exchange."""
    import pandas as pd

    from .exchange import hash_group_apply

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
            txt = tbl.column(content_col).to_pandas()
            h = hash_array_pure(txt.to_numpy()).astype(np.uint64)
            return pa.table({key_col: pa.array(keys.astype(np.int64),
                                               pa.int64()),
                             "side": pa.array(np.full(len(keys), side,
                                                      np.int32),
                                              pa.int32()),
                             "h": pa.array(h, pa.uint64())})
        return fn

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]
        n = df[df["side"] == 1]
        if (o[key_col].duplicated().any()
                or n[key_col].duplicated().any()):
            raise ValueError("snapshot_diff: duplicate key within one "
                             "snapshot")
        m = o.merge(n, on=key_col, how="outer", suffixes=("_o", "_n"))
        status = np.where(
            m["side_o"].isna(), "added",
            np.where(m["side_n"].isna(), "removed",
                     np.where(m["h_o"] != m["h_n"], "changed",
                              "unchanged")))
        keep = status != "unchanged"
        return pd.DataFrame({key_col: m[key_col][keep].astype("int64"),
                             "status": status[keep]})

    out_schema = pa.schema([(key_col, pa.int64()), ("status", pa.string())])
    tagged = (old_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(new_ds.map_batches(tag(1), batch_format="pyarrow")))
    return hash_group_apply(tagged, [key_col], reduce_bucket,
                            out_schema=out_schema)
