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


def table_upsert(old_ds, new_ds, *, key_col: str = "doc_id"):
    """Keyed snapshot refresh (upsert): every key's row comes from the
    NEW snapshot when present there, else from the old one — no
    deletes; pair with ``snapshot_diff`` for a remove work-list. The
    two sides must share a schema. Returns the merged Dataset.

    Full rows cross the key exchange exactly once (they ARE the
    output — there is no slimmer shape for a materializing merge);
    in-bucket the winner per key is one sort + drop_duplicates, no
    per-key loop. A duplicated key WITHIN one snapshot raises (the
    ``snapshot_diff`` stance: a snapshot is a keyed table)."""
    import pandas as pd

    from .exchange import hash_group_apply

    out_schema = old_ds.schema().base_schema
    new_schema = new_ds.schema().base_schema
    if [f.name for f in out_schema] != [f.name for f in new_schema]:
        raise ValueError("table_upsert: snapshot schemas differ: "
                         f"{out_schema.names} vs {new_schema.names}")

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "_side", pa.array(np.full(tbl.num_rows, side, np.int32),
                                  pa.int32()))
        return fn

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.duplicated([key_col, "_side"]).any():
            raise ValueError("table_upsert: duplicate key within one "
                             "snapshot")
        df = df.sort_values([key_col, "_side"], ascending=[True, False],
                            kind="mergesort")
        return (df.drop_duplicates(subset=[key_col], keep="first")
                .drop(columns=["_side"]))

    tagged = (old_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(new_ds.map_batches(tag(1), batch_format="pyarrow")))
    return hash_group_apply(tagged, [key_col], reduce_bucket,
                            out_schema=out_schema)


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


SCD2_OPEN = 1 << 62          # sentinel "still valid" (avoids NULLs in
                             # hash-compared outputs; documented spec)


def scd2_merge(old_ds, new_ds, *, key_col: str, attr_cols: list[str],
               ts: int):
    """Slowly-changing-dimension (type 2) merge — the warehouse
    history-preserving upsert: ``old_ds`` carries versioned rows
    (key, attrs..., valid_from, valid_to with ``SCD2_OPEN`` = current);
    ``new_ds`` is the time-``ts`` snapshot (key, attrs...). Per key:
    already-closed history passes through untouched; an open row whose
    attrs match the new snapshot stays open; a changed row closes at
    ``ts`` and a fresh open row starts there; a brand-new key opens at
    ``ts``; a key absent from the snapshot keeps its open row (no
    implicit deletes — close explicitly upstream if absence means
    gone). Returns the merged versioned table.

    Shape: one side-tagged key exchange; each bucket resolves its keys
    with vectorized frame ops — full rows cross the wire once (they
    are the output, the ``table_upsert`` stance)."""
    import pandas as pd

    from .exchange import hash_group_apply

    acols = list(attr_cols)

    def old_part(tbl: pa.Table) -> pa.Table:
        return tbl.append_column("_side", pa.array(
            np.zeros(tbl.num_rows, np.int8)))

    def new_part(tbl: pa.Table) -> pa.Table:
        t = tbl.select([key_col] + acols)
        t = t.append_column("valid_from",
                            pa.array(np.full(tbl.num_rows, -1, np.int64)))
        t = t.append_column("valid_to",
                            pa.array(np.full(tbl.num_rows, -1, np.int64)))
        return t.append_column("_side", pa.array(
            np.ones(tbl.num_rows, np.int8)))

    cols = [key_col] + acols + ["valid_from", "valid_to"]
    sides = (old_ds.map_batches(old_part, batch_format="pyarrow",
                                batch_size=None)
             .union(new_ds.map_batches(new_part, batch_format="pyarrow",
                                       batch_size=None)))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        old = df[df["_side"] == 0][cols]
        new = df[df["_side"] == 1][[key_col] + acols]
        if new[key_col].duplicated().any():
            raise ValueError("scd2_merge: duplicate keys in snapshot")
        closed = old[old["valid_to"] != SCD2_OPEN]
        cur = old[old["valid_to"] == SCD2_OPEN]
        if cur[key_col].duplicated().any():
            raise ValueError("scd2_merge: multiple open rows per key")
        m = cur.merge(new, on=key_col, how="outer", suffixes=("", "_n"),
                      indicator=True)
        same = np.ones(len(m), dtype=bool)
        for c in acols:
            both = m["_merge"] == "both"
            eq = m[c].to_numpy(object) == m[f"{c}_n"].to_numpy(object)
            same &= np.where(both, eq, True)
        keep_open = m[(m["_merge"] == "left_only")
                      | ((m["_merge"] == "both") & same)][cols]
        to_close = m[(m["_merge"] == "both") & ~same].copy()
        to_close["valid_to"] = np.int64(ts)
        fresh = m[((m["_merge"] == "both") & ~same)
                  | (m["_merge"] == "right_only")].copy()
        for c in acols:
            fresh[c] = np.where(fresh["_merge"] != "left_only",
                                fresh[f"{c}_n"], fresh[c])
        fresh["valid_from"] = np.int64(ts)
        fresh["valid_to"] = np.int64(SCD2_OPEN)
        out = pd.concat([closed, keep_open, to_close[cols], fresh[cols]],
                        ignore_index=True)
        return out

    # derive attr types from the old side's schema (authoritative)
    old_schema = old_ds.schema().base_schema
    fields = [(key_col, old_schema.field(key_col).type)]
    fields += [(c, old_schema.field(c).type) for c in acols]
    fields += [("valid_from", pa.int64()), ("valid_to", pa.int64())]
    schema = pa.schema(fields)
    return hash_group_apply(sides, [key_col], bucket, out_schema=schema)
