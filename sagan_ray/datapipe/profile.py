"""Column profiling — the data-quality report a pipeline runs on every
new snapshot before spending compute on it (row/null counts, exact
distinct cardinality, value range per column). Beyond the reference's
scope; verified against a real SQL oracle (DuckDB aggregates per
column).

Distinct counting is exact but HASH-keyed (value-pure hash64 per
distinct value per batch through the column-keyed exchange — the
``dedup_exact`` stance: values themselves never shuffle, so profiling a
100-TB text column moves 8 bytes per distinct-per-block value, not the
text). min/max ship as strings (per-block partials are one row per
column); profiled columns should be int or ASCII string — float
formatting and non-ASCII collation differ between str() and SQL CAST,
so the spec restricts to types where the two agree byte-for-byte.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash_array_pure


def profile_table(ds, columns: list[str], *, ds_distinct=None):
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_v, max_v) with min/max as strings. ``ds_distinct``
    (optional) supplies a second Dataset over the same input for the
    distinct pass (branching one Dataset re-executes its whole prefix;
    pass two reads of the same parquet instead)."""
    import pandas as pd
    import ray.data as rd

    from .exchange import hash_group_apply

    cols = list(columns)

    # ---- pass A: per-block (column, n, nulls, min, max) partials ----
    # min/max partials stay TYPED (int64 vs string columns side by side)
    # so the driver combine compares natively — a stringified partial
    # would make '10' < '9' and corrupt integer ranges across blocks;
    # stringification happens once, after the global reduce, matching
    # the SQL's CAST(min(col) AS VARCHAR).
    def stats_part(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names, ns, nulls = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        for c in cols:
            col = tbl.column(c)
            names.append(c)
            ns.append(tbl.num_rows)
            nulls.append(int(col.null_count))
            valid = col.drop_null()
            lo = pc.min(valid).as_py() if len(valid) else None
            hi = pc.max(valid).as_py() if len(valid) else None
            if isinstance(lo, str) or isinstance(hi, str):
                min_i.append(None)
                max_i.append(None)
                min_s.append(lo)
                max_s.append(hi)
            else:
                min_i.append(lo)
                max_i.append(hi)
                min_s.append(None)
                max_s.append(None)
        return pa.table({"column": pa.array(names, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "nulls": pa.array(nulls, pa.int64()),
                         "min_i": pa.array(min_i, pa.int64()),
                         "max_i": pa.array(max_i, pa.int64()),
                         "min_s": pa.array(min_s, pa.string()),
                         "max_s": pa.array(max_s, pa.string())})

    stats = (ds.map_batches(stats_part, batch_format="pyarrow",
                            batch_size=None).to_pandas())

    # ---- pass B: exact distinct via per-batch distinct hash partials ----
    def distinct_part(tbl: pa.Table) -> pa.Table:
        outc, outh = [], []
        for c in cols:
            v = tbl.column(c).drop_null().to_pandas().to_numpy()
            if not len(v):
                continue
            h = np.unique(hash_array_pure(v).astype(np.uint64))
            outc.extend([c] * len(h))
            outh.extend(h.tolist())
        return pa.table({"column": pa.array(outc, pa.string()),
                         "h": pa.array(outh, pa.uint64())})

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(subset=["column", "h"])
             .groupby("column", sort=False, observed=True)
             .size().reset_index(name="d"))
        return g.astype({"d": "int64"})

    src = ds_distinct if ds_distinct is not None else ds
    parts = src.map_batches(distinct_part, batch_format="pyarrow",
                            batch_size=None)
    dcounts = hash_group_apply(
        parts, ["column", "h"], count_bucket,
        out_schema=pa.schema([("column", pa.string()),
                              ("d", pa.int64())])).to_pandas()
    if len(dcounts):
        dist = dcounts.groupby("column", sort=False).agg(
            n_distinct=("d", "sum")).reset_index()
    else:
        dist = pd.DataFrame({"column": [], "n_distinct": []})

    # ---- driver combine (|columns| × |blocks| rows) ----
    agg = stats.groupby("column", sort=False).agg(
        n_rows=("n", "sum"), n_nulls=("nulls", "sum"),
        min_i=("min_i", "min"), max_i=("max_i", "max"),
        min_s=("min_s", "min"), max_s=("max_s", "max")).reset_index()
    is_int = agg["min_i"].notna()
    agg["min_v"] = np.where(
        is_int, agg["min_i"].map(
            lambda v: str(int(v)) if pd.notna(v) else None),
        agg["min_s"])
    agg["max_v"] = np.where(
        is_int, agg["max_i"].map(
            lambda v: str(int(v)) if pd.notna(v) else None),
        agg["max_s"])
    out = agg.merge(dist, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[["column", "n_rows", "n_nulls", "n_distinct",
               "min_v", "max_v"]]
    out = out.sort_values("column").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
