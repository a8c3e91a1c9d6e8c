"""Distribution statistics over corpus signal columns.

``percentiles``: EXACT distributed quantiles via the value-histogram
decomposition — per-batch value counts (one Arrow group-by per batch),
a hash exchange summing counts per DISTINCT value, then the nearest-rank
scan over the sorted histogram. Nothing but (value, count) rows cross
the wire, and the driver only ever holds the distinct-value histogram.

Scale stance: exact quantiles of a discrete/integer signal (token
counts, char lengths, scores on a grid) have distinct-cardinality ≪ N,
so the histogram is small at any data size. For genuinely continuous
columns, quantize to a grid first (the kmeans fixed-point trick) or
accept bucketed answers — a documented caller choice, not a silent cap.

Spec (shared with the SQL oracle, spelled out rather than relying on an
engine's quantile flavor): quantile q = the element at 1-indexed rank
``ceil(q * N)`` of the sorted column (nearest-rank definition).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .exchange import hash_group_apply


def percentiles(ds, col: str, qs: list[float]):
    """Returns a small pandas DataFrame (q, value) — one row per
    requested quantile, nearest-rank semantics."""

    def counts(tbl: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(tbl.select([col]), col).aggregate(
            [([], "count_all")])
        return g.rename_columns([col, "cnt"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(col, sort=False)["cnt"].sum()
        return g.reset_index()

    hist_schema = pa.schema([(col, pa.int64()), ("cnt", pa.int64())])
    hist = hash_group_apply(
        ds.map_batches(counts, batch_format="pyarrow",
                       batch_size=65536),   # one row per distinct value
        [col], combine,                      # PER BATCH — keep batches big
        out_schema=hist_schema).to_pandas()
    # an all-empty Dataset loses its columns through to_pandas — the
    # zero-row answer is the same either way
    if len(hist) == 0:
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="int64")})
    hist = hist.sort_values(col).reset_index(drop=True)
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    vals = hist[col].to_numpy()
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cum, rank, side="left")]))
    return pd.DataFrame({"q": out_q, "value": out_v})
