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
from fractions import Fraction

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
        # exact-rational rank: float ceil(0.9*n) can round UP across an
        # exact integer boundary (0.9 is not a binary float) while the
        # SQL side's ceil(DECIMAL * n) is exact — the
        # events_quantile_sketch lesson applied to the exact path too
        rank = max(1, math.ceil(Fraction(str(q)) * n))
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cum, rank, side="left")]))
    return pd.DataFrame({"q": out_q, "value": out_v})


def rolling_window_count(ds, *, key_col: str, ts_col: str,
                         window_us: int, id_col: str):
    """Per-row rolling count: for each row, how many rows of the SAME
    key fall in ``[ts - window, ts]`` — SQL's
    ``count(*) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN window
    PRECEDING AND CURRENT ROW)`` incl. the peer-group rule (rows that
    SHARE the current timestamp all count, regardless of position).

    One exchange on the key; inside a bucket every key is handled by a
    single composite-key searchsorted — ``key_idx * 2^48 + (ts - t0)``
    keeps keys ≥ 2^48 us (~8.9 years) apart, far beyond any window, so
    per-key windows never cross key boundaries and there is NO per-key
    loop. Requires window_us < 2^48 and a ts span < 2^48 us per run."""
    import pyarrow.compute as pac

    assert 0 < window_us < (1 << 48)
    _SHIFT = np.int64(1 << 48)

    def tag(tbl: pa.Table) -> pa.Table:
        ts = (tbl.column(ts_col).cast(pa.timestamp("us"))
              .cast(pa.int64()))
        return pa.table({
            key_col: tbl.column(key_col).cast(pa.int64()),
            "ts_us": ts,
            id_col: tbl.column(id_col).cast(pa.int64()),
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        ts = df["ts_us"].to_numpy()
        ids = df[id_col].to_numpy()
        # dense key index so the composite fits int64 at any key value
        uk, kidx = np.unique(keys, return_inverse=True)
        if len(uk) >= (1 << 15):
            # kidx * 2^48 overflows int64 at kidx >= 2^15: wrapped
            # composites would silently break key separation — fail loud
            # (mirror of the ts-span guard below).
            raise ValueError(
                "rolling_window_count: >= 2^15 distinct keys in one "
                "exchange bucket overflows the int64 composite key; "
                "raise n_buckets / lower max_bucket_bytes")
        span = int(ts.max() - ts.min()) if len(ts) else 0
        if span + window_us >= int(_SHIFT):
            raise ValueError(
                "rolling_window_count: ts span + window exceeds the "
                "2^48-us key separation; shard the input by time first")
        comp = kidx.astype(np.int64) * _SHIFT + (ts - ts.min())
        order = np.argsort(comp, kind="stable")
        cs = comp[order]
        hi = np.searchsorted(cs, cs, side="right")       # peers included
        lo = np.searchsorted(cs, cs - np.int64(window_us), side="left")
        out = pd.DataFrame({id_col: ids[order], "n_window": hi - lo})
        return out

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_window", pa.int64())])
    return hash_group_apply(ds.map_batches(tag, batch_format="pyarrow"),
                            [key_col], bucket, out_schema=out_schema)


def group_percentiles(ds, *, group_col: str, col: str, qs: list[float]):
    """Per-group exact nearest-rank quantiles — the grouped variant of
    ``percentiles``: per-batch (group, value) count partials (one Arrow
    group-by per 64k-row batch) cross ONE group-keyed exchange, so each
    bucket holds every (value, count) row of its groups and scans each
    group's sorted histogram independently. Returns a Dataset
    (group, q, value). Same scale stance as ``percentiles``: a group's
    DISTINCT-value histogram must fit a bucket (discrete signals — ≪ N)."""

    def counts(tbl: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(tbl.select([group_col, col]),
                            [group_col, col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, col, "cnt"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_q, out_v = [], [], []
        for gval, sub in df.groupby(group_col, sort=False):
            h = (sub.groupby(col, sort=False)["cnt"].sum().reset_index()
                 .sort_values(col))
            n = int(h["cnt"].sum())
            cum = h["cnt"].cumsum().to_numpy()
            vals = h[col].to_numpy()
            for q in qs:
                rank = max(1, math.ceil(Fraction(str(q)) * n))
                out_g.append(gval)
                out_q.append(float(q))
                out_v.append(int(vals[np.searchsorted(cum, rank,
                                                      side="left")]))
        return pd.DataFrame({group_col: out_g, "q": out_q, "value": out_v})

    schema = pa.schema([(group_col, pa.string()), ("q", pa.float64()),
                        ("value", pa.int64())])
    return hash_group_apply(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=65536),
        [group_col], bucket, out_schema=schema)


def group_quantile_sketch(ds, *, group_col: str, col: str,
                          qs: list[float], grid: int = 64):
    """Per-group approximate quantiles of a CONTINUOUS column via a
    fixed-resolution grid — the bounded-exchange answer where
    ``group_percentiles``'s exact (group, value) histogram degenerates
    (continuous doubles: every value distinct, the histogram IS the
    data). Spec, shared verbatim with the SQL oracle: bucket =
    ``floor(value · grid)`` (one IEEE multiply + exact floor on both
    sides), the answer for quantile q is ``first bucket with
    cumulative count ≥ ceil(q · n)`` reported as ``bucket / grid``
    (grid a power of two ⇒ exact binary division). Error ≤ 1/grid by
    construction; exchange rows are bounded by the value RANGE × grid
    per group, independent of row count. Returns a Dataset
    (group, q, value_est)."""

    def counts(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        bkt = np.floor(v * float(grid))
        t = pa.table({group_col: tbl.column(group_col),
                      "bkt": pa.array(bkt.astype(np.int64), pa.int64())})
        g = pa.TableGroupBy(t, [group_col, "bkt"]).aggregate(
            [([], "count_all")])
        return g.rename_columns([group_col, "bkt", "cnt"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_q, out_v = [], [], []
        for gval, sub in df.groupby(group_col, sort=False):
            h = (sub.groupby("bkt", sort=False)["cnt"].sum().reset_index()
                 .sort_values("bkt"))
            n = int(h["cnt"].sum())
            cum = h["cnt"].cumsum().to_numpy()
            bks = h["bkt"].to_numpy()
            for q in qs:
                # EXACT rational rank: the SQL side's VALUES (0.9) is a
                # DECIMAL, so its ceil(q·n) is exact — a float 0.9·n
                # rounds UP across exact-integer products (0.9·10 →
                # 9.000000000000002 → ceil 10) and flips the bucket
                from fractions import Fraction
                rank = max(1, math.ceil(Fraction(str(float(q))) * n))
                b = int(bks[np.searchsorted(cum, rank, side="left")])
                out_g.append(gval)
                out_q.append(float(q))
                out_v.append(float(b) / float(grid))
        return pd.DataFrame({group_col: out_g, "q": out_q,
                             "value_est": out_v})

    schema = pa.schema([(group_col, pa.string()), ("q", pa.float64()),
                        ("value_est", pa.float64())])
    return hash_group_apply(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=65536),
        [group_col], bucket, out_schema=schema)


def rank_normalize(ds, *, group_col: str, col: str, id_col: str = "doc_id"):
    """Per-row rank normalization within groups: ``pct_rank``
    (SQL percent_rank: rows strictly below / (n-1), ties share) and
    ``cume_dist`` (rows <= value / n) of ``col`` inside its
    ``group_col`` partition — the per-source quality-score
    normalization staple (normalize before a GLOBAL filter so one
    verbose source can't crowd out the rest).

    Shape: one (group, value) histogram exchange (distinct-cardinality
    ≪ N — the ``percentiles`` stance), then the tiny rank table
    broadcasts back via ``ray.put`` for a map-side merge: full rows
    never shuffle. Determinism: ranks are exact integer cumsums; each
    published float is ONE int/int IEEE division — bit-equal to the
    window-function oracle."""
    import ray

    def counts(tbl: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(tbl.select([group_col, col]),
                            [group_col, col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, col, "cnt"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([group_col, col], sort=False)["cnt"].sum()
                .reset_index())

    hist_schema = pa.schema([(group_col, pa.string()), (col, pa.int64()),
                             ("cnt", pa.int64())])
    hist = hash_group_apply(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=65536),
        [group_col], combine, out_schema=hist_schema).to_pandas()
    out_schema = pa.schema([(id_col, pa.int64()),
                            (group_col, pa.string()), (col, pa.int64()),
                            ("pct_rank", pa.float64()),
                            ("cume_dist", pa.float64())])
    if len(hist) == 0:
        import ray.data as rd
        return rd.from_arrow(out_schema.empty_table())
    hist = hist.sort_values([group_col, col]).reset_index(drop=True)
    cum = hist.groupby(group_col, sort=False)["cnt"].cumsum().to_numpy()
    cnt = hist["cnt"].to_numpy()
    n = hist.groupby(group_col, sort=False)["cnt"].transform("sum").to_numpy()
    below = (cum - cnt).astype(np.float64)
    hist["pct_rank"] = np.where(n > 1, below / np.maximum(n - 1, 1), 0.0)
    hist["cume_dist"] = cum.astype(np.float64) / n
    lut_ref = ray.put(hist.drop(columns=["cnt"]))

    def attach(tbl: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        df = tbl.select([id_col, group_col, col]).to_pandas()
        out = df.merge(lut, on=[group_col, col], how="left", sort=False)
        return pa.Table.from_pandas(
            out, schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(attach, batch_format="pyarrow")


def histogram(ds, *, col: str, lo: float, hi: float, nbins: int):
    """Fixed-bin histogram of a float column: bin = floor((v - lo)/w)
    clamped into [0, nbins) (outliers land in the edge bins — counted,
    never dropped), w = (hi - lo)/nbins. Returns a small pandas frame
    (bin, lo_edge, cnt) with every bin present (zeros included).

    Shape: per-batch ``np.bincount`` partials (nbins rows each,
    batch_size pinned — the partial-emitting-stage rule), one
    tree-combine map_batches, driver folds O(combined) rows. Nothing
    but (bin, cnt) rows ever leave a task. Determinism: the bin
    expression is the SAME IEEE ops as the SQL oracle's
    (floor((v-lo)/w), clamp), and counts are exact ints."""
    w = (hi - lo) / nbins
    part_schema = pa.schema([("bin", pa.int64()), ("cnt", pa.int64())])

    def part(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / w), 0, nbins - 1).astype(np.int64)
        c = np.bincount(b, minlength=nbins).astype(np.int64)
        return pa.table({"bin": np.arange(nbins, dtype=np.int64),
                         "cnt": c})

    def fold(tbl: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(tbl, "bin").aggregate([("cnt", "sum")])
        return g.rename_columns(["bin", "cnt"])

    parts = (ds.map_batches(part, batch_format="pyarrow",
                            batch_size=65536)
               .map_batches(fold, batch_format="pyarrow",
                            batch_size=nbins * 64))
    df = parts.to_pandas()
    if len(df) == 0:
        df = pd.DataFrame({"bin": np.arange(nbins, dtype=np.int64),
                           "cnt": np.zeros(nbins, np.int64)})
    out = (df.groupby("bin", sort=True)["cnt"].sum()
           .reindex(np.arange(nbins), fill_value=0).reset_index())
    out["lo_edge"] = lo + out["bin"].to_numpy() * w
    return out[["bin", "lo_edge", "cnt"]].astype(
        {"bin": "int64", "cnt": "int64", "lo_edge": "float64"})


def group_outlier_flags(ds, *, group_col: str, col: str, id_col: str,
                        k: float = 1.5):
    """Per-row Tukey-fence outlier flags within groups: is_outlier iff
    value < q1 - k·IQR or > q3 + k·IQR, with q1/q3 the NEAREST-RANK
    group quantiles (the ``percentiles`` spec) — the per-signal anomaly
    screen a curation pipeline runs before trusting a metric column.

    Shape: one (group, value) histogram exchange (distinct-cardinality
    ≪ N), driver keeps only the per-group fence table which broadcasts
    back via ``ray.put`` for a map-side flag pass — full rows never
    shuffle. Determinism: ranks are exact ints; every float the flag
    compares is built with the SAME IEEE expression the SQL oracle
    spells out (q1 - k·(q3 - q1) on identical doubles)."""
    import ray

    def counts(tbl: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(tbl.select([group_col, col]),
                            [group_col, col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, col, "cnt"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([group_col, col], sort=False)["cnt"].sum()
                .reset_index())

    hist_schema = pa.schema([(group_col, pa.string()),
                             (col, pa.float64()), ("cnt", pa.int64())])
    hist = hash_group_apply(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=65536),
        [group_col], combine, out_schema=hist_schema).to_pandas()
    out_schema = pa.schema([(id_col, pa.int64()), (group_col, pa.string()),
                            (col, pa.float64()),
                            ("is_outlier", pa.bool_())])
    if len(hist) == 0:
        import ray.data as rd
        return rd.from_arrow(out_schema.empty_table())
    lo_d, hi_d = {}, {}
    for gval, sub in hist.groupby(group_col, sort=False):
        sub = sub.sort_values(col)
        n = int(sub["cnt"].sum())
        cum = sub["cnt"].cumsum().to_numpy()
        vals = sub[col].to_numpy()
        q1 = vals[np.searchsorted(cum, max(1, math.ceil(0.25 * n)),
                                  side="left")]
        q3 = vals[np.searchsorted(cum, max(1, math.ceil(0.75 * n)),
                                  side="left")]
        lo_d[gval] = q1 - k * (q3 - q1)
        hi_d[gval] = q3 + k * (q3 - q1)
    b_ref = ray.put((lo_d, hi_d))

    def flag(tbl: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(b_ref)
        gv = tbl.column(group_col).to_pandas()
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        lo = gv.map(lo_m).to_numpy(dtype=np.float64)
        hi = gv.map(hi_m).to_numpy(dtype=np.float64)
        return pa.table({
            id_col: tbl.column(id_col).cast(pa.int64()),
            group_col: tbl.column(group_col),
            col: tbl.column(col).cast(pa.float64()),
            "is_outlier": pa.array((v < lo) | (v > hi))})

    return ds.map_batches(flag, batch_format="pyarrow")


def group_gini(ds, *, group_col: str, col: str):
    """Per-group Gini concentration of a value column — the
    inequality/skew report (how concentrated is event value across
    rows of a type, spend across users, bytes across sources):

        G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σ x) − (n + 1)/n      (ranks 1..n, x sorted)

    Rank ties are harmless: equal values contribute v·Σi over the tied
    block regardless of their order, so the statistic is deterministic
    without an id tie-break. Returns (group, n, gini); a group whose
    value sum is 0 yields NaN (division by zero, the SQL's NULL analog
    — callers on signed data should screen first, Gini assumes ≥ 0).

    Shape: the (group, value) histogram exchange (distinct-cardinality
    ≪ N — the ``percentiles`` stance); the driver computes Σ i·x from
    each distinct value's rank block (c·cum_before + c(c+1)/2 exact
    ints) over the groups-sized histogram. Full rows never shuffle.
    Float sums accumulate in histogram order vs the SQL's scan order —
    ~1e-15 relative, inside the gate tolerance."""

    def counts(tbl: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(tbl.select([group_col, col]),
                            [group_col, col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, col, "cnt"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([group_col, col], sort=False)["cnt"].sum()
                .reset_index())

    hist_schema = pa.schema([(group_col, pa.string()),
                             (col, pa.float64()), ("cnt", pa.int64())])
    hist = hash_group_apply(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=65536),
        [group_col], combine, out_schema=hist_schema).to_pandas()
    if len(hist) == 0:
        return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "gini": pd.Series([], dtype="float64")})
    rows = []
    for gval, sub in hist.groupby(group_col, sort=True):
        sub = sub.sort_values(col)
        c = sub["cnt"].to_numpy(np.int64)
        v = sub[col].to_numpy(np.float64)
        n = int(c.sum())
        cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
        # float64 on purpose: c·cum_before ~ n² wraps int64 at extreme
        # n; exact while < 2^53 and it feeds a float sum regardless.
        cf = c.astype(np.float64)
        rank_sum = cf * cum_before.astype(np.float64) + cf * (cf + 1) / 2
        s_iv = float(np.sum(v * rank_sum))
        s_v = float(np.sum(v * c.astype(np.float64)))
        gini = (2.0 * s_iv / (n * s_v) - (n + 1.0) / n
                if s_v != 0.0 else float("nan"))
        rows.append((gval, n, gini))
    return pd.DataFrame(rows, columns=[group_col, "n", "gini"])
