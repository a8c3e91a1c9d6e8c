"""Distributed PCA over an embedding column — the wide-linear-algebra
shape: second-moment accumulation as map_batches partials, a d×d solve
on the driver, projection as a broadcast matmul. Nothing but (d, d)
integer matrices ever reach the driver; the data passes twice (moments,
project), both streaming.

Determinism: the same fixed-point trick as k-means
(``datapipe/cluster.py``). Vectors quantize to the 2^20 grid; moment
partials accumulate in float64 over ≤2048-row chunks (every partial sum
an exact integer < 2^53), cross chunks/blocks/driver in int64 — so the
covariance matrix is EXACTLY the same bits at any block layout, and
``np.linalg.eigh`` on identical input returns identical components.
Eigenvector sign is canonicalized (largest-|coefficient| entry made
positive) as part of the spec — signs out of a solver are otherwise
arbitrary. Projections are plain float64 matmuls; the golden spec
recomputes them per row (agreement to ~1e-15, inside the oracle
tolerance — only the moment accumulation NEEDS exactness, because it
feeds an eigensolver, where a last-bit difference could reorder
near-degenerate eigenvalues).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _mat
from .cluster import FIX, _qmat

_CHUNK = 2048      # rows per exact-float64 partial (2^11 · 2^42 = 2^53)


def moment_partials(x: np.ndarray):
    """(n, Σx, ΣxxT) of an integer-valued float64 matrix, exact, as
    int64 — chunked so every float64 partial stays on the integer
    grid."""
    d = x.shape[1]
    s1 = np.zeros(d, np.int64)
    s2 = np.zeros((d, d), np.int64)
    for i in range(0, len(x), _CHUNK):
        c = x[i:i + _CHUNK]
        s1 += c.sum(axis=0).astype(np.int64)
        s2 += (c.T @ c).astype(np.int64)
    return len(x), s1, s2


def fit_pca(ds, *, n_components: int, vec_col: str = "embedding"):
    """Returns (mean, components): the d-vector mean (float64, of the
    quantized grid divided back by FIX) and the (n_components, d)
    principal axes, eigenvalue-descending, sign-canonicalized."""

    def part(tbl: pa.Table) -> pa.Table:
        x = _qmat(tbl, vec_col)
        if not len(x):
            return pa.table({"n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.list_(pa.int64())),
                             "s2": pa.array([], pa.list_(pa.int64()))})
        n, s1, s2 = moment_partials(x)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "s1": pa.array([s1], pa.list_(pa.int64())),
                         "s2": pa.array([s2.ravel()],
                                        pa.list_(pa.int64()))})

    def combine(tbl: pa.Table) -> pa.Table:
        """Task-side fold of ≤64 moment partials into one — exact int64
        sums are topology-free, and the driver then receives
        O(batches/64) rows instead of O(batches) (at 100-TB batch counts
        the d² int64 rows would otherwise pile up driver-side)."""
        if len(tbl) == 0:
            return tbl
        n = int(np.asarray(tbl.column("n")).sum())
        s1 = np.stack(tbl.column("s1").to_pylist()).sum(
            axis=0, dtype=np.int64)
        s2 = np.stack(tbl.column("s2").to_pylist()).sum(
            axis=0, dtype=np.int64)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "s1": pa.array([s1], pa.list_(pa.int64())),
                         "s2": pa.array([s2], pa.list_(pa.int64()))})

    parts = (ds.map_batches(part, batch_format="pyarrow",
                            batch_size=65536)
               .map_batches(combine, batch_format="pyarrow",
                            batch_size=64)
               .to_pandas())
    if parts.empty or "n" not in parts.columns:
        # all-empty Dataset: to_pandas() loses the columns (round-3
        # empty-input hardening pattern) — fail typed, not KeyError
        raise ValueError("fit_pca: empty input Dataset (no vectors)")
    n = int(parts["n"].sum())
    s1 = np.sum(np.stack(parts["s1"].to_numpy()), axis=0,
                dtype=np.int64).astype(np.float64)
    d = len(s1)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0,
                dtype=np.int64).astype(np.float64).reshape(d, d)
    m = s1 / n
    cov = s2 / n - np.outer(m, m)
    w, v = np.linalg.eigh(cov)              # ascending eigenvalues
    comp = v[:, ::-1][:, :n_components].T   # (k, d) descending
    comp = np.ascontiguousarray(comp)
    flip = comp[np.arange(len(comp)),
                np.argmax(np.abs(comp), axis=1)] < 0
    comp[flip] *= -1.0
    return m / FIX, comp


def pca_project(ds, *, n_components: int, vec_col: str = "embedding",
                id_col: str = "vec_id"):
    """Dataset of (id_col, pc0..pc{k-1}): centered projections onto the
    fitted principal axes (axes broadcast once via ray.put)."""
    import ray

    mean, comp = fit_pca(ds, n_components=n_components, vec_col=vec_col)
    ref = ray.put((mean, comp))

    def proj(tbl: pa.Table, _ref=ref) -> pa.Table:
        m, c = ray.get(_ref)
        x = _qmat(tbl, vec_col) / FIX
        p = (x - m) @ c.T if len(x) else np.empty((0, len(c)))
        cols = {id_col: tbl.column(id_col).cast(pa.int64())}
        for j in range(len(c)):
            cols[f"pc{j}"] = pa.array(p[:, j], pa.float64())
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow")


def embedding_drift(ds, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", fix_bits: int = 20):
    """Split-half embedding drift report: rows split into two arms by
    the Knuth hash of their id (the A/B split of events.ab_conversion),
    and for every dimension the two arms' centroid means are compared —
    the regression check a pipeline runs when an embedding model is
    re-versioned or a corpus slice is swapped. Returns one row per dim:
    (dim, n_a, n_b, sum_a, sum_b, mean_a, mean_b, delta).

    Exactness with a REAL SQL oracle (rare for embedding ops): each
    coordinate quantizes to ``floor(v · 2^fix_bits + 0.5)`` — an
    elementwise IEEE expression DuckDB evaluates identically (floor is
    exact; rint is NOT used because numpy rounds half-to-even while SQL
    round() rounds half-away) — so the per-dim sums are exact int64,
    the means are single int/int divisions, and delta = mean_a − mean_b
    is one subtraction of two exact-ratio doubles. Per-batch partials
    are one (2 × d) int64 table per batch (batch_size pinned — the r3
    partial-emit rule); the driver folds batches × 2d rows."""
    import pyarrow.compute as _pc  # noqa: F401

    knuth = np.uint64(2654435761)
    mod32 = np.uint64(1) << np.uint64(32)
    fix = float(1 << fix_bits)

    def part(tbl: pa.Table) -> pa.Table:
        from .ann import _ids, _mat

        ids = _ids(tbl, id_col)
        if not len(ids):
            return pa.table({"grp": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        x = _mat(tbl, vec_col, dtype=np.float64)
        q = np.floor(x * fix + 0.5)              # exact ints in f64
        grp = (((ids.astype(np.uint64) * knuth) % mod32)
               % np.uint64(2)).astype(np.int64)
        d = q.shape[1]
        rows = {"grp": [], "dim": [], "s": [], "n": []}
        for g in (0, 1):
            m = grp == g
            if not m.any():
                continue
            s = q[m].sum(axis=0).astype(np.int64)   # ≤ rows·2^21·2^20
            rows["grp"].extend([g] * d)
            rows["dim"].extend(range(d))
            rows["s"].extend(s.tolist())
            rows["n"].extend([int(m.sum())] * d)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    parts = (ds.map_batches(part, batch_format="pyarrow",
                            batch_size=65536).to_pandas())
    if parts.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("dim", "n_a", "n_b",
                                       "sum_a", "sum_b")} |
                            {c: pd.Series([], dtype="float64")
                             for c in ("mean_a", "mean_b", "delta")})
    agg = (parts.groupby(["grp", "dim"], as_index=False)
           .agg(s=("s", "sum"), n=("n", "sum")))
    a = agg[agg["grp"] == 0].set_index("dim")
    b = agg[agg["grp"] == 1].set_index("dim")
    dims = sorted(set(a.index) | set(b.index))
    out = pd.DataFrame({"dim": np.array(dims, np.int64)})
    out["n_a"] = a["n"].reindex(dims, fill_value=0).to_numpy(np.int64)
    out["n_b"] = b["n"].reindex(dims, fill_value=0).to_numpy(np.int64)
    out["sum_a"] = a["s"].reindex(dims, fill_value=0).to_numpy(np.int64)
    out["sum_b"] = b["s"].reindex(dims, fill_value=0).to_numpy(np.int64)
    out["mean_a"] = out["sum_a"].to_numpy(np.float64) \
        / np.maximum(out["n_a"].to_numpy(np.float64), 1.0)
    out["mean_b"] = out["sum_b"].to_numpy(np.float64) \
        / np.maximum(out["n_b"].to_numpy(np.float64), 1.0)
    out["delta"] = out["mean_a"].to_numpy() - out["mean_b"].to_numpy()
    return out.sort_values("dim").reset_index(drop=True)
