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
