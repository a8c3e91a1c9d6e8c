"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: the exact baseline — the query matrix is broadcast
  once (``ray.put``), every batch computes a (batch × queries) cosine
  matmul and emits its local top-k per query; a final tiny groupby merges
  per-batch candidates. The shuffle carries only k·queries rows per batch.
- ivf_topk: the scale path — k-means centroids trained on a driver-side
  sample, batches assign vectors to cells, search visits the nprobe
  nearest cells only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(ds, queries: np.ndarray, *, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_ids: np.ndarray | None = None):
    """Exact cosine top-k for each query row. Returns a Dataset
    (query_id, vec_id, cosine, rank)."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float32))
    qids = (np.arange(len(q)) if query_ids is None
            else np.asarray(query_ids)).astype(np.int64)
    q_ref = ray.put((q, qids))

    def local_topk(tbl: pa.Table) -> pa.Table:
        qm, qi = ray.get(q_ref)
        ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
        mat = _unit(np.asarray(tbl.column(vec_col).to_pylist(), dtype=np.float32))
        sims = mat @ qm.T                       # (batch, nq)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]   # (kk, nq)
        out_q, out_v, out_s = [], [], []
        for c in range(sims.shape[1]):
            rows = top[:, c]
            out_q.extend([int(qi[c])] * len(rows))
            out_v.extend(ids[rows].tolist())
            out_s.extend(sims[rows, c].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_v, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(local_topk, batch_format="pyarrow")
              .groupby("query_id").map_groups(merge, batch_format="pandas"))


def _kmeans(sample: np.ndarray, n_cells: int, iters: int = 8, seed: int = 5):
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            pts = sample[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(ds, queries: np.ndarray, *, k: int = 10, n_cells: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 4096, seed: int = 5,
             query_ids: np.ndarray | None = None):
    """IVF: restrict each query to its nprobe nearest centroid cells.
    Centroids come from a driver-side random sample (one small read), then
    everything streams. Approximate — recall measured against
    brute_force_topk in tests."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float32))
    qids = (np.arange(len(q)) if query_ids is None
            else np.asarray(query_ids)).astype(np.int64)

    sample_df = ds.random_sample(1.0, seed=seed).limit(sample_size).to_pandas()
    sample = _unit(np.asarray(sample_df[vec_col].tolist(), dtype=np.float32))
    cent = _kmeans(sample, n_cells, seed=seed)

    # query → nprobe candidate cells
    q_cells = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q, qids, cent, q_cells))

    def local_topk(tbl: pa.Table) -> pa.Table:
        qm, qi, cm, qc = ray.get(ref)
        ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
        mat = _unit(np.asarray(tbl.column(vec_col).to_pylist(), dtype=np.float32))
        cell = np.argmax(mat @ cm.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for c in range(len(qm)):
            m = np.isin(cell, qc[c])
            if not m.any():
                continue
            sims = mat[m] @ qm[c]
            sub_ids = ids[m]
            kk = min(k, len(sub_ids))
            rows = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qi[c])] * len(rows))
            out_v.extend(sub_ids[rows].tolist())
            out_s.extend(sims[rows].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_v, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(local_topk, batch_format="pyarrow")
              .groupby("query_id").map_groups(merge, batch_format="pandas"))
