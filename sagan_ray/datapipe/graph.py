"""PageRank over a link-graph edge table — the web-centrality operator a
100-TB crawl-curation pipeline runs before sampling (rank-weighted
keep/drop). Beyond the reference's scope (it has no graph stage); sits
next to the other iterative distributed operators (cluster.py k-means,
dedup.py connected components).

Exact-integer spec (the ``datapipe/cluster.py`` fixed-point discipline,
so the distributed run is bit-identical to the sequential golden under
any block layout):

- ranks are int64 on a per-node 2^30 grid:  r0[v] = 2^30 for all v
  (total mass  S = n·2^30  exactly);
- per iteration, with d = d_num/d_den (default 85/100):
    contrib[u] = r[u] // outdeg[u]          (floor division, spec)
    in[v]      = Σ contrib[u] over edges u→v   (multi-edges count)
    dangling   = Σ r[u] over outdeg[u] == 0
    r'[v]      = (d_den - d_num)·(S // n) // d_den
                 + d_num·(in[v] + dangling // n) // d_den
  Every term is an exact int64 sum of int64 values (|r| ≤ S ≤ 2^53 for
  n ≤ 2^23 nodes at this grid; the per-node caps are asserted), so the
  order the edge blocks are reduced in cannot change a single bit.
  Floor divisions leak O(n + outdeg) grid units of mass per iteration —
  deliberate: exactness is worth a ~2^-30 relative mass drift.

Distribution shape (the 100-TB story): edges are read once, hashed by
src is NOT needed — the per-block map pass computes a dense int64
partial in-vector with ``np.add.at`` against the BROADCAST rank/outdeg
arrays (``ray.put`` once per iteration, |V|·8 bytes), and only those
(node, partial) rows — bounded by |V| per block — return to the
combiner. Nodes must fit one machine (true for any real web graph's
node table vs its edge table); edges never re-shuffle and the Dataset
is materialized once so iterations replay blocks, not the read.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

PR_GRID = 1 << 30          # per-node fixed-point rank scale (spec)


def _outdeg(edges_mat, n_nodes: int) -> np.ndarray:
    """int64 out-degree vector via per-block bincount partials."""

    def part(tbl: pa.Table) -> pa.Table:
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        cnt = np.bincount(src, minlength=n_nodes).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"node": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    deg = np.zeros(n_nodes, dtype=np.int64)
    for b in edges_mat.map_batches(part, batch_format="pyarrow",
                                   batch_size=None).iter_batches(
                                       batch_format="pyarrow"):
        np.add.at(deg, b.column("node").to_numpy(zero_copy_only=False),
                  b.column("c").to_numpy(zero_copy_only=False))
    return deg


def pagerank(edges, n_nodes: int, *, n_iters: int = 10,
             d_num: int = 85, d_den: int = 100):
    """(node, rank) int64 table for nodes 0..n_nodes-1 from an edge
    Dataset with int64 columns (src, dst). See module docstring for the
    exact-integer spec and the broadcast/partial distribution shape."""
    import ray
    import ray.data as rd

    assert n_nodes <= (1 << 23), "rank grid overflows int64 past 2^23 nodes"
    edges = edges.materialize()     # iterations replay blocks, not reads
    deg = _outdeg(edges, n_nodes)
    r = np.full(n_nodes, PR_GRID, dtype=np.int64)
    s_total = n_nodes * PR_GRID
    base = (d_den - d_num) * (s_total // n_nodes) // d_den

    for _ in range(n_iters):
        contrib = np.zeros(n_nodes, dtype=np.int64)
        nz = deg > 0
        contrib[nz] = r[nz] // deg[nz]
        dangling = int(r[~nz].sum())
        ref = ray.put(contrib)

        def part(tbl: pa.Table, *, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            dst = tbl.column("dst").to_numpy(zero_copy_only=False)
            src = tbl.column("src").to_numpy(zero_copy_only=False)
            acc = np.zeros(len(c), dtype=np.int64)
            np.add.at(acc, dst, c[src])
            nzp = np.flatnonzero(acc)
            return pa.table({"node": pa.array(nzp, pa.int64()),
                             "s": pa.array(acc[nzp], pa.int64())})

        in_v = np.zeros(n_nodes, dtype=np.int64)
        for b in edges.map_batches(part, batch_format="pyarrow",
                                   batch_size=None).iter_batches(
                                       batch_format="pyarrow"):
            np.add.at(in_v, b.column("node").to_numpy(zero_copy_only=False),
                      b.column("s").to_numpy(zero_copy_only=False))
        r = base + d_num * (in_v + dangling // n_nodes) // d_den

    return rd.from_arrow(pa.table({"node": pa.array(np.arange(n_nodes),
                                                    pa.int64()),
                                   "rank": pa.array(r, pa.int64())}))


# ----------------------------------------------------------------------
# deterministic synthetic link graph
# ----------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
         ) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
         ) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def synth_link_graph(n_nodes: int = 2048, seed: int = 17) -> pa.Table:
    """Deterministic hub-skewed (src, dst) edge table. ``n_nodes`` must
    be a power of two: dst = (t² >> (64 - log2 n)) for a 32-bit hash t
    gives a √x CDF — low node ids are hubs, the web-graph shape that
    makes PageRank non-trivial. outdeg[u] = h(u) % 12 (zeros exercise
    the dangling-mass path); self-loops dropped."""
    lg = int(n_nodes).bit_length() - 1
    assert n_nodes == 1 << lg
    hu = _splitmix64(np.arange(n_nodes, dtype=np.uint64)
                     + np.uint64(seed) * np.uint64(0x1000000))
    outdeg = (hu % np.uint64(12)).astype(np.int64)
    src = np.repeat(np.arange(n_nodes, dtype=np.int64), outdeg)
    j = (np.arange(len(src), dtype=np.int64)
         - np.repeat(np.cumsum(outdeg) - outdeg, outdeg))
    he = _splitmix64(src.astype(np.uint64) * np.uint64(0x10001)
                     + j.astype(np.uint64) + np.uint64(seed))
    t = (he >> np.uint64(32)) & np.uint64(0xFFFFFFFF)
    dst = ((t * t) >> np.uint64(64 - lg)).astype(np.int64)
    keep = src != dst
    return pa.table({"src": pa.array(src[keep], pa.int64()),
                     "dst": pa.array(dst[keep], pa.int64())})
