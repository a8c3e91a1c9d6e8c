"""Distributed k-means over an embedding column — the semantic-
clustering / semantic-dedup primitive (cluster-then-filter curation,
SemDeDup-style) — as Lloyd iterations of map_batches partial sums.

Determinism by construction (this is what lets a golden-parquet oracle
hash-match the distributed run exactly):

- Vectors are quantized ONCE to a fixed-point grid
  (``round(v * 2^20)``, held in float64). Every distance term —
  ``|x|^2 - 2 x.c + |c|^2`` with centroids also on the grid — is an
  integer below 2^53, so float64 arithmetic is EXACT and the argmin is
  identical under any BLAS blocking or batch split.
- Per-batch partial sums are exact in float64 (batch_size * 2^21 * |v|
  stays under 2^53), cast to int64 before leaving the task; the
  driver-side combine is integer addition — order-independent at any
  block count. (int64 bounds the total at ~4e12 rows per cluster at
  this grid; log-scale headroom over the 100-TB target.)
- Seeds are the k rows with the smallest SplitMix64(id) — the same
  blocking-independent ordering hash the IVF sampler uses — so init
  does not depend on block layout.
- Centroid update ``rint(S / n)`` re-lands on the grid; empty clusters
  keep their previous centroid.

Per iteration the data passes ONCE (streaming; nothing driver-side but
the k×d centroid table and k·d-row partials). n_iters full scans is the
standard Lloyd cost; cap it or sample for the init at larger k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _ids, _mat, _splitmix64
from .exchange import hash_group_apply

FIX = float(1 << 20)


def _qmat(tbl: pa.Table, vec_col: str) -> np.ndarray:
    """Fixed-point quantized matrix: integer-valued float64."""
    return np.rint(_mat(tbl, vec_col, np.float64) * FIX)


def _assign(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact-integer-in-float64 squared distances; ties -> lowest
    cluster index (np.argmin)."""
    d2 = ((x * x).sum(axis=1, keepdims=True)
          - 2.0 * (x @ cent.T) + (cent * cent).sum(axis=1))
    return np.argmin(d2, axis=1)


def fit_centroids(ds, *, k: int = 8, n_iters: int = 8,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> np.ndarray:
    """Lloyd training only; returns the (k, d) grid-point centroid
    matrix. The input Dataset is consumed n_iters + 1 times (seed scan
    + one partial scan per iteration) — each pass streams."""
    import ray

    # ---- seeds: k smallest SplitMix64(id), candidates pre-pruned per
    # batch so only k rows per block reach the driver
    def cand(tbl: pa.Table) -> pa.Table:
        ids = _ids(tbl, id_col)
        if not len(ids):
            return pa.table({"h": pa.array([], pa.uint64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        h = _splitmix64(ids.astype(np.uint64))
        kk = min(k, len(ids))
        top = np.argpartition(h, kk - 1)[:kk]
        q = _qmat(tbl, vec_col)[top]
        return pa.table({"h": pa.array(h[top], pa.uint64()),
                         "vec": pa.array(list(q), pa.list_(pa.float64()))})

    # large batches: the per-batch candidate prune (k rows) and moment
    # partial (k*d rows) are emitted PER BATCH — the 1024-row default
    # would ship one partial row per two data rows (the IVF sample-pass
    # lesson); exactness is batch-size-independent by construction
    def cand_combine(tbl: pa.Table) -> pa.Table:
        """Task-side fold: k smallest-hash rows of ≤64 candidate
        partials (k-smallest merge is associative/commutative, so the
        extra level is exact); driver rows drop O(batches) → O(b/64)."""
        if len(tbl) <= k:
            return tbl
        hs = tbl.column("h").to_numpy(zero_copy_only=False)
        keep = np.sort(np.argpartition(hs, k - 1)[:k])
        return tbl.take(pa.array(keep, pa.int64()))

    cdf = (ds.map_batches(cand, batch_format="pyarrow", batch_size=65536)
             .map_batches(cand_combine, batch_format="pyarrow",
                          batch_size=64 * k)
             .to_pandas())
    if cdf.empty or "h" not in cdf.columns:
        # all-empty Dataset loses columns through to_pandas — fail typed
        raise ValueError("fit_centroids: empty input Dataset (no vectors)")
    cdf = cdf.sort_values("h").head(k)
    cent = np.stack(cdf["vec"].to_numpy())           # (k, d) grid points
    k_eff = len(cent)

    for _ in range(n_iters):
        ref = ray.put(cent)

        def partial(tbl: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            x = _qmat(tbl, vec_col)
            if not len(x):
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            a = _assign(x, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            kk, d = c.shape
            return pa.table({
                "cluster": pa.array(np.repeat(np.arange(kk), d)),
                "dim": pa.array(np.tile(np.arange(d), kk)),
                "s": pa.array(sums.astype(np.int64).ravel()),
                "n": pa.array(np.repeat(counts, d)),
            })

        kk_d = cent.shape[0] * cent.shape[1]

        def moment_combine(tbl: pa.Table) -> pa.Table:
            """Task-side fold of ≤64 k·d-row moment partials (exact int64
            group-sums — topology-free); driver receives O(batches/64)."""
            g = (pa.TableGroupBy(tbl, ["cluster", "dim"])
                 .aggregate([("s", "sum"), ("n", "sum")]))
            # select by NAME before the positional rename — robust to a
            # pyarrow upgrade changing aggregate output column order
            return (g.select(["cluster", "dim", "s_sum", "n_sum"])
                     .rename_columns(["cluster", "dim", "s", "n"]))

        p = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
               .map_batches(moment_combine, batch_format="pyarrow",
                            batch_size=64 * kk_d)
               .to_pandas()
             .groupby(["cluster", "dim"], sort=True)
             .agg(s=("s", "sum"), n=("n", "sum")).reset_index())
        d = cent.shape[1]
        S = p["s"].to_numpy().reshape(k_eff, d).astype(np.float64)
        n = p["n"].to_numpy().reshape(k_eff, d)[:, 0].astype(np.float64)
        nz = n > 0
        cent[nz] = np.rint(S[nz] / n[nz, None])

    return cent


def kmeans_assign(ds, *, k: int = 8, n_iters: int = 8,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Lloyd k-means; returns a Dataset of (id_col, cluster)."""
    import ray

    cent = fit_centroids(ds, k=k, n_iters=n_iters, vec_col=vec_col,
                         id_col=id_col)
    ref = ray.put(cent)

    def final(tbl: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        x = _qmat(tbl, vec_col)
        a = (_assign(x, c) if len(x)
             else np.array([], np.int64))
        return pa.table({id_col: tbl.column(id_col).cast(pa.int64()),
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(final, batch_format="pyarrow")


def semantic_near_dup(ds, *, threshold: float = 0.45, k: int = 8,
                      n_iters: int = 8, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      max_cluster_rows: int = 65536):
    """SemDeDup-style near-duplicate pairs: k-means first, then exact
    float64 cosine all-pairs WITHIN each cluster only — the clustering
    bounds the quadratic term to the largest cluster instead of the
    corpus (pairs that straddle a cluster boundary are missed by
    design; that recall/cost trade IS the operator). Returns
    (a, b, cluster) with a < b.

    Partitioning assumption: one cluster's rows fit one reduce task; a
    cluster larger than ``max_cluster_rows`` is truncated to its
    lowest-id rows with a logged warning (the LSH max_bucket stance).
    """
    import logging

    import ray

    from .ann import _mat, _unit

    cent = fit_centroids(ds, k=k, n_iters=n_iters, vec_col=vec_col,
                         id_col=id_col)
    ref = ray.put(cent)

    def tag(tbl: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        x = _qmat(tbl, vec_col)
        a = (_assign(x, c) if len(x) else np.array([], np.int64))
        # float64 unit vectors (the SQL cosine is float64; f32 flips
        # threshold-boundary pairs), packed as ONE fixed-size binary
        # buffer — no per-row tobytes loop
        unit = _unit(_mat(tbl, vec_col, dtype=np.float64))
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(8 * c.shape[1]), len(x),      # d from centroids:
            [None, pa.py_buffer(                    # stable across batches
                np.ascontiguousarray(unit).tobytes())])
        return pa.table({
            "cluster": pa.array(a.astype(np.int64)),
            id_col: tbl.column(id_col).cast(pa.int64()),
            "unit": packed,
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for cl, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            if len(ids) > max_cluster_rows:
                logging.getLogger(__name__).warning(
                    "semantic_near_dup: cluster %d has %d rows; "
                    "truncated to %d lowest ids", int(cl), len(ids),
                    max_cluster_rows)
                ids = ids[:max_cluster_rows]
                order = order[:max_cluster_rows]
            unit = np.stack([np.frombuffer(b, np.float64)
                             for b in g["unit"].to_numpy()[order]])
            sims = unit @ unit.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, 1))
            out_a.extend(ids[ii].tolist())
            out_b.extend(ids[jj].tolist())
            out_c.extend([int(cl)] * len(ii))
        return pd.DataFrame({"a": out_a, "b": out_b, "cluster": out_c})

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("cluster", pa.int64())])
    return hash_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"), ["cluster"], bucket,
        out_schema=out_schema)


def embedding_outliers(ds, *, k: int = 8, n_iters: int = 8, q: float = 0.99,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       bucket_shift: int = 32):
    """Embedding-space outlier audit: rows whose squared distance to
    their OWN kmeans centroid falls strictly above their cluster's
    q-quantile distance BUCKET — the curation signal for mislabeled /
    corrupt / off-distribution vectors. Spec (deterministic end to
    end): d² is the exact-integer fixed-point distance (coords ≤ 2^20
    ⇒ d² ≤ 2^48 exact in float64), buckets are ``d² >> bucket_shift``
    (integer shift — the continuous-value histogram stance of
    ``group_quantile_sketch``: per-cluster histogram size is bounded by
    2^(48-shift), not row count), the threshold bucket is the first
    with cumulative count ≥ the EXACT rational ceil(q·n), and a row is
    an outlier iff its bucket is STRICTLY greater. Per-batch (cluster,
    bucket, count) partials fold driver-side (≤ k·2^16 rows total);
    thresholds broadcast back for the map-side flag pass. Returns a
    Dataset (id, cluster, d2) of the flagged rows only."""
    import math
    from fractions import Fraction

    import ray

    cent = fit_centroids(ds, k=k, n_iters=n_iters, vec_col=vec_col,
                         id_col=id_col)
    ref = ray.put(cent)

    def _d2(x: np.ndarray, c: np.ndarray):
        a = _assign(x, c)
        diff = x - c[a]
        return a, (diff * diff).sum(axis=1)      # exact ints ≤ 2^48

    def hist_part(tbl: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = _qmat(tbl, vec_col)
        if not len(x):
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        a, d2 = _d2(x, c)
        bkt = (d2.astype(np.int64) >> bucket_shift)
        t = pa.table({"cluster": pa.array(a.astype(np.int64)),
                      "bkt": pa.array(bkt, pa.int64())})
        g = pa.TableGroupBy(t, ["cluster", "bkt"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cluster", "bkt", "cnt"])

    h = (ds.map_batches(hist_part, batch_format="pyarrow",
                        batch_size=65536).to_pandas()
         .groupby(["cluster", "bkt"], sort=True)["cnt"].sum()
         .reset_index())
    thr = np.full(len(cent), np.iinfo(np.int64).max, np.int64)
    for cl, sub in h.groupby("cluster", sort=False):
        n = int(sub["cnt"].sum())
        rank = max(1, math.ceil(Fraction(str(float(q))) * n))
        cum = sub["cnt"].cumsum().to_numpy()
        thr[int(cl)] = int(sub["bkt"].to_numpy()[
            np.searchsorted(cum, rank, side="left")])
    tref = ray.put(thr)

    def flag(tbl: pa.Table) -> pa.Table:
        c = ray.get(ref)
        t = ray.get(tref)
        ids = _ids(tbl, id_col)
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        x = _qmat(tbl, vec_col)
        a, d2 = _d2(x, c)
        bkt = d2.astype(np.int64) >> bucket_shift
        m = bkt > t[a]
        return pa.table({id_col: pa.array(ids[m], pa.int64()),
                         "cluster": pa.array(a[m].astype(np.int64)),
                         "d2": pa.array(d2[m].astype(np.int64))})

    return ds.map_batches(flag, batch_format="pyarrow")


def semantic_dedup_filter(ds, *, threshold: float = 0.45, k: int = 8,
                          n_iters: int = 8, vec_col: str = "embedding",
                          id_col: str = "vec_id"):
    """The SemDeDup ACTION: the corpus with only each semantic-dup
    cluster's representative kept — ``semantic_near_dup`` pairs →
    transitive components (min-label propagation) → keep ids that are
    their component's minimum (or in no pair at all). Ids only cross
    the exchanges; the label table is pairs-bound, never corpus-bound.
    Returns a Dataset (id_col) of survivors."""
    from .dedup import connected_components
    from .joins import hash_join

    pairs = semantic_near_dup(ds, threshold=threshold, k=k,
                              n_iters=n_iters, vec_col=vec_col,
                              id_col=id_col)
    labels = connected_components(pairs).map_batches(
        lambda t: pa.table({id_col: t.column("node"),
                            "label": t.column("label")}),
        batch_format="pyarrow")
    ids = ds.map_batches(
        lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64())}),
        batch_format="pyarrow")
    j = hash_join(ids, labels, on=id_col, left_cols=[],
                  right_cols=["label"], how="left")

    def keep(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        lab = tbl.column("r_label")      # hash_join prefixes right cols
        m = pc_.or_kleene(pc_.is_null(lab),
                          pc_.equal(lab, tbl.column(id_col)))
        return tbl.filter(pc_.fill_null(m, False)).select([id_col])

    return j.map_batches(keep, batch_format="pyarrow")


_KC_SENTINEL = -(1 << 62)


def kcenter_coreset(ds, k: int = 16, *, vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """Greedy k-center (farthest-point / Gonzalez) coreset selection —
    the diversity-pruning staple ("keep k maximally spread examples"):
    seed = the smallest id, then k-1 rounds of picking the point whose
    nearest selected center is FARTHEST in cosine distance (= smallest
    max-dot), ties broken by smaller id. All similarity arithmetic runs
    on the ``ann._unit_grid`` fixed-point sphere, so every dot is an
    exact int64 and the greedy trajectory is bit-identical to the
    sequential golden under any block layout / BLAS — the kmeans/IVF
    determinism stance applied to an ITERATIVE selection.

    Distributed shape: a slim materialized state (id, u, maxdot) —
    2 passes per round, no shuffles. Pass A (rounds ≥ 1) broadcasts the
    single new center in the task closure (d int64s), drops its row, and
    folds ``maxdot = max(maxdot, U @ u_c)`` per batch; pass B emits ONE
    candidate row per batch (lexicographic (maxdot, id) min) and the
    driver folds O(batches) rows. At 100 TB the honest cost is k state
    rewrites (the update must see every row's vector); if k is large,
    pre-shard by an IVF cell pass and run per-cell coresets instead —
    this operator is the exact small-k primitive.

    Returns (rank, id, maxdot): selection order, the chosen id, and its
    max-dot to the previously selected set at selection time (the seed
    carries the -2^62 sentinel; maxdot/2^28 ≈ cosine to the nearest
    earlier pick, so the column doubles as the coverage-radius curve).
    """
    from .ann import _unit_grid

    def slim(tbl: pa.Table) -> pa.Table:
        ids = _ids(tbl, id_col)
        n = len(ids)
        u = _unit_grid(_mat(tbl, vec_col, dtype=np.float64)).astype(np.int64)
        d = u.shape[1] if u.size else 0
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * d)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "u": pa.ListArray.from_arrays(offsets, pa.array(u.ravel())),
            "maxdot": pa.array(np.full(n, _KC_SENTINEL, np.int64)),
        })

    state = ds.map_batches(slim, batch_format="pyarrow",
                           batch_size=65536).materialize()

    def update(tbl: pa.Table, *, uc: np.ndarray, sel: int) -> pa.Table:
        ids = _ids(tbl, id_col)
        keep = ids != sel
        ids = ids[keep]
        if len(ids) == 0:
            return tbl.slice(0, 0)
        u = _mat(tbl, "u", dtype=np.int64)[keep]
        md = np.maximum(tbl.column("maxdot")
                        .to_numpy(zero_copy_only=False)[keep], u @ uc)
        offsets = pa.array(np.arange(len(ids) + 1, dtype=np.int32)
                           * u.shape[1])
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "u": pa.ListArray.from_arrays(offsets, pa.array(u.ravel())),
            "maxdot": pa.array(md, pa.int64()),
        })

    def cand(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        ids = _ids(tbl, id_col)
        md = tbl.column("maxdot").to_numpy(zero_copy_only=False)
        i = int(np.lexsort((ids, md))[0])
        return tbl.take(pa.array([i], pa.int64()))

    out_rank, out_id, out_md = [], [], []
    for rank in range(k):
        if rank:
            import functools
            state = state.map_batches(
                functools.partial(update, uc=uc, sel=sel),
                batch_format="pyarrow").materialize()
        cands = (state.map_batches(cand, batch_format="pyarrow")
                 .to_pandas())
        if len(cands) == 0:
            break
        c = cands.sort_values(["maxdot", id_col],
                              kind="mergesort").iloc[0]
        sel, uc = int(c[id_col]), np.asarray(c["u"], np.int64)
        out_rank.append(rank)
        out_id.append(sel)
        out_md.append(int(c["maxdot"]))

    return pa.table({"rank": pa.array(out_rank, pa.int64()),
                     id_col: pa.array(out_id, pa.int64()),
                     "maxdot": pa.array(out_md, pa.int64())})


def dbscan(ds, *, threshold: float = 0.35, min_pts: int = 3,
           vec_col: str = "embedding", id_col: str = "vec_id",
           n_blocks: int = 8):
    """Density clustering (DBSCAN) under cosine similarity: a point's
    eps-neighborhood is every OTHER point with cosine ≥ ``threshold``;
    core points have ≥ ``min_pts`` points in the closed neighborhood
    (self included); clusters are the connected components of the
    core-core adjacency graph; a non-core point adjacent to ≥1 core
    joins the MINIMUM adjacent core's cluster (classic DBSCAN border
    assignment is scan-order-dependent — min-label is the deterministic
    refinement, mirrored exactly by the SQL oracle); everything else is
    noise (label -1). Returns a Dataset (vec_id, label, is_core) with
    label = min core vec_id of the cluster.

    Composition of existing distributed shapes — nothing new shuffles:
    eps-pairs via the block-nested-loop exchange
    (``dedup.embedding_near_dup_exact``, float64 end-to-end so
    threshold-boundary pairs match the SQL cosine bit-for-bit), degrees
    and border-min via node-keyed exchanges, cluster labels via
    ``dedup.connected_components`` over the core-core pairs, and the
    final per-id attach via the side-tagged label exchange (ids only —
    vectors cross the wire exactly once, in the pair stage). Driver
    holds nothing but Dataset handles; every intermediate is
    pair-graph-sized, not corpus-sized."""
    import pyarrow.compute as pc_

    from .dedup import connected_components, embedding_near_dup_exact
    from .exchange import hash_group_apply

    pairs = embedding_near_dup_exact(
        ds, threshold=threshold, vec_col=vec_col, id_col=id_col,
        n_blocks=n_blocks)

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks().cast(pa.int64())
        b = t.column("b").combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.chunked_array([a, b]).combine_chunks(),
                         "v": pa.chunked_array([b, a]).combine_chunks()})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def deg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", sort=False).size().reset_index(name="deg")
        return g.rename(columns={"u": "node"})

    deg = hash_group_apply(edges, ["u"], deg_bucket,
                           out_schema=deg_schema).materialize()

    # side-tagged flag attach: edges learn whether each endpoint is core
    # (deg + 1 >= min_pts). Two passes, one per endpoint, keyed on that
    # endpoint — the dedup_cluster_reps attach shape.
    flag_schema = pa.schema([("key", pa.int64()), ("other", pa.int64()),
                             ("flag", pa.int8())])
    tag_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                            ("u_core", pa.int8())])

    def core_rows(t: pa.Table) -> pa.Table:
        is_core = pc_.greater_equal(
            pc_.add(t.column("deg").cast(pa.int64()), 1), min_pts)
        n = len(t)
        return pa.table({"key": t.column("node"),
                         "other": pa.array(np.full(n, -1, np.int64)),
                         "flag": is_core.cast(pa.int8())},
                        schema=flag_schema)

    def edge_rows_u(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t.column("u"), "other": t.column("v"),
                         "flag": pa.array(np.full(n, -1, np.int8))},
                        schema=flag_schema)

    def attach_flag(df: pd.DataFrame) -> pd.DataFrame:
        is_lab = df["flag"].to_numpy() >= 0
        lut = dict(zip(df.loc[is_lab, "key"], df.loc[is_lab, "flag"]))
        e = df.loc[~is_lab]
        return pd.DataFrame({
            "u": e["key"].astype("int64"),
            "v": e["other"].astype("int64"),
            "u_core": e["key"].map(lut).fillna(0).astype("int8"),
        })

    tagged = hash_group_apply(
        edges.map_batches(edge_rows_u, batch_format="pyarrow")
             .union(deg.map_batches(core_rows, batch_format="pyarrow")),
        ["key"], attach_flag, out_schema=tag_schema).materialize()

    # tagged has BOTH directions of every pair, so (u, v, u_core) also
    # carries (v, u, v_core) — one more keyed pass zips them
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    bseed_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def swap_rows(t: pa.Table) -> pa.Table:
        # key both orientations on (min, max) so the two directed rows
        # of one pair land in one group
        lo = pc_.min_element_wise(t.column("u"), t.column("v"))
        hi = pc_.max_element_wise(t.column("u"), t.column("v"))
        return pa.table({"lo": lo, "hi": hi, "u": t.column("u"),
                         "u_core": t.column("u_core")})

    def core_edge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # per (lo, hi): two rows (u=lo and u=hi); emit the undirected
        # core-core pair once, and the border seed (non-core u → core v)
        g = df.sort_values(["lo", "hi", "u"])
        lo = g["lo"].to_numpy()
        hi = g["hi"].to_numpy()
        u = g["u"].to_numpy()
        c = g["u_core"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        # rows come in (lo-row, hi-row) order within each pair
        i0 = np.flatnonzero(first)
        i1 = i0 + 1
        assert len(i0) == 0 or (u[i0] == lo[i0]).all()
        lo_c = c[i0].astype(bool)
        hi_c = c[i1].astype(bool)
        both = lo_c & hi_c
        seeds_u = np.concatenate([lo[i0][~lo_c & hi_c],
                                  hi[i0][lo_c & ~hi_c]])
        seeds_v = np.concatenate([hi[i0][~lo_c & hi_c],
                                  lo[i0][lo_c & ~hi_c]])
        return pd.DataFrame({
            "a": np.concatenate([lo[i0][both], seeds_u]),
            "b": np.concatenate([hi[i0][both], seeds_v]),
            "kind": np.concatenate([np.zeros(both.sum(), np.int8),
                                    np.ones(len(seeds_u), np.int8)]),
        })

    ce_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("kind", pa.int8())])
    classified = hash_group_apply(
        tagged.map_batches(swap_rows, batch_format="pyarrow"),
        ["lo", "hi"], core_edge_bucket, out_schema=ce_schema).materialize()

    core_pairs = classified.filter(
        expr="kind == 0").select_columns(["a", "b"])
    # border seeds: a = non-core node, b = adjacent core
    border_seeds = classified.filter(expr="kind == 1")

    comp = connected_components(core_pairs)    # (node, label), cores only

    # cluster label for EVERY core: component label, or own id for a
    # core with no core neighbor — side-tagged attach keyed on node
    lab_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    att_schema = pa.schema([("key", pa.int64()), ("label", pa.int64()),
                            ("tag", pa.int8())])

    def comp_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t.column("node"), "label": t.column("label"),
                         "tag": pa.array(np.zeros(n, np.int8))},
                        schema=att_schema)

    def core_node_rows(t: pa.Table) -> pa.Table:
        is_core = pc_.greater_equal(
            pc_.add(t.column("deg").cast(pa.int64()), 1), min_pts)
        keep = t.filter(is_core)
        n = len(keep)
        return pa.table({"key": keep.column("node"),
                         "label": pa.array(np.full(n, -1, np.int64)),
                         "tag": pa.array(np.ones(n, np.int8))},
                        schema=att_schema)

    def core_label(df: pd.DataFrame) -> pd.DataFrame:
        lab = df.loc[df["tag"] == 0]
        lut = dict(zip(lab["key"], lab["label"]))
        nodes = df.loc[df["tag"] == 1, "key"]
        return pd.DataFrame({
            "node": nodes.astype("int64"),
            "label": nodes.map(lambda x: lut.get(x, x)).astype("int64"),
        })

    core_labels = hash_group_apply(
        comp.map_batches(comp_rows, batch_format="pyarrow")
            .union(deg.map_batches(core_node_rows, batch_format="pyarrow")),
        ["key"], core_label, out_schema=lab_schema).materialize()

    # border: min adjacent-core cluster label per non-core node — key
    # the seeds on the CORE end to pick up its label, then min per node
    def seed_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t.column("b"), "label": t.column("a"),
                         "tag": pa.array(np.ones(n, np.int8))},
                        schema=att_schema)

    def label_rows2(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t.column("node"), "label": t.column("label"),
                         "tag": pa.array(np.zeros(n, np.int8))},
                        schema=att_schema)

    def border_fwd(df: pd.DataFrame) -> pd.DataFrame:
        lab = df.loc[df["tag"] == 0]
        lut = dict(zip(lab["key"], lab["label"]))
        seeds = df.loc[df["tag"] == 1]
        return pd.DataFrame({
            "node": seeds["label"].astype("int64"),   # the non-core end
            "label": seeds["key"].map(lut).astype("int64"),
        })

    def min_per_node(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", sort=False)["label"].min().reset_index()

    border_labels = hash_group_apply(
        hash_group_apply(
            border_seeds.map_batches(seed_rows, batch_format="pyarrow")
                        .union(core_labels.map_batches(
                            label_rows2, batch_format="pyarrow")),
            ["key"], border_fwd, out_schema=lab_schema),
        ["node"], min_per_node, out_schema=lab_schema)

    # final attach: every vec_id picks core label > border label > -1
    fin_schema = pa.schema([(id_col, pa.int64()), ("label", pa.int64()),
                            ("is_core", pa.int64())])
    src_schema = pa.schema([("key", pa.int64()), ("label", pa.int64()),
                            ("tag", pa.int8())])

    def id_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks().cast(pa.int64())
        n = len(t)
        return pa.table({"key": ids,
                         "label": pa.array(np.full(n, -1, np.int64)),
                         "tag": pa.array(np.full(n, 2, np.int8))},
                        schema=src_schema)

    def core_lab_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t.column("node"), "label": t.column("label"),
                         "tag": pa.array(np.zeros(n, np.int8))},
                        schema=src_schema)

    def border_lab_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t.column("node"), "label": t.column("label"),
                         "tag": pa.array(np.ones(n, np.int8))},
                        schema=src_schema)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        tag = df["tag"].to_numpy()
        core_lut = dict(zip(df.loc[tag == 0, "key"],
                            df.loc[tag == 0, "label"]))
        bord_lut = dict(zip(df.loc[tag == 1, "key"],
                            df.loc[tag == 1, "label"]))
        ids = df.loc[tag == 2, "key"]
        lab = ids.map(lambda x: core_lut.get(x, bord_lut.get(x, -1)))
        return pd.DataFrame({
            id_col: ids.astype("int64"),
            "label": lab.astype("int64"),
            "is_core": ids.map(lambda x: int(x in core_lut)).astype("int64"),
        })

    return hash_group_apply(
        ds.map_batches(id_rows, batch_format="pyarrow")
          .union(core_labels.map_batches(core_lab_rows,
                                         batch_format="pyarrow"))
          .union(border_labels.map_batches(border_lab_rows,
                                           batch_format="pyarrow")),
        ["key"], assemble, out_schema=fin_schema)


def cluster_quality(ds, *, k: int = 8, n_iters: int = 8,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Per-cluster quality report over the fixed-point kmeans fit:
    (cluster, n, inertia, max_d2, mean_d2) where d² is the exact-integer
    grid distance (≤ 2^48 per row), inertia = Σ d² folded EXACTLY —
    per-batch partials split each d² into (d² // 2^24, d² mod 2^24) so
    both per-batch sums stay < 2^41 in int64, and the driver recombines
    them as arbitrary-precision Python ints (the only place the full sum
    exists; asserted < 2^63 before the int64 column is built). mean_d2 =
    inertia / n is one Python big-int true division — correctly rounded,
    so the sequential golden's identical expression matches bit-for-bit.

    Shape: centroids broadcast once; one map pass emits ≤ k partial rows
    per batch (batch_size pinned — the r3 partial-emit rule); nothing
    else moves."""
    import ray

    cent = fit_centroids(ds, k=k, n_iters=n_iters, vec_col=vec_col,
                         id_col=id_col)
    ref = ray.put(cent)
    q24 = np.int64(1) << np.int64(24)

    def part(tbl: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = _qmat(tbl, vec_col)
        if not len(x):
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "sr": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        a = _assign(x, c)
        diff = x - c[a]
        d2 = (diff * diff).sum(axis=1).astype(np.int64)  # exact ≤ 2^48
        n = np.bincount(a, minlength=len(c))
        sq = np.bincount(a, weights=(d2 // q24).astype(np.float64),
                         minlength=len(c)).astype(np.int64)
        sr = np.bincount(a, weights=(d2 % q24).astype(np.float64),
                         minlength=len(c)).astype(np.int64)
        mx = np.full(len(c), -1, np.int64)
        np.maximum.at(mx, a, d2)
        nz = np.flatnonzero(n)
        return pa.table({"cluster": pa.array(nz.astype(np.int64)),
                         "n": pa.array(n[nz].astype(np.int64)),
                         "sq": pa.array(sq[nz]), "sr": pa.array(sr[nz]),
                         "mx": pa.array(mx[nz])})

    parts = (ds.map_batches(part, batch_format="pyarrow",
                            batch_size=65536).to_pandas())
    rows = []
    for cl, sub in parts.groupby("cluster", sort=True):
        n = int(sub["n"].sum())
        inertia = int(sub["sq"].sum()) * (1 << 24) + int(sub["sr"].sum())
        assert inertia < (1 << 63)
        rows.append((int(cl), n, inertia, int(sub["mx"].max()),
                     inertia / n))
    return pd.DataFrame(rows, columns=["cluster", "n", "inertia",
                                       "max_d2", "mean_d2"]).astype(
        {"cluster": "int64", "n": "int64", "inertia": "int64",
         "max_d2": "int64", "mean_d2": "float64"})
