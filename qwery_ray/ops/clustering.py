"""Distributed embedding clustering: Lloyd k-means + SemDeDup-style
semantic deduplication.

Both are standard public algorithms (Lloyd 1982; SemDeDup = Abbas et al.
2023, arXiv:2303.09540: k-means the embedding space, then drop
near-identical pairs WITHIN each cluster so the pairwise work is
O(cluster_size**2), never O(corpus**2)).

Scale shape (the part that matters at 100 TB):
- the iteration working set is the (id, vec) projection ONLY, materialized
  once into the object store — iterations never re-read / re-decode the
  source parquet;
- each Lloyd iteration is one `map_batches` pass producing k×dim partial
  sums per batch (a BLAS one-hot matmul, no Python row loop); the driver
  merges O(k × num_blocks) small partial rows — the corpus never shuffles;
- centroids travel by `ray.put` broadcast, fetched once per task;
- the partial merge sums each (cluster, dim) column in SORTED-VALUE order
  (numpy lexsort + add.reduceat — a pure function of the partial multiset,
  so independent of the order Ray delivers them); the remaining
  sensitivity is the block layout itself, and assignment argmins are
  verified layout-invariant in tests (margins ≫ one ulp);
- when k × num_blocks partial rows would swamp the driver (SemDeDup's
  default k = N/512 on a real corpus), a `groupby("cluster")` tree-reduce
  collapses the partials to exactly k rows BEFORE the driver sees them;
  because the group merge uses the same sorted-order sum over the same
  per-cluster multiset, the tree path is bit-identical to the driver path;
- SemDeDup's per-cluster pairwise pass runs inside
  `groupby(cluster).map_groups` — per-task memory is O(cap**2) because
  oversized clusters are compared in id-ordered chunks against the kept
  set, never materialized as one Gram matrix.

The reference engine has no vector operations — this module is part of the
training-data superset (same family as ops/dedup.py / ops/similarity.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


# ---------------------------------------------------------------- k-means


class _PartialSums:
    """One batch → k rows of (cluster, count, sum-vector) partials.

    Assignment is Euclidean argmin via the expanded form
    argmin_c |v|² - 2·v·c + |c|²  =  argmax_c (v·c - |c|²/2), so the whole
    batch assigns with one matmul; the per-cluster sums are a second
    matmul against the one-hot membership matrix (BLAS, no row loop).
    Task pool (stateless beyond one ray.get): centroids are tiny and the
    fetch is zero-copy from the local object store."""

    def __init__(self, centroids_ref, vec_col: str):
        self.centroids_ref = centroids_ref
        self.vec_col = vec_col
        self._c = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._c is None:
            self._c = ray.get(self.centroids_ref)
        c = self._c
        vecs = _as_matrix(batch[self.vec_col].values)
        scores = vecs @ c.T - 0.5 * np.einsum("ij,ij->i", c, c)
        assign = np.argmax(scores, axis=1)
        onehot = np.zeros((len(vecs), len(c)), dtype=np.float64)
        onehot[np.arange(len(vecs)), assign] = 1.0
        sums = onehot.T @ vecs              # (k, dim)
        counts = onehot.sum(axis=0)         # (k,)
        live = counts > 0
        return pd.DataFrame({
            "cluster": np.arange(len(c), dtype=np.int64)[live],
            "n": counts[live].astype(np.int64),
            "vsum": list(sums[live]),
        })


class _Assign:
    def __init__(self, centroids_ref, vec_col: str):
        self.centroids_ref = centroids_ref
        self.vec_col = vec_col
        self._c = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._c is None:
            self._c = ray.get(self.centroids_ref)
        c = self._c
        vecs = _as_matrix(batch[self.vec_col].values)
        scores = vecs @ c.T - 0.5 * np.einsum("ij,ij->i", c, c)
        out = batch.copy()
        out["cluster"] = np.argmax(scores, axis=1).astype(np.int64)
        return out


def init_centroids(ds: rd.Dataset, k: int, *, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Deterministic seed: the vectors of the k smallest ids.

    Per-batch local min-k then a driver merge of O(k × num_blocks) rows —
    no sort shuffle, corpus never moves."""
    def local_mink(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[id_col, vec_col]].nsmallest(k, id_col)

    top = ds.map_batches(local_mink, batch_format="pandas").take_all()
    top.sort(key=lambda r: r[id_col])
    return _as_matrix([r[vec_col] for r in top[:k]])


@dataclass
class KMeansResult:
    centroids: np.ndarray      # (k, dim) final centroids
    assignments: rd.Dataset    # input columns + int64 `cluster`
    sizes: np.ndarray          # (k,) final member counts


def _merge_partials(cluster: np.ndarray, n: np.ndarray,
                    vsum: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Merge partial (cluster, n, vsum) rows → one row per present cluster.

    Each (cluster, dim) column is summed in ascending-VALUE order
    (lexsort by (cluster, value) + add.reduceat): the result is a pure
    function of the partial multiset, so it is identical no matter what
    order Ray delivered the blocks in — and identical whether the merge
    runs on the driver or inside a per-cluster groupby task (same
    multiset, same sorted order → bit-equal). Vectorized: dim lexsorts of
    len(partials) elements, no Python per-(cluster, dim) loop."""
    order = np.argsort(cluster, kind="stable")
    c = cluster[order]
    n = n[order]
    vsum = vsum[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(c)) + 1])
    present = c[starts]
    counts = np.add.reduceat(n, starts)
    sums = np.empty((len(starts), vsum.shape[1]), dtype=np.float64)
    for d in range(vsum.shape[1]):
        o = np.lexsort((vsum[:, d], c))
        sums[:, d] = np.add.reduceat(vsum[o, d], starts)
    return present, counts, sums


def _merge_partials_group(df: pd.DataFrame) -> pd.DataFrame:
    """groupby(cluster).map_groups tree-reduce stage: collapse ONE
    cluster's partials to a single row with the same sorted-order sum the
    driver merge uses (bit-identical by construction)."""
    present, counts, sums = _merge_partials(
        df["cluster"].to_numpy(np.int64), df["n"].to_numpy(np.int64),
        np.stack([np.asarray(v, dtype=np.float64) for v in df["vsum"]]))
    return pd.DataFrame({"cluster": present, "n": counts,
                         "vsum": list(sums)})


#: above this many expected partial rows (k × num_blocks), each Lloyd
#: iteration tree-reduces the partials to k rows via groupby("cluster")
#: before the driver merge; below it, the driver merges directly.
#: 1 M rows × (dim × 8 B) ≈ 0.5 GB at dim=64 — a safe driver bound.
TREE_REDUCE_ROWS = 1 << 20


def kmeans(ds: rd.Dataset, k: int, *, iters: int = 5,
           vec_col: str = "embedding", id_col: str = "vec_id",
           batch_size: int = 4096,
           tree_reduce_rows: int = TREE_REDUCE_ROWS) -> KMeansResult:
    """Distributed Lloyd iteration to a fixed (deterministic) step count.

    Empty clusters keep their previous centroid (standard Lloyd
    convention). Partial volume per iteration is O(k × num_blocks × dim)
    small rows; when that exceeds ``tree_reduce_rows`` a per-cluster
    groupby tree-reduce collapses it to k rows before the driver merge
    (bit-identical result — see :func:`_merge_partials`)."""
    work = ds.select_columns([id_col, vec_col]).materialize()
    centroids = init_centroids(work, k, vec_col=vec_col, id_col=id_col)
    if len(centroids) < k:
        raise ValueError(f"kmeans: corpus has fewer than k={k} rows")

    est_partial_rows = k * work.num_blocks()
    sizes = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        cref = ray.put(centroids)
        partials_ds = work.map_batches(
            _PartialSums(cref, vec_col), batch_format="pandas",
            batch_size=batch_size)
        if est_partial_rows > tree_reduce_rows:
            partials_ds = partials_ds.groupby("cluster").map_groups(
                _merge_partials_group, batch_format="pandas")
        # driver pull is bounded: ≤ min(est_partial_rows, tree_reduce_rows)
        # rows on the direct path, exactly ≤ k rows on the tree path
        pdf = partials_ds.to_pandas()
        present, counts_p, sums = _merge_partials(
            pdf["cluster"].to_numpy(np.int64), pdf["n"].to_numpy(np.int64),
            np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["vsum"]]))
        counts = np.zeros(k, dtype=np.int64)
        counts[present] = counts_p
        new = centroids.copy()
        new[present] = sums / counts_p[:, None]
        centroids, sizes = new, counts

    cref = ray.put(centroids)
    assigned = ds.map_batches(_Assign(cref, vec_col),
                              batch_format="pandas", batch_size=batch_size)
    return KMeansResult(centroids=centroids, assignments=assigned,
                        sizes=sizes)


# -------------------------------------------------------------- SemDeDup


def _greedy_group_dedup(df: pd.DataFrame, *, vec_col: str, id_col: str,
                        tau: float, cap: int) -> pd.DataFrame:
    """Greedy id-ordered dedup of ONE cluster: a row is kept iff its max
    cosine against every already-kept row is < tau; otherwise it drops
    with rep = the most-similar kept row (ties → lowest kept id).
    Deterministic (pure function of the id-sorted member list).

    Memory: candidates are processed in id-ordered chunks of ≤cap rows;
    each chunk compares against the running kept matrix — an oversized
    (skewed) cluster never materializes its full Gram matrix."""
    df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    ids = df[id_col].to_numpy()
    vecs = _as_matrix(df[vec_col].values)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms

    kept_idx: list[int] = []
    rep = np.full(len(ids), -1, dtype=np.int64)
    keep = np.zeros(len(ids), dtype=bool)
    for lo in range(0, len(ids), cap):
        hi = min(lo + cap, len(ids))
        block = unit[lo:hi]
        # one matmul vs everything kept before this block, one Gram matrix
        # for within-block pairs — the greedy scan below only indexes them
        sim_prev = (block @ unit[kept_idx].T) if kept_idx else \
            np.zeros((hi - lo, 0))
        gram = block @ block.T
        kept_before = len(kept_idx)
        local_kept: list[int] = []  # block-relative indices kept this block
        for i in range(hi - lo):
            # candidates in ascending-id order: prior-kept then block-kept;
            # argmax returns the FIRST max, i.e. ties go to the lowest id
            sims = np.concatenate([sim_prev[i], gram[i, local_kept]]) \
                if local_kept else sim_prev[i]
            j = int(np.argmax(sims)) if sims.size else -1
            if j >= 0 and sims[j] >= tau:
                src = kept_idx[j] if j < kept_before \
                    else lo + local_kept[j - kept_before]
                rep[lo + i] = ids[src]
            else:
                keep[lo + i] = True
                kept_idx.append(lo + i)
                local_kept.append(i)
    return pd.DataFrame({
        id_col: ids,
        "cluster": df["cluster"].to_numpy(),
        "is_kept": keep,
        "rep_id": rep,
    })


def semantic_dedup(ds: rd.Dataset, *, tau: float = 0.97, k: int | None = None,
                   iters: int = 3, vec_col: str = "embedding",
                   id_col: str = "vec_id", target_cluster: int = 512,
                   cap: int = 2048) -> rd.Dataset:
    """SemDeDup: k-means partition, then greedy cosine dedup per cluster.

    k defaults to ceil(N / target_cluster) so the expected within-cluster
    pairwise work is O(N × target_cluster), linear in the corpus. Returns
    (id, cluster, is_kept, rep_id) — rep_id is the kept near-duplicate a
    dropped row collapsed into (-1 for kept rows)."""
    if k is None:
        n = ds.count()
        k = max(1, math.ceil(n / target_cluster))
    res = kmeans(ds.select_columns([id_col, vec_col]), k, iters=iters,
                 vec_col=vec_col, id_col=id_col)

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        return _greedy_group_dedup(df, vec_col=vec_col, id_col=id_col,
                                   tau=tau, cap=cap)

    return res.assignments.groupby("cluster").map_groups(
        dedup_group, batch_format="pandas")


# ------------------------------------------- fixed-centroid (oracle-able)


def _lower_id_winner_group(df: pd.DataFrame, *, vec_col: str, id_col: str,
                           tau: float, cap: int) -> pd.DataFrame:
    """First-order per-cluster winner step: a row DROPS iff some LOWER-id
    row in the same cluster has cosine >= tau; rep = the max-cosine such
    row (ties -> lowest id). Unlike the greedy pass this is
    order-1 (candidates are ALL lower-id rows, not just kept ones), which
    makes it expressible as one SQL self-join + window -- the DuckDB
    oracle for the driver's `semantic_dedup` row. Chunked like the greedy
    pass so a skewed cluster never builds one full Gram matrix."""
    df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    ids = df[id_col].to_numpy()
    vecs = _as_matrix(df[vec_col].values)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms

    rep = np.full(len(ids), -1, dtype=np.int64)
    keep = np.ones(len(ids), dtype=bool)
    for lo in range(0, len(ids), cap):
        hi = min(lo + cap, len(ids))
        sims = unit[lo:hi] @ unit[:hi].T       # (chunk, all-ids <= chunk max)
        for i in range(hi - lo):
            row = sims[i, :lo + i]             # strictly lower-id candidates
            if row.size == 0:
                continue
            j = int(np.argmax(row))            # first max -> lowest id
            if row[j] >= tau:
                keep[lo + i] = False
                rep[lo + i] = ids[j]
    return pd.DataFrame({
        id_col: ids,
        "cluster": df["cluster"].to_numpy(),
        "is_kept": keep,
        "rep_id": rep,
    })


def fixed_centroid_dedup(ds: rd.Dataset, *, tau: float, k: int,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         cap: int = 2048) -> rd.Dataset:
    """SemDeDup's two distributed stages with DRIVER-CHECKABLE semantics:
    assignment against the PINNED deterministic init centroids (the k
    smallest-id vectors, zero Lloyd iterations) + the first-order
    lower-id winner step per cluster. Every step is expressible in ANSI
    SQL (CROSS JOIN argmin assignment, self-join + window winner), so the
    driver can hash-compare it against DuckDB; the full iterative
    k-means/greedy path (`semantic_dedup`) stays gated by
    tests/test_clustering.py."""
    res = kmeans(ds.select_columns([id_col, vec_col]), k, iters=0,
                 vec_col=vec_col, id_col=id_col)

    def winner_group(df: pd.DataFrame) -> pd.DataFrame:
        return _lower_id_winner_group(df, vec_col=vec_col, id_col=id_col,
                                      tau=tau, cap=cap)

    return res.assignments.groupby("cluster").map_groups(
        winner_group, batch_format="pandas")
