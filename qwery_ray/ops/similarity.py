"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: the exact baseline — numpy matmul per batch against a
  ray.put-broadcast query matrix, local top-k per batch, then a tiny
  groupby(query) merge. Shuffle volume is O(num_queries × k × num_batches),
  never the corpus.
- ivf_topk: the scale path — seeded sampled centroids, vectors assigned to
  nearest centroid (one extra column), queries probe the top-nprobe cells;
  recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchTopK:
    """Local cosine top-k of one batch against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        self.queries_ref = queries_ref
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self._q = None  # (query_ids, unit_matrix) — fetched once per actor

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._q is None:
            qids, qmat = ray.get(self.queries_ref)
            self._q = (np.asarray(qids), _unit(qmat))
        qids, qunit = self._q
        vecs = _unit(_as_matrix(batch[self.vec_col].values))
        ids = batch[self.id_col].values
        sim = qunit @ vecs.T  # (nq, batch)
        k = min(self.k, sim.shape[1])
        top = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
        rows = {
            "query_id": np.repeat(qids, k),
            "neighbor_id": ids[top].ravel(),
            "score": np.take_along_axis(sim, top, axis=1).ravel(),
        }
        return pd.DataFrame(rows)


def brute_force_topk(ds: rd.Dataset, query_ids, query_matrix: np.ndarray,
                     k: int = 10, *, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> rd.Dataset:
    """Exact cosine top-k for each query over the whole corpus."""
    ref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float64)))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["score", "neighbor_id"],
                             ascending=[False, True]).head(k)
        out = out.reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1)
        return out

    local = ds.map_batches(BatchTopK(ref, k, vec_col, id_col),
                           batch_format="pandas", batch_size=4096)
    return local.groupby("query_id").map_groups(merge, batch_format="pandas")


class IvfAssign:
    def __init__(self, centroids_ref, vec_col: str):
        self.centroids_ref = centroids_ref
        self.vec_col = vec_col
        self._c = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._c is None:
            self._c = _unit(ray.get(self.centroids_ref))
        vecs = _unit(_as_matrix(batch[self.vec_col].values))
        batch = batch.copy()
        batch["cell"] = np.argmax(vecs @ self._c.T, axis=1).astype(np.int64)
        return batch


def choose_num_cells(n: int, *, target_cell: int = 1024) -> int:
    """num_cells ≈ N / target_cell (clamped to [1, 65536]): cells stay
    ~target_cell vectors as the corpus grows, so per-query probe work is
    O(nprobe × target_cell) at ANY corpus size — the same corpus-derived
    auto-scaling idea as dedup.choose_nbits."""
    return int(min(65536, max(1, round(n / target_cell))))


def sample_centroids(ds: rd.Dataset, num_cells: int, *,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     seed: int = 42) -> np.ndarray:
    """Distributed seeded uniform centroid sample (r4 verdict item 4).

    Priority = the value-stable polars xxhash of the id column with
    ``seed``; the num_cells smallest priorities win (a uniform
    without-replacement sample, independent of block layout and delivery
    order). Per batch only a LOCAL top-num_cells candidate set survives
    (narrow id+vec rows), then one sort+limit over that already-thinned
    stream — the driver receives EXACTLY num_cells rows, O(cells) at any
    corpus size. The old ``random_sample().take(num_cells * 8)`` pulled up
    to ~524k raw vectors (≈1.6 GB at dim 768) to the driver at the
    65,536-cell clamp."""
    import polars as pl
    import pyarrow as pa

    def local_top(batch: pa.Table) -> pa.Table:
        prio = pl.from_arrow(batch.column(id_col)).hash(seed=seed) \
            .to_numpy().astype(np.uint64)
        if num_cells < len(batch):
            idx = np.argpartition(prio, num_cells - 1)[:num_cells]
        else:
            idx = np.arange(len(batch))
        t = batch.select([id_col, vec_col]).take(pa.array(idx))
        return t.append_column("__prio", pa.array(prio[idx],
                                                  type=pa.uint64()))

    top = ds.select_columns([id_col, vec_col]) \
        .map_batches(local_top, batch_format="pyarrow") \
        .sort(["__prio", id_col]).limit(num_cells).take_all()
    return _as_matrix([r[vec_col] for r in top])


def ivf_topk(ds: rd.Dataset, query_ids, query_matrix: np.ndarray,
             k: int = 10, *, vec_col: str = "embedding", id_col: str = "vec_id",
             num_cells: int | None = None, nprobe: int = 4,
             target_cell: int = 1024, seed: int = 42,
             approx_count: int | None = None) -> rd.Dataset:
    """IVF-style ANN: sample centroids (seeded) from the corpus, assign each
    vector to its cell, probe only the nprobe closest cells per query.

    ``num_cells`` defaults to :func:`choose_num_cells` of the corpus size
    (pass ``approx_count`` — e.g. parquet footer row counts — to skip the
    counting pass)."""
    n = approx_count if approx_count is not None else ds.count()
    if num_cells is None:
        num_cells = choose_num_cells(n, target_cell=target_cell)
    nprobe = min(nprobe, num_cells)
    centroids = sample_centroids(ds, num_cells, vec_col=vec_col,
                                 id_col=id_col, seed=seed)
    cref = ray.put(centroids)

    qmat = np.asarray(query_matrix, dtype=np.float64)
    qcells = np.argsort(-(_unit(qmat) @ _unit(centroids).T), axis=1)[:, :nprobe]
    # queries grouped by probed cell: query q participates in cells qcells[q]
    probe = {}
    for qi, cells in enumerate(qcells):
        for c in cells:
            probe.setdefault(int(c), []).append(qi)
    probe_ref = ray.put((list(query_ids), qmat, probe))

    def batch_cell_topk(df: pd.DataFrame) -> pd.DataFrame:
        """Per-BATCH probe: rows of this batch belonging to a probed cell
        score against that cell's queries; local top-k per query. No cell
        is ever materialized whole — per-task memory is bounded by the
        batch size regardless of cell skew — and the corpus never
        shuffles (the old groupby('cell') moved every vector AND pinned
        an entire cell into one pandas frame). Task pool: the probe table
        arrives via a zero-copy ray.get per task, no actor spin-up."""
        qids, qmat_, probe_ = ray.get(probe_ref)
        cells = df["cell"].values
        ids_all = df[id_col].values
        vecs_all = _unit(_as_matrix(df[vec_col].values))
        out_q, out_n, out_s = [], [], []
        for cell in np.unique(cells):
            qidx = probe_.get(int(cell), [])
            if not qidx:
                continue
            m = cells == cell
            vecs, ids = vecs_all[m], ids_all[m]
            sim = _unit(qmat_[qidx]) @ vecs.T
            kk = min(k, sim.shape[1])
            top = np.argpartition(-sim, kth=kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat([qids[i] for i in qidx], kk))
            out_n.append(ids[top].ravel())
            out_s.append(np.take_along_axis(sim, top, axis=1).ravel())
        if not out_q:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64")})
        return pd.DataFrame({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "score": np.concatenate(out_s),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates("neighbor_id") \
            .sort_values(["score", "neighbor_id"],
                         ascending=[False, True]).head(k)
        out = out.reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1)
        return out

    assigned = ds.map_batches(IvfAssign(cref, vec_col), batch_format="pandas")
    local = assigned.map_batches(batch_cell_topk, batch_format="pandas",
                                 batch_size=4096)
    return local.groupby("query_id").map_groups(merge, batch_format="pandas")
