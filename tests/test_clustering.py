"""Distributed k-means + SemDeDup vs independent naive numpy references."""

import math

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMALL


def _load_embeddings():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t.column("embedding").to_pylist()])
    order = np.argsort(ids)
    return ids[order], vecs[order]


def naive_kmeans(ids, vecs, k, iters):
    """Reference Lloyd: same init (k smallest ids), Euclidean argmin with
    first-max tie rule, exactly-rounded (fsum) centroid means."""
    centroids = vecs[:k].copy()
    for _ in range(iters):
        scores = vecs @ centroids.T - 0.5 * np.einsum(
            "ij,ij->i", centroids, centroids)
        assign = np.argmax(scores, axis=1)
        new = centroids.copy()
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                new[c] = [math.fsum(members[:, d]) / len(members)
                          for d in range(vecs.shape[1])]
        centroids = new
    scores = vecs @ centroids.T - 0.5 * np.einsum(
        "ij,ij->i", centroids, centroids)
    return centroids, np.argmax(scores, axis=1)


def naive_semdedup(ids, vecs, assign, tau):
    """Reference greedy per-cluster dedup: id order, keep iff max cosine
    vs kept < tau, rep = most-similar kept (ties -> lowest id)."""
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms
    keep = {}
    rep = {}
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]  # ids sorted ascending already
        kept = []
        for i in idx:
            best_j, best_s = -1, -np.inf
            for j in kept:
                s = float(unit[i] @ unit[j])
                if s > best_s:
                    best_j, best_s = j, s
            if best_j >= 0 and best_s >= tau:
                keep[ids[i]] = False
                rep[ids[i]] = ids[best_j]
            else:
                keep[ids[i]] = True
                rep[ids[i]] = -1
                kept.append(i)
    return keep, rep


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_matches_naive_reference(self):
        import ray.data as rd

        from qwery_ray.ops.clustering import kmeans

        ids, vecs = _load_embeddings()
        ref_cent, ref_assign = naive_kmeans(ids, vecs, k=8, iters=4)

        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        res = kmeans(ds, 8, iters=4)
        np.testing.assert_allclose(res.centroids, ref_cent, rtol=1e-12)

        df = res.assignments.to_pandas().sort_values("vec_id")
        got = df["cluster"].to_numpy()
        assert (got == ref_assign).all()
        assert res.sizes.sum() == len(ids)

    def test_block_layout_invariance(self):
        """Same assignments at 2 blocks and 16 blocks: the fsum partial
        merge keeps centroid drift below any assignment margin."""
        import ray.data as rd

        from qwery_ray.ops.clustering import kmeans

        outs = []
        for nblocks in (2, 16):
            ds = rd.read_parquet(
                f"{SF_SMALL}/embeddings.parquet",
                columns=["vec_id", "embedding"],
                override_num_blocks=nblocks)
            res = kmeans(ds, 8, iters=4, batch_size=64)
            df = res.assignments.to_pandas().sort_values("vec_id")
            outs.append(df["cluster"].to_numpy())
        assert (outs[0] == outs[1]).all()

    def test_tree_reduce_path_bit_equal(self):
        """Forcing the groupby tree-reduce (threshold 0) must give the
        BIT-identical centroids of the direct driver merge: both sum each
        cluster's partial multiset in the same sorted-value order."""
        import ray.data as rd

        from qwery_ray.ops.clustering import kmeans

        outs = []
        for thresh in (1 << 20, 0):
            ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                                 columns=["vec_id", "embedding"],
                                 override_num_blocks=8)
            res = kmeans(ds, 8, iters=3, batch_size=64,
                         tree_reduce_rows=thresh)
            outs.append(res)
        assert (outs[0].centroids == outs[1].centroids).all()
        assert (outs[0].sizes == outs[1].sizes).all()

    def test_large_k_tree_path_matches_naive(self):
        """SemDeDup-style large k (k = N/8 here) through the forced tree
        path still matches the naive fsum reference within 1e-12."""
        import ray.data as rd

        from qwery_ray.ops.clustering import kmeans

        ids, vecs = _load_embeddings()
        k = max(2, len(ids) // 8)
        ref_cent, ref_assign = naive_kmeans(ids, vecs, k=k, iters=2)
        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                             columns=["vec_id", "embedding"],
                             override_num_blocks=4)
        res = kmeans(ds, k, iters=2, tree_reduce_rows=0)
        np.testing.assert_allclose(res.centroids, ref_cent, rtol=1e-12)
        got = res.assignments.to_pandas().sort_values("vec_id")[
            "cluster"].to_numpy()
        assert (got == ref_assign).all()

    def test_k_larger_than_corpus_raises(self):
        import ray.data as rd

        from qwery_ray.ops.clustering import kmeans

        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet").limit(3)
        with pytest.raises(ValueError):
            kmeans(ds, 8, iters=1)


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    def test_matches_naive_reference(self):
        import ray.data as rd

        from qwery_ray.ops.clustering import kmeans, semantic_dedup

        ids, vecs = _load_embeddings()
        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        # isolate the dedup logic against the (already-verified) kmeans
        res = kmeans(ds, 8, iters=3)
        adf = res.assignments.to_pandas().sort_values("vec_id")
        ref_keep, ref_rep = naive_semdedup(
            ids, vecs, adf["cluster"].to_numpy(), tau=0.9)

        out = semantic_dedup(ds, tau=0.9, k=8, iters=3).to_pandas() \
            .sort_values("vec_id")
        assert out["is_kept"].map(bool).tolist() == \
            [ref_keep[i] for i in out["vec_id"]]
        assert out["rep_id"].tolist() == [ref_rep[i] for i in out["vec_id"]]

    def test_planted_duplicates_found(self):
        """Exact copies of existing vectors must always drop (cos = 1)."""
        import ray.data as rd

        from qwery_ray.ops.clustering import semantic_dedup

        ids, vecs = _load_embeddings()
        n = len(ids)
        dup_src = ids[:20]
        rows = pd.DataFrame({
            "vec_id": np.concatenate([ids, np.arange(n, n + 20) + ids[-1] + 1]),
            "embedding": list(vecs) + [vecs[i].copy() for i in range(20)],
        })
        ds = rd.from_pandas(rows)
        out = semantic_dedup(ds, tau=0.999, k=8, iters=2).to_pandas()
        planted = out[out["vec_id"] > ids[-1]].sort_values("vec_id")
        assert not planted["is_kept"].any()
        assert planted["rep_id"].tolist() == list(dup_src)

    def test_chunked_cap_equals_unchunked(self):
        """cap smaller than the cluster size must not change the result."""
        import ray.data as rd

        from qwery_ray.ops.clustering import semantic_dedup

        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        a = semantic_dedup(ds, tau=0.9, k=4, iters=2, cap=2048) \
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        b = semantic_dedup(ds, tau=0.9, k=4, iters=2, cap=16) \
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def naive_first_order_dedup(ids, vecs, assign, tau):
    """Reference for the ORACLE-ABLE variant: a row drops iff ANY lower-id
    cluster-mate (kept or not) has cosine >= tau; rep = the max-cosine
    such row (ties -> lowest id)."""
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms
    keep, rep = {}, {}
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]  # ids ascending already
        for pos, i in enumerate(idx):
            best_j, best_s = -1, -np.inf
            for j in idx[:pos]:
                s = float(unit[i] @ unit[j])
                if s > best_s:
                    best_j, best_s = j, s
            if best_j >= 0 and best_s >= tau:
                keep[ids[i]], rep[ids[i]] = False, ids[best_j]
            else:
                keep[ids[i]], rep[ids[i]] = True, -1
    return keep, rep


@pytest.mark.usefixtures("ray_session")
class TestFixedCentroidDedup:
    """The r5 driver-checkable variant (pinned centroids, first-order
    winner) — the ops gate behind the `semantic_dedup` driver row."""

    def test_matches_naive_reference(self):
        import ray.data as rd

        from qwery_ray.ops.clustering import fixed_centroid_dedup

        ids, vecs = _load_embeddings()
        # pinned init = the 8 smallest-id vectors, zero Lloyd iterations
        c = vecs[:8]
        scores = vecs @ c.T - 0.5 * np.einsum("ij,ij->i", c, c)
        assign = np.argmax(scores, axis=1)
        ref_keep, ref_rep = naive_first_order_dedup(ids, vecs, assign, 0.45)

        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = fixed_centroid_dedup(ds, tau=0.45, k=8).to_pandas() \
            .sort_values("vec_id")
        assert out["is_kept"].map(bool).tolist() == \
            [ref_keep[i] for i in out["vec_id"]]
        assert out["rep_id"].tolist() == [ref_rep[i] for i in out["vec_id"]]
        assert (~out["is_kept"]).sum() > 0  # real drops at gate scale

    def test_chunked_cap_invariant(self):
        import ray.data as rd

        from qwery_ray.ops.clustering import fixed_centroid_dedup

        ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        big = fixed_centroid_dedup(ds, tau=0.45, k=8, cap=4096).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        small = fixed_centroid_dedup(ds, tau=0.45, k=8, cap=7).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(big, small)
