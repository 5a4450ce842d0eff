"""connected_components: transitive closure of near-dup pairs.

The endgame of pair-based dedup (SURVEY.md §2 training-data mandate):
components get min-id labels so representatives are deterministic. Gates:
a naive union-find reference, equality between the driver path and the
FORCED distributed min-label-propagation path (small_limit=0), planted
chain/star/cycle topologies, and integration with the minhash pair op."""

import numpy as np
import pandas as pd
import pytest

from conftest import SF_TINY, to_pandas


def _naive_components(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    nodes = sorted({n for e in edges for n in e})
    return {n: find(n) for n in nodes}


def _pairs_ds(edges):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))


TOPOLOGIES = {
    "chain": [(1, 2), (2, 3), (3, 4), (10, 11)],
    "star": [(5, 1), (5, 2), (5, 3), (5, 4)],
    "cycle": [(1, 2), (2, 3), (3, 1), (7, 8), (8, 9), (9, 7)],
    "self_dup": [(1, 2), (2, 1), (1, 2)],
    "merge_late": [(1, 2), (3, 4), (2, 3)],
}


class TestConnectedComponents:
    @pytest.mark.parametrize("name", sorted(TOPOLOGIES))
    def test_topologies_vs_naive(self, ray_session, name):
        from qwery_ray.ops.dedup import connected_components

        edges = TOPOLOGIES[name]
        got = to_pandas(connected_components(_pairs_ds(edges)))
        want = _naive_components(edges)
        assert dict(zip(got["id"], got["component"])) == want

    @pytest.mark.parametrize("name", sorted(TOPOLOGIES))
    def test_distributed_path_matches_driver(self, ray_session, name):
        from qwery_ray.ops.dedup import connected_components

        edges = TOPOLOGIES[name]
        a = to_pandas(connected_components(_pairs_ds(edges))) \
            .sort_values("id", ignore_index=True)
        b = to_pandas(connected_components(
            _pairs_ds(edges), small_limit=0)) \
            .sort_values("id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)

    @pytest.mark.parametrize("name", sorted(TOPOLOGIES))
    def test_join_push_path_matches_driver(self, ray_session, name):
        """FORCED label-join path (label_broadcast_limit=0): per-round
        pushes run as Dataset.join, convergence checked via the
        monotone Σcomponent — no driver label collection anywhere."""
        from qwery_ray.ops.dedup import connected_components

        edges = TOPOLOGIES[name]
        a = to_pandas(connected_components(_pairs_ds(edges))) \
            .sort_values("id", ignore_index=True)
        b = to_pandas(connected_components(
            _pairs_ds(edges), small_limit=0, label_broadcast_limit=0)) \
            .sort_values("id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)

    def test_random_graph_join_push_path(self, ray_session):
        from qwery_ray.ops.dedup import connected_components

        rng = np.random.default_rng(11)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 120, size=(200, 2)) if a != b]
        want = _naive_components(edges)
        got = to_pandas(connected_components(
            _pairs_ds(edges), small_limit=0, label_broadcast_limit=0))
        assert dict(zip(got["id"], got["component"])) == want

    def test_random_graph_both_paths(self, ray_session):
        from qwery_ray.ops.dedup import connected_components

        rng = np.random.default_rng(7)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 200, size=(300, 2)) if a != b]
        want = _naive_components(edges)
        for limit in (2_000_000, 0):
            got = to_pandas(connected_components(
                _pairs_ds(edges), small_limit=limit))
            assert dict(zip(got["id"], got["component"])) == want, limit

    def test_empty_pairs(self, ray_session):
        from qwery_ray.ops.dedup import connected_components

        got = to_pandas(connected_components(_pairs_ds([])))
        assert len(got) == 0

    def test_minhash_pairs_integration(self, ray_session):
        # planted near-dups: docs 9000/9001/9002 are near-identical → the
        # pair set must close into ONE component labelled 9000
        import pyarrow as pa
        import ray.data as rd

        from qwery_ray.ops.dedup import (connected_components,
                                         minhash_lsh_candidates)

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark woods tonight") * 3
        rows = [(9000, base), (9001, base + " extra"),
                (9002, base + " extra words"),
                (1, "completely different text about other topics entirely "
                    "with nothing shared at all here")]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}))
        pairs = minhash_lsh_candidates(ds)
        comp = to_pandas(connected_components(pairs))
        lab = dict(zip(comp["id"], comp["component"]))
        assert lab.get(9001) == 9000 and lab.get(9002) == 9000
        assert 1 not in lab


class TestNearDedup:
    def test_end_to_end_keeps_representatives(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from qwery_ray.ops.dedup import near_dedup

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark woods tonight") * 3
        rows = [(9000, base), (9001, base + " extra"),
                (9002, base + " extra words"),
                (1, "completely different text about other topics entirely "
                    "with nothing shared at all here")]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}))
        kept = sorted(to_pandas(near_dedup(ds))["doc_id"])
        assert kept == [1, 9000]


class TestDropIdsFallback:
    """The shared loser filter (_drop_ids) used by exact_dedup AND
    near_dedup: forced anti-join path ≡ broadcast path."""

    def _corpus(self):
        import pyarrow as pa
        import ray.data as rd

        n = 50
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i % 17}" for i in range(n)])}))

    def test_forced_anti_join_equals_broadcast(self, ray_session):
        import numpy as np

        from qwery_ray.ops.dedup import _drop_ids

        ds = self._corpus()
        losers = np.array([3, 7, 20, 33, 41], dtype=np.int64)
        a = sorted(to_pandas(_drop_ids(ds, losers, "doc_id"))["doc_id"])
        b = sorted(to_pandas(_drop_ids(
            ds, losers, "doc_id", broadcast_limit=0))["doc_id"])
        assert a == b == [i for i in range(50) if i not in set(losers)]

    def test_near_dedup_forced_anti_join(self, ray_session, monkeypatch):
        import qwery_ray.ops.dedup as dd

        ds = self._corpus()  # 17 distinct texts, ids 0..49
        baseline = sorted(to_pandas(dd.exact_dedup(ds))["doc_id"])
        monkeypatch.setattr(dd, "LOSER_BROADCAST_LIMIT", 0)
        forced = sorted(to_pandas(dd.exact_dedup(ds))["doc_id"])
        assert forced == baseline == list(range(17))
