"""Corpus-structure dedup ops (ops/corpus.py): token-block / line
first-occurrence dedup and duplicated-span statistics, each checked
bit-for-bit against a DuckDB replay of the same rule — including the
forced large-corpus paths (bucket-shuffled loser resolution and the
anti-join rebuild) which must agree with the broadcast path exactly."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_TINY

from qwery_ray.ops.corpus import (block_dedup_oracle_sql, dup_span_stats,
                                  dup_span_oracle_sql, line_dedup,
                                  token_block_dedup)

N_DOCS = pq.read_metadata(os.path.join(SF_TINY, "documents.parquet")).num_rows

_INT = {"doc_id": "int64", "n_units": "int64", "n_kept": "int64"}


def _docs():
    import ray.data as rd

    return rd.read_parquet(os.path.join(SF_TINY, "documents.parquet"),
                           columns=["doc_id", "text"])


class TestTokenBlockDedup:
    @pytest.fixture()
    def oracle(self, duck):
        return duck.execute(block_dedup_oracle_sql(block_tokens=16)).df() \
            .astype(_INT)

    @pytest.fixture()
    def small_path(self, ray_session):
        return token_block_dedup(_docs(), block_tokens=16,
                                 approx_docs=N_DOCS) \
            .sort("doc_id").to_pandas().reset_index(drop=True).astype(_INT)

    def test_vs_duckdb(self, small_path, oracle):
        pd.testing.assert_frame_equal(small_path, oracle)
        # the synthetic corpus genuinely contains cross-doc duplicates
        assert (oracle["n_units"].sum() - oracle["n_kept"].sum()) > 0

    def test_bucket_loser_path(self, ray_session, small_path):
        # approx_docs=None forces the coarse-bucket loser shuffle
        big = token_block_dedup(_docs(), block_tokens=16,
                                approx_docs=None) \
            .sort("doc_id").to_pandas().reset_index(drop=True).astype(_INT)
        pd.testing.assert_frame_equal(big, small_path)

    def test_anti_join_rebuild_path(self, ray_session, small_path):
        # loser_broadcast_limit=0 forces the anti-join + doc-bucket rebuild
        anti = token_block_dedup(_docs(), block_tokens=16,
                                 approx_docs=N_DOCS,
                                 loser_broadcast_limit=0) \
            .sort("doc_id").to_pandas().reset_index(drop=True).astype(_INT)
        pd.testing.assert_frame_equal(anti, small_path)


class TestLineDedup:
    @pytest.fixture()
    def corpus(self, tmp_path_factory):
        # multiline docs with heavy cross-doc line repetition + blank lines
        rng = np.random.default_rng(7)
        pool = [f"line {i} of shared pool" for i in range(40)]
        rows = []
        for d in range(120):
            n = int(rng.integers(1, 12))
            ls = [pool[int(rng.integers(0, 40))] if rng.random() < 0.6
                  else f"unique {d}-{j}" for j in range(n)]
            if rng.random() < 0.2:
                ls.insert(0, "")
            rows.append((d, "\n".join(ls)))
        p = tmp_path_factory.mktemp("linededup") / "d.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": [t for _, t in rows]}), str(p))
        return str(p)

    def test_vs_duckdb(self, ray_session, corpus, duck):
        import ray.data as rd

        got = line_dedup(rd.read_parquet(corpus), approx_docs=120) \
            .sort("doc_id").to_pandas().reset_index(drop=True).astype(_INT)
        duck.execute(
            f"CREATE OR REPLACE VIEW line_docs AS "
            f"SELECT * FROM read_parquet('{corpus}')")
        want = duck.execute(r"""
WITH l AS (
  SELECT doc_id, arr, unnest(generate_series(0, len(arr)-1)) AS ord
  FROM (SELECT doc_id, string_split(text, chr(10)) AS arr FROM line_docs)
), u AS (
  SELECT doc_id, ord, arr[ord+1] AS unit FROM l
), m AS (
  SELECT doc_id, ord, unit,
         (length(unit) < 1 OR doc_id*1048576+ord =
          min(doc_id*1048576+ord) OVER (PARTITION BY unit)) AS keep
  FROM u
)
SELECT doc_id, COUNT(*) AS n_units,
       COUNT(*) FILTER (WHERE keep) AS n_kept,
       COALESCE(string_agg(unit, chr(10) ORDER BY ord)
                FILTER (WHERE keep), '') AS text_dedup
FROM m GROUP BY doc_id ORDER BY doc_id""").df().astype(_INT)
        pd.testing.assert_frame_equal(got, want)
        # blank lines never dedup away; shared-pool lines do
        assert (want["n_units"].sum() - want["n_kept"].sum()) > 100


class TestDupSpanStats:
    @pytest.fixture()
    def oracle(self, duck):
        return duck.execute(dup_span_oracle_sql(w=8)).df().astype("int64")

    def test_vs_duckdb(self, ray_session, oracle):
        got = dup_span_stats(_docs(), w=8, approx_docs=N_DOCS) \
            .sort("doc_id").to_pandas().reset_index(drop=True) \
            .astype("int64")
        pd.testing.assert_frame_equal(got, oracle)
        assert (oracle["dup_tokens"] > 0).any()
        # coverage is a union of [i, i+w) windows — never exceeds ntok
        assert (oracle["dup_tokens"] <= oracle["ntok"]).all()

    def test_distributed_path(self, ray_session, oracle):
        got = dup_span_stats(_docs(), w=8, approx_docs=None) \
            .sort("doc_id").to_pandas().reset_index(drop=True) \
            .astype("int64")
        pd.testing.assert_frame_equal(got, oracle)


class TestGramEdgeCases:
    """Edge shapes for the vectorized rolling-hash gram path: empty docs,
    docs shorter than w (no gram rows, but a final-output row with
    dup_tokens=0), exactly-w docs, unicode tokens, and windows that would
    straddle a document boundary in the concatenated token stream (they
    must be masked out, never hashed across docs)."""

    @pytest.fixture()
    def edge_corpus(self, tmp_path_factory):
        docs = [
            (0, ""),                                   # empty
            (1, "one two three"),                      # < w tokens
            (2, "a b c d e f g h"),                    # exactly w = 8
            (3, "a b c d e f g h"),                    # exact duplicate of 2
            # same tokens split across two docs: doc 4 ends with the prefix
            # doc 5 starts with — a cross-boundary window would fabricate
            # a duplicate of doc 2/3's gram
            (4, "x y z a b c d"),
            (5, "e f g h p q r s"),
            (6, "héllo wörld … héllo wörld … héllo wörld … héllo wörld"),
        ]
        p = tmp_path_factory.mktemp("gramedge") / "d.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [t for _, t in docs]}), str(p))
        return str(p)

    def test_vs_duckdb(self, ray_session, edge_corpus, duck):
        import ray.data as rd

        got = dup_span_stats(rd.read_parquet(edge_corpus), w=8,
                             approx_docs=7) \
            .sort("doc_id").to_pandas().reset_index(drop=True) \
            .astype("int64")
        duck.execute(
            f"CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM read_parquet('{edge_corpus}')")
        want = duck.execute(dup_span_oracle_sql(w=8)).df().astype("int64")
        pd.testing.assert_frame_equal(got, want)
        # the exact-duplicate pair is fully covered; the boundary-straddle
        # docs are NOT (a cross-doc window must never count)
        by_id = got.set_index("doc_id")
        assert by_id.loc[2, "dup_tokens"] == 8
        assert by_id.loc[3, "dup_tokens"] == 8
        assert by_id.loc[4, "dup_tokens"] == 0
        assert by_id.loc[5, "dup_tokens"] == 0
        assert by_id.loc[0, "dup_tokens"] == 0 and by_id.loc[0, "ntok"] == 0
        assert by_id.loc[1, "dup_tokens"] == 0
