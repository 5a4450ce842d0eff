"""BM25 keyword scoring — bit-exact vs the self-contained DuckDB oracle
and a naive single-process reference."""

import math

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMALL

TERMS = ["join", "hash", "vector", "merge"]


@pytest.mark.usefixtures("ray_session")
class TestBM25:
    def test_bit_exact_vs_duckdb_oracle(self, duck):
        import duckdb
        import ray.data as rd

        from qwery_ray.ops.bm25 import bm25_oracle_sql, bm25_scores

        ds = rd.read_parquet(f"{SF_SMALL}/documents.parquet",
                             columns=["doc_id", "text"])
        got = bm25_scores(ds, TERMS).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF_SMALL}/documents.parquet')")
        exp = con.execute(bm25_oracle_sql(TERMS)).df() \
            .sort_values("doc_id").reset_index(drop=True)
        con.close()
        assert len(got) == len(exp) == 500
        gb = got["score"].to_numpy()
        eb = exp["score"].to_numpy()
        assert (gb.view(np.int64) == eb.view(np.int64)).all()
        assert gb.max() > 0  # the corpus actually contains the terms

    def test_matches_naive_reference(self):
        import re

        import ray.data as rd

        from qwery_ray.ops.bm25 import B, K1, bm25_scores

        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta beta gamma", "beta", "gamma gamma delta",
                     "no match here"],
        })
        terms = ["beta", "gamma"]
        # naive reference
        n = len(docs)
        dl = docs.text.map(lambda s: len(s.split())).to_numpy(float)
        avgdl = float(dl.sum()) / n
        scores = np.zeros(n)
        for t in terms:
            tf = docs.text.map(
                lambda s: len(re.findall(rf"(?a)\b{t}\b", s))).to_numpy(float)
            df = int((tf > 0).sum())
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            scores = scores + idf * (tf / (tf + K1 * (1.0 - B + B * dl / avgdl)))

        got = bm25_scores(rd.from_pandas(docs), terms).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        np.testing.assert_array_equal(got["score"].to_numpy(), scores)
        assert got["score"].iloc[3] == 0.0

    def test_block_layout_invariance(self):
        """Same scores at 1 block and 8 blocks: the df/dl partials are
        integers, so the merged stats are exact at any layout."""
        import ray.data as rd

        from qwery_ray.ops.bm25 import bm25_scores

        outs = []
        for nblocks in (1, 8):
            ds = rd.read_parquet(f"{SF_SMALL}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=nblocks)
            df = bm25_scores(ds, TERMS).to_pandas().sort_values("doc_id")
            outs.append(df["score"].to_numpy())
        assert (outs[0].view(np.int64) == outs[1].view(np.int64)).all()
