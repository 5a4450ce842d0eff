"""DSIR importance weights (ops/curation.py dsir_*): hashed unigram+bigram
bag models, per-doc importance log-weights, Gumbel top-k resampling.

Gated three ways: bit-exact DuckDB oracle parity (same md5 bucketing, same
Laplace smoothing; weights snapped at 1e-6 on both sides), an independent
naive pandas reference, and block-layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from conftest import SF_TINY

from qwery_ray.ops.curation import (
    _md5_bucket,
    dsir_oracle_sql,
    dsir_sample,
    dsir_weights,
)

DOCS = f"{SF_TINY}/documents.parquet"


def _snap(x: np.ndarray, k: int = 6) -> np.ndarray:
    # DuckDB ROUND(x*1e6, 0)/1e6 = half away from zero
    return np.copysign(np.floor(np.abs(x) * 10.0**k + 0.5), x) / 10.0**k


def naive_dsir(df: pd.DataFrame, *, target_mod=10, n_buckets=4096,
               alpha=1.0) -> pd.DataFrame:
    """Independent per-doc reference (python loops, hashlib directly)."""
    import hashlib

    def grams(t):
        ws = (t or "").split(" ")
        return ws + [a + " " + b for a, b in zip(ws, ws[1:])]

    def bkt(g):
        return int.from_bytes(hashlib.md5(g.encode()).digest()[8:],
                              "little") % n_buckets

    t = np.zeros(n_buckets)
    r = np.zeros(n_buckets)
    per_doc = {}
    for _, row in df.iterrows():
        bs = [bkt(g) for g in grams(row["text"])]
        per_doc[row["doc_id"]] = bs
        for b in bs:
            r[b] += 1
            if row["doc_id"] % target_mod == 0:
                t[b] += 1
    lr = (np.log((t + alpha) / (t.sum() + alpha * n_buckets))
          - np.log((r + alpha) / (r.sum() + alpha * n_buckets)))
    out = [{"doc_id": d, "n_grams": len(bs),
            "log_weight": float(sum(lr[b] for b in bs))}
           for d, bs in per_doc.items()]
    return pd.DataFrame(out).sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pq.read_table(DOCS).to_pandas()


class TestDsirWeights:
    def test_matches_duckdb_oracle_bitexact(self, ray_session, docs):
        ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
        mine = dsir_weights(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        mine["log_weight"] = _snap(mine["log_weight"].to_numpy())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{DOCS}')")
        orc = con.execute(dsir_oracle_sql()).df()
        pd.testing.assert_frame_equal(mine, orc[mine.columns],
                                      check_exact=True)

    def test_matches_naive_reference(self, ray_session, docs):
        sub = docs.head(60)
        ds = rd.from_pandas(sub[["doc_id", "text"]])
        mine = dsir_weights(ds, target_mod=7, n_buckets=512, alpha=0.5) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        ref = naive_dsir(sub, target_mod=7, n_buckets=512, alpha=0.5)
        assert (mine["n_grams"].to_numpy() == ref["n_grams"].to_numpy()).all()
        np.testing.assert_allclose(mine["log_weight"], ref["log_weight"],
                                   rtol=0, atol=1e-9)

    def test_layout_invariance(self, ray_session, docs):
        outs = []
        for nparts in (1, 6):
            ds = rd.read_parquet(DOCS, columns=["doc_id", "text"]) \
                .repartition(nparts)
            outs.append(dsir_weights(ds, approx_docs=len(docs)).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        # same doc ⇒ identical gram sequence ⇒ identical float sum
        pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)

    def test_target_docs_score_higher(self, ray_session, docs):
        # target docs ARE the target distribution — their mean weight must
        # exceed the non-target mean (the op's entire point)
        ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
        w = dsir_weights(ds).to_pandas()
        tgt = w[w.doc_id % 10 == 0].log_weight.mean()
        rest = w[w.doc_id % 10 != 0].log_weight.mean()
        assert tgt > rest


class TestDsirSample:
    def test_deterministic_topk(self, ray_session, docs):
        ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
        w = dsir_weights(ds)
        s1 = dsir_sample(w, 25).to_pandas().sort_values("doc_id")
        s2 = dsir_sample(w.repartition(5), 25).to_pandas() \
            .sort_values("doc_id")
        assert len(s1) == 25
        assert list(s1.doc_id) == list(s2.doc_id)

    def test_weight_shift_changes_selection_monotonically(self, ray_session):
        # doubling one doc's weight can only keep it or pull it INTO the
        # sample (Gumbel keys are fixed per id)
        rows = [{"doc_id": i, "log_weight": 0.0} for i in range(100)]
        base = dsir_sample(rd.from_items(rows), 10).to_pandas()
        boosted = [{"doc_id": i,
                    "log_weight": 50.0 if i == 99 else 0.0}
                   for i in range(100)]
        b = dsir_sample(rd.from_items(boosted), 10).to_pandas()
        assert 99 in set(b.doc_id)
        assert len(set(b.doc_id) - set(base.doc_id) - {99}) == 0


class TestDsirForcedScalePath:
    def test_bounded_groupby_path_equals_driver_fold(self, ray_session,
                                                     docs):
        # approx_docs above the 5M threshold forces the bounded
        # n_buckets-key groupby reduce; results must be identical
        ds1 = rd.read_parquet(DOCS, columns=["doc_id", "text"])
        small = dsir_weights(ds1, approx_docs=100).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        ds2 = rd.read_parquet(DOCS, columns=["doc_id", "text"])
        big = dsir_weights(ds2, approx_docs=10_000_000).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(small, big, check_exact=True)
