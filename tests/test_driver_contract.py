"""Simulates the driver's correctness gate: every queries() entry runs at
sf0.001 and, when an oracle_sql() entry exists, is compared against DuckDB
(row count + schema + order-insensitive values) exactly like the driver's
CORRECTNESS check. Catches name/shape drift before the real gate does."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_TINY, assert_frames_match, to_pandas

import __ray_entry__ as entrymod

ALL_QUERIES = sorted(entrymod.queries())
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = to_pandas(ds)
    assert len(df) > 0
    assert {"repo", "path", "content"} <= set(df.columns)


def test_every_query_has_oracle_or_reason():
    qs = entrymod.queries()
    missing = [n for n in qs if n not in ORACLES]
    # rows-only entries, each independently gated: doc_fingerprint by a
    # golden reference test, minhash by its in-query recall self-check,
    # kmeans/semantic_dedup by the naive-numpy references in
    # tests/test_clustering.py, pack_sequences/lm_quality_score by the
    # naive references + invariance gates in tests/test_packing.py (and
    # pack_sequences self-checks its invariants in-query)
    # bpe_tokens by the naive-reference + reconstruction-invariant tests
    # in tests/test_bpe.py
    assert set(missing) <= {"doc_fingerprint", "minhash_near_dups",
                            "embedding_kmeans", "semantic_dedup",
                            "pack_sequences", "lm_quality_score",
                            "using_sample", "bpe_tokens"}


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle(name, ray_session, duck):
    fn = entrymod.queries()[name]
    result = to_pandas(fn(SF_TINY))
    assert result is not None
    if name not in ORACLES:
        assert len(result) > 0  # rows-only check
        return
    oracle = duck.execute(ORACLES[name]).fetch_df()
    assert len(result) == len(oracle), \
        f"{name}: rows {len(result)} vs oracle {len(oracle)}"
    assert sorted(result.columns) == sorted(oracle.columns), \
        f"{name}: columns {sorted(result.columns)} vs {sorted(oracle.columns)}"
    assert_frames_match(result, oracle)
    # the driver hashes EXACT values — float columns must match bit-for-bit
    import numpy as np

    a = result.reindex(sorted(result.columns), axis=1)
    e = oracle.reindex(sorted(oracle.columns), axis=1)
    cols = list(a.columns)
    a = a.sort_values(cols, ignore_index=True)
    e = e.sort_values(cols, ignore_index=True)
    for c in cols:
        av, ev = a[c].to_numpy(), e[c].to_numpy()
        if av.dtype.kind == "f" or ev.dtype.kind == "f":
            av = av.astype(np.float64)
            ev = ev.astype(np.float64)
            assert np.array_equal(av, ev, equal_nan=True), \
                f"{name}: column {c} differs at bit level"
