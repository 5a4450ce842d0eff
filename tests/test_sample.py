"""USING SAMPLE / TABLESAMPLE — deterministic content-hash sampling.

Documented divergence from DuckDB's RNG sampling: the engine keeps a row
iff the seeded xxhash of its content falls under the rate (percent) or is
among the N smallest (ROWS) — so retries, reruns and ANY block layout
reproduce the identical sample, which is what a resumable 100 TB pipeline
needs. Gates here assert determinism, layout invariance, exact-N, rate
bounds and seed sensitivity (no value oracle can exist across engines)."""

import pandas as pd
import pytest

from conftest import to_pandas


def run(engine, q):
    return to_pandas(engine.sql(q))


class TestSample:
    def test_percent_deterministic_and_in_range(self, engine):
        a = run(engine, "SELECT o_orderkey FROM orders USING SAMPLE 10% "
                        "ORDER BY o_orderkey")
        b = run(engine, "SELECT o_orderkey FROM orders USING SAMPLE 10% "
                        "ORDER BY o_orderkey")
        total = run(engine, "SELECT COUNT(*) AS n FROM orders")["n"][0]
        pd.testing.assert_frame_equal(a, b)
        assert 0.05 * total < len(a) < 0.15 * total

    def test_seed_changes_sample(self, engine):
        a = run(engine, "SELECT o_orderkey FROM orders USING SAMPLE "
                        "10% (bernoulli, 1) ORDER BY o_orderkey")
        b = run(engine, "SELECT o_orderkey FROM orders USING SAMPLE "
                        "10% (bernoulli, 2) ORDER BY o_orderkey")
        assert set(a["o_orderkey"]) != set(b["o_orderkey"])

    def test_rows_exact_and_layout_invariant(self, engine):
        a = run(engine, "SELECT o_orderkey FROM orders USING SAMPLE 25 ROWS "
                        "ORDER BY o_orderkey")
        b = run(engine, "SELECT o_orderkey FROM orders USING SAMPLE 25 ROWS "
                        "ORDER BY o_orderkey")
        assert len(a) == 25
        pd.testing.assert_frame_equal(a, b)

    def test_tablesample_and_method_forms(self, engine):
        total = run(engine, "SELECT COUNT(*) AS n FROM orders")["n"][0]
        f = run(engine, "SELECT COUNT(*) AS n FROM orders "
                        "TABLESAMPLE bernoulli(20%)")["n"][0]
        assert 0.12 * total < f < 0.28 * total
        g = run(engine, "SELECT COUNT(*) AS n FROM orders USING SAMPLE "
                        "reservoir(30) REPEATABLE (9)")["n"][0]
        assert g == 30

    def test_sampled_subquery(self, engine):
        h = run(engine, "SELECT COUNT(*) AS n FROM (SELECT * FROM orders "
                        "WHERE o_totalprice > 100000) q USING SAMPLE 50 ROWS")
        assert h["n"][0] == 50

    def test_sample_then_aggregate(self, engine):
        # the sample is a real source: downstream grouping works
        out = run(engine, "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
                          "USING SAMPLE 40 ROWS GROUP BY o_orderstatus")
        assert out["n"].sum() == 40

    def test_decompile_roundtrip(self, engine):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse

        q = "SELECT o_orderkey FROM orders USING SAMPLE 10% (BERNOULLI, 42)"
        stmt = parse(q)[0]
        again = parse(to_sql(stmt))[0]
        assert again.source == stmt.source
