"""[NOT] EXISTS subqueries — decorrelated to semi/anti joins (correlated
equality) or a single limit(1) probe (uncorrelated); verified against
DuckDB on the same parquet. Reference has no subqueries at all (SURVEY
§2.5) — this is part of the superset surface alongside IN (SELECT) and
correlated scalar subqueries."""

import pandas as pd


def _run(eng, duck, sql):
    mine = eng.sql(sql)
    mine = mine.to_pandas() if not isinstance(mine, pd.DataFrame) else mine
    oracle = duck.execute(sql).fetch_df()
    return mine, oracle


class TestExists:
    def test_correlated_exists_semi(self, engine, duck):
        sql = ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
               "AND o.o_totalprice > 100000) ORDER BY c_custkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["c_custkey"].tolist() == oracle["c_custkey"].tolist()
        assert len(mine) > 0

    def test_correlated_not_exists_anti(self, engine, duck):
        sql = ("SELECT c_custkey FROM customer c WHERE NOT EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
               "AND o.o_totalprice > 400000) ORDER BY c_custkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["c_custkey"].tolist() == oracle["c_custkey"].tolist()
        assert len(mine) > 0  # non-empty guards the schema-compare path

    def test_exists_with_other_predicates(self, engine, duck):
        sql = ("SELECT s_suppkey FROM supplier s WHERE s_acctbal > 0 AND "
               "EXISTS (SELECT 1 FROM nation n WHERE "
               "n.n_nationkey = s.s_nationkey AND n.n_regionkey = 2) "
               "ORDER BY s_suppkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["s_suppkey"].tolist() == oracle["s_suppkey"].tolist()

    def test_uncorrelated_exists_true(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM customer WHERE EXISTS "
               "(SELECT 1 FROM nation WHERE n_regionkey = 0)")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n"].tolist() == oracle["n"].tolist()

    def test_uncorrelated_exists_false_empty(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM customer WHERE EXISTS "
               "(SELECT 1 FROM nation WHERE n_nationkey < 0)")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n"].tolist() == oracle["n"].tolist() == [0]

    def test_uncorrelated_not_exists_keeps_all(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM customer WHERE NOT EXISTS "
               "(SELECT 1 FROM nation WHERE n_nationkey < 0)")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n"].tolist() == oracle["n"].tolist()
        assert mine["n"].iloc[0] > 0

    def test_exists_self_join_aliases(self, engine, duck):
        # same table inner and outer: alias binding must disambiguate
        sql = ("SELECT o1.o_orderkey FROM orders o1 WHERE EXISTS "
               "(SELECT 1 FROM orders o2 WHERE o2.o_custkey = o1.o_custkey "
               "AND o2.o_totalprice > 200000) ORDER BY o1.o_orderkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["o_orderkey"].tolist() == oracle["o_orderkey"].tolist()

    def test_decompiler_round_trip(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse_one

        sql = ("SELECT c_custkey FROM customer c WHERE NOT EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)")
        stmt = parse_one(sql)
        text = to_sql(stmt)
        assert "NOT EXISTS (" in text
        # re-parse of the decompiled text yields the same AST
        assert parse_one(text) == stmt
