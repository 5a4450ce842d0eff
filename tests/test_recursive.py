"""WITH RECURSIVE (sqlc/recursive.py): semi-naive fixpoint semantics vs
DuckDB, termination, dialect rules, errors."""

import duckdb
import pandas as pd
import pytest

from conftest import SF_TINY


def _df(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


class TestRecursiveCte:
    def test_sequence_generation(self, engine):
        df = _df(engine.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t WHERE n < 100) "
            "SELECT SUM(n) AS s, COUNT(*) AS c FROM t"))
        assert df.s.iloc[0] == 5050 and df.c.iloc[0] == 100

    def test_cycle_terminates_with_union_distinct(self, engine):
        df = _df(engine.sql(
            "WITH RECURSIVE c(n) AS (SELECT 0 UNION DISTINCT "
            "SELECT (n + 1) % 5 FROM c) SELECT COUNT(*) AS k FROM c"))
        assert df.k.iloc[0] == 5

    def test_transitive_closure_matches_duckdb(self, engine):
        # reachability over a diamond-with-cycle edge graph
        edges = "(SELECT 1 AS src, 2 AS dst UNION ALL SELECT 1, 3 " \
                "UNION ALL SELECT 2, 4 UNION ALL SELECT 3, 4 " \
                "UNION ALL SELECT 4, 2 UNION ALL SELECT 5, 1)"
        mine_sql = (
            f"WITH RECURSIVE reach(node) AS (SELECT 1 UNION DISTINCT "
            f"SELECT e.dst FROM reach r JOIN {edges} e ON e.src = r.node) "
            f"SELECT node FROM reach ORDER BY node")
        duck_sql = mine_sql.replace("UNION DISTINCT", "UNION")
        mine = _df(engine.sql(mine_sql))
        orc = duckdb.sql(duck_sql).df()
        pd.testing.assert_frame_equal(
            mine.reset_index(drop=True), orc, check_dtype=False)

    def test_join_against_real_table(self, engine):
        df = _df(engine.sql(
            "WITH RECURSIVE qty(q) AS (SELECT 1 UNION ALL "
            "SELECT q + 1 FROM qty WHERE q < 50) "
            "SELECT q.q, COUNT(l.l_orderkey) AS n_items "
            "FROM qty q LEFT JOIN lineitem l "
            "ON CAST(l.l_quantity AS INT) = q.q "
            "GROUP BY q.q ORDER BY q.q"))
        assert len(df) == 50
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{SF_TINY}/lineitem.parquet')")
        orc = con.execute(
            "WITH RECURSIVE qty(q) AS (SELECT 1 UNION ALL "
            "SELECT q + 1 FROM qty WHERE q < 50) "
            "SELECT q.q, COUNT(l.l_orderkey) AS n_items "
            "FROM qty q LEFT JOIN lineitem l "
            "ON CAST(l.l_quantity AS INT) = q.q "
            "GROUP BY q.q ORDER BY q.q").fetchdf()
        pd.testing.assert_frame_equal(df.reset_index(drop=True), orc,
                                      check_dtype=False)

    def test_recursive_feeds_later_cte_and_body(self, engine):
        df = _df(engine.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t WHERE n < 5), "
            "sq AS (SELECT n, n * n AS n2 FROM t) "
            "SELECT SUM(n2) AS s FROM sq"))
        assert df.s.iloc[0] == 55  # 1+4+9+16+25

    def test_runaway_recursion_capped(self, engine, monkeypatch):
        import qwery_ray.sqlc.recursive as R

        monkeypatch.setattr(R, "MAX_ITER", 20)
        with pytest.raises(RuntimeError, match="exceeded 20 iterations"):
            engine.sql("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
                       "SELECT n + 1 FROM t) SELECT COUNT(*) FROM t")

    def test_base_self_reference_rejected(self, engine):
        with pytest.raises(ValueError, match="must be the last"):
            engine.sql("WITH RECURSIVE t(n) AS (SELECT n FROM t UNION ALL "
                       "SELECT 1) SELECT * FROM t")

    def test_non_recursive_cte_column_list_rejected(self, engine):
        with pytest.raises(ValueError, match="recursive CTEs only"):
            engine.sql("WITH t(n) AS (SELECT 1) SELECT * FROM t")

    def test_decompiler_roundtrip(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse_one

        sql = ("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
               "SELECT n + 1 FROM t WHERE n < 3) SELECT n FROM t")
        rendered = to_sql(parse_one(sql))
        assert "RECURSIVE" in rendered and "t(n)" in rendered
        # re-parse of the rendered text must produce the same shape
        again = parse_one(rendered)
        assert again.recursive and again.ctes[0][2] == ("n",)
